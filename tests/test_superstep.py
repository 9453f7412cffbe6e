"""SpMV primitive: disk-cached CSR mode vs cogroup mode vs SQL mode."""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.superstep import block_edges, spmv, spmv_sql
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR


@pytest.fixture(scope="module")
def g(spark):
    gr = read_edge_list_local(spark, f"{SAMPLE_DIR}/test4.txt").persist()
    gr.edges.count()
    yield gr
    gr.unpersist()


@pytest.fixture(scope="module")
def values(spark, g):
    return g.vertices().select("id", (F.col("id") * 0.5 + 1.0).alias("val")).persist()


def as_map(df):
    return {r.id: r.msg for r in df.collect()}


@pytest.mark.parametrize("weighted", [True, False])
def test_spmv_modes_agree(spark, g, values, weighted):
    expected = as_map(spmv_sql(g, values, weighted=weighted))
    cogrouped = block_edges(g)
    got_cg = as_map(spmv(cogrouped, values, weighted=weighted))
    cached = block_edges(g, scratch_dir=tempfile.mkdtemp(prefix="t_blk_"))
    got_ck = as_map(spmv(cached, values, weighted=weighted))
    assert set(expected) == set(got_cg) == set(got_ck)
    for k in expected:
        assert got_cg[k] == pytest.approx(expected[k], abs=1e-12)
        assert got_ck[k] == pytest.approx(expected[k], abs=1e-12)
    cogrouped.unpersist()
    cached.unpersist()


def test_spmv_cached_with_salting(spark, g, values):
    """Forced salting (hub_threshold=2) through the disk-cached path."""
    expected = as_map(spmv_sql(g, values, weighted=False))
    blocked = block_edges(
        g, hub_threshold=2, scratch_dir=tempfile.mkdtemp(prefix="t_blk_")
    )
    assert blocked.hubs.count() > 0
    got = as_map(spmv(blocked, values, weighted=False))
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-12)
    blocked.unpersist()


def test_spmv_repeated_calls_consistent(spark, g, values):
    """Second superstep over the same blocks (worker cache warm) must
    return identical results."""
    blocked = block_edges(g, scratch_dir=tempfile.mkdtemp(prefix="t_blk_"))
    a = as_map(spmv(blocked, values, weighted=False))
    b = as_map(spmv(blocked, values, weighted=False))
    assert a == b
    blocked.unpersist()


def test_spmv_dense_vs_sparse_combine(spark, g, values):
    """The dense chunked combine must equal the sparse row combine to
    1e-12 on every vertex, for all weighting modes, including a chunk
    width smaller than the vertex count (multi-chunk path)."""
    import centrality_gpu_spark.operators.superstep as ss

    cached = block_edges(g, scratch_dir=tempfile.mkdtemp(prefix="t_blkd_"))
    old_chunk = ss.DENSE_CHUNK
    ss.DENSE_CHUNK = 8  # force many chunks on the small test graph
    try:
        for kw in (
            {"weighted": True},
            {"weighted": False, "divide_by_src_degree": True},
            {"divide_by_src_wdegree": True},
        ):
            dense = as_map(spmv(cached, values, combine="dense", **kw))
            sparse = as_map(spmv(cached, values, combine="sparse", **kw))
            assert set(dense) == set(sparse)
            for k in sparse:
                assert dense[k] == pytest.approx(sparse[k], abs=1e-12)
    finally:
        ss.DENSE_CHUNK = old_chunk
        cached.unpersist()


def test_spmv_dense_requires_store(spark, g, values):
    cogrouped = block_edges(g)
    with pytest.raises(ValueError, match="dense combine"):
        spmv(cogrouped, values, combine="dense").collect()
    cogrouped.unpersist()


@pytest.mark.parametrize("kw", [
    dict(weighted=False),
    dict(weighted=True),
    dict(weighted=False, divide_by_src_degree=True),
    dict(weighted=True, divide_by_src_wdegree=True),
])
def test_spmv_dst_store_agrees(spark, g, values, kw):
    """dst-partitioned store (broadcast-value, combine-free superstep)
    must equal the SQL and src-store paths for every flag combination.
    dst output additionally covers EVERY vertex with in-edges (dense
    clients rely on it to skip their vertex join)."""
    expected = as_map(spmv_sql(g, values, **kw))
    dst_st = block_edges(
        g, scratch_dir=tempfile.mkdtemp(prefix="t_dstblk_"), partition_by="dst"
    )
    got = as_map(spmv(dst_st, values, **kw))
    all_dsts = {r.dst for r in g.edges.select("dst").distinct().collect()}
    assert set(got) == all_dsts
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-12)
    for k in set(got) - set(expected):
        assert got[k] == 0.0
    dst_st.unpersist()


def test_dst_store_requires_disk(spark, g):
    with pytest.raises(ValueError, match="scratch_dir"):
        block_edges(g, partition_by="dst")


def test_store_partition_mismatch_rebuilds(spark, g, values):
    """reuse_existing must not reuse a store built with the other
    bucketing key."""
    d = tempfile.mkdtemp(prefix="t_pbmix_")
    src_st = block_edges(g, scratch_dir=d)
    expected = as_map(spmv_sql(g, values, weighted=False))
    dst_st = block_edges(g, scratch_dir=d, reuse_existing=True, partition_by="dst")
    got = as_map(spmv(dst_st, values, weighted=False))
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-12)
    src_st.unpersist(); dst_st.unpersist()


@pytest.mark.parametrize("pb", ["dst", "dst_range"])
@pytest.mark.parametrize("kw", [
    dict(weighted=False),
    dict(weighted=True),
    dict(weighted=False, divide_by_src_degree=True),
    dict(weighted=True, divide_by_src_wdegree=True),
])
def test_spmv_dense_driver_vector_agrees(spark, g, values, pb, kw):
    """The driver-resident dense superstep (spmv_dense) must equal the
    SQL path for every flag combination, on both dst bucketings (hash
    and locality-preserving range)."""
    from centrality_gpu_spark.operators.superstep import (
        _dense_map,
        dense_vector_from_df,
        dense_vector_to_df,
        spmv_dense,
    )

    expected = as_map(spmv_sql(g, values, **kw))
    st = block_edges(
        g, scratch_dir=tempfile.mkdtemp(prefix=f"t_{pb}_"), partition_by=pb
    )
    vec = dense_vector_from_df(st, values)
    out = spmv_dense(st, vec, **kw)
    ids, _ = _dense_map(st)
    got = dict(zip(ids.tolist(), out.tolist()))
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-12)
    for k in set(got) - set(expected):
        assert got[k] == 0.0
    # round-trip back to a DataFrame preserves values and covers all dsts
    rt = {r.id: r.v for r in dense_vector_to_df(st, out, col="v").collect()}
    assert rt == got
    st.unpersist()


def test_dst_range_store_spmv_agrees(spark, g, values):
    """DataFrame-superstep parity on the range-bucketed store, plus
    contiguity: each block's dst ids must form a contiguous id range."""
    import os

    expected = as_map(spmv_sql(g, values, weighted=True))
    st = block_edges(
        g, scratch_dir=tempfile.mkdtemp(prefix="t_rng_"), partition_by="dst_range"
    )
    got = as_map(spmv(st, values, weighted=True))
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-12)
    # contiguous, non-overlapping dst ranges across blocks
    from centrality_gpu_spark.operators.superstep import _load_csr_block

    spans = []
    for b in range(st.n_blocks):
        blk = _load_csr_block(st.path, b)
        if blk.get("empty"):
            continue
        d = np.asarray(blk["dst_u"])
        spans.append((d.min(), d.max()))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    st.unpersist()


def test_spmv_dense_requires_dst_store(spark, g, values):
    from centrality_gpu_spark.operators.superstep import (
        dense_vector_from_df,
        spmv_dense,
    )

    src_st = block_edges(g, scratch_dir=tempfile.mkdtemp(prefix="t_srcst_"))
    vec = dense_vector_from_df(src_st, values)
    with pytest.raises(ValueError, match="dst-partitioned"):
        spmv_dense(src_st, vec)
    src_st.unpersist()
