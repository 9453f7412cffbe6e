"""Streaming connected components: batch-chunked label-contraction
accumulation must equal the one-shot batch components in ANY batch
order (CC is order-free, unlike the temporal accumulator)."""

import shutil
import time

import networkx as nx
import numpy as np
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.components import connected_components
from centrality_gpu_spark.streaming.components import (
    StreamingComponents,
    run_components_stream,
)


def _random_edges(seed, n=40, m=90):
    nxg = nx.gnm_random_graph(n, m, seed=seed)
    return [(int(u), int(v)) for u, v in nxg.edges()]


def _batch_labels(spark, edges):
    g = Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )
    return {r.id: r.component for r in connected_components(g).collect()}


@pytest.mark.parametrize("seed,perm_seed", [(3, None), (7, 13)])
def test_chunked_accumulation_equals_batch(spark, seed, perm_seed):
    edges = _random_edges(seed)
    if perm_seed is not None:  # CC folding is order-free
        rng = np.random.default_rng(perm_seed)
        edges = [edges[i] for i in rng.permutation(len(edges))]
    exp = _batch_labels(spark, edges)
    acc = StreamingComponents(spark)
    for chunk in np.array_split(np.arange(len(edges)), 5):
        batch = [edges[i] for i in chunk]
        acc.update(spark.createDataFrame(batch, "src long, dst long"))
    got = {r.id: r.component for r in acc.state.collect()}
    assert got == exp


def test_merging_two_known_components(spark):
    """A later batch bridging two components must relabel BOTH sides
    (including vertices absent from the bridging batch)."""
    acc = StreamingComponents(spark)
    acc.update(spark.createDataFrame([(10, 11), (20, 21)], "src long, dst long"))
    mid = {r.id: r.component for r in acc.state.collect()}
    assert mid == {10: 10, 11: 10, 20: 20, 21: 20}
    acc.update(spark.createDataFrame([(11, 21)], "src long, dst long"))
    got = {r.id: r.component for r in acc.state.collect()}
    assert got == {10: 10, 11: 10, 20: 10, 21: 10}


def test_intra_component_batch_is_noop(spark):
    acc = StreamingComponents(spark)
    acc.update(spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"))
    before = {r.id: r.component for r in acc.state.collect()}
    acc.update(spark.createDataFrame([(1, 3)], "src long, dst long"))
    assert {r.id: r.component for r in acc.state.collect()} == before


def test_empty_batch_is_noop(spark):
    acc = StreamingComponents(spark)
    acc.update(spark.createDataFrame([(1, 2)], "src long, dst long"))
    before = {r.id: r.component for r in acc.state.collect()}
    acc.update(spark.createDataFrame([], "src long, dst long"))
    assert {r.id: r.component for r in acc.state.collect()} == before


def test_new_vertex_smaller_than_label_rewrites_history(spark):
    """A new vertex with the smallest id yet becomes the component
    label for vertices seen batches ago."""
    acc = StreamingComponents(spark)
    acc.update(spark.createDataFrame([(5, 6)], "src long, dst long"))
    acc.update(spark.createDataFrame([(0, 6)], "src long, dst long"))
    got = {r.id: r.component for r in acc.state.collect()}
    assert got == {5: 0, 6: 0, 0: 0}


def test_real_stream_equals_batch(spark, tmp_path):
    """Drive an actual file-source stream (availableNow) through
    foreachBatch and compare against batch components."""
    edges = _random_edges(21, n=25, m=50)
    exp = _batch_labels(spark, edges)
    in_dir = str(tmp_path / "edges_in")
    half = len(edges) // 2
    for part in (edges[:half], edges[half:]):
        spark.createDataFrame(part, "src long, dst long").coalesce(
            1
        ).write.mode("append").parquet(in_dir)
        time.sleep(1.1)  # distinct mtimes: the file source reads oldest-first
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    acc = StreamingComponents(spark)
    q = run_components_stream(stream, acc, str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = {r.id: r.component for r in acc.state.collect()}
    assert got == exp
    shutil.rmtree(tmp_path, ignore_errors=True)
