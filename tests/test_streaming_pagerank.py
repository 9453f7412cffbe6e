"""Streaming PageRank: every snapshot must be a true fixpoint of the
current accumulated graph (≡ a cold batch run), warm starts must
converge in fewer iterations than cold ones, and save/load must resume
exactly."""

import math

import networkx as nx

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.pagerank import pagerank
from centrality_gpu_spark.streaming.pagerank import StreamingPageRank


def _edges(seed=7, n=60, m=240):
    g = nx.gnm_random_graph(n, m, seed=seed)
    return [(int(u), int(v)) for u, v in g.edges()]


def _rank_map(df):
    return {r.id: r.rank for r in df.collect()}


def test_snapshots_equal_cold_batch(spark):
    edges = _edges()
    acc = StreamingPageRank(spark, tol=1e-9)
    half = len(edges) // 2
    for chunk in (edges[:half], edges[half:]):
        acc.update(spark.createDataFrame(chunk, "src long, dst long"))
        # the snapshot is a fixpoint of the CURRENT graph: compare to a
        # cold batch run on the same accumulated edge set
        g = Graph.from_undirected_edges(acc.edges)
        want = _rank_map(pagerank(g, tol=1e-9, mode="sql"))
        got = _rank_map(acc.ranks)
        assert set(got) == set(want)
        for k in got:
            assert math.isclose(got[k], want[k], abs_tol=1e-6), k


def test_warm_start_converges_faster(spark):
    edges = _edges(seed=11, n=80, m=400)
    acc = StreamingPageRank(spark, tol=1e-9)
    # big first batch (cold), tiny second batch (warm delta)
    acc.update(spark.createDataFrame(edges[:-5], "src long, dst long"))
    acc.update(spark.createDataFrame(edges[-5:], "src long, dst long"))
    cold, warm = acc.iterations_used
    assert warm < cold, acc.iterations_used


def test_replayed_edges_are_noops(spark):
    edges = _edges(seed=3, n=30, m=90)
    acc = StreamingPageRank(spark)
    acc.update(spark.createDataFrame(edges, "src long, dst long"))
    n_snapshots = len(acc.iterations_used)
    out = acc.update(spark.createDataFrame(edges[:10], "src long, dst long"))
    assert len(acc.iterations_used) == n_snapshots  # no recompute
    assert out is acc.ranks


def test_save_load_resume(spark, tmp_path):
    edges = _edges(seed=5, n=40, m=150)
    half = len(edges) // 2
    cold = StreamingPageRank(spark, tol=1e-9)
    cold.update(spark.createDataFrame(edges[:half], "src long, dst long"))
    cold.save(str(tmp_path / "pr"))

    warm = StreamingPageRank.load(spark, str(tmp_path / "pr"))
    assert warm.tol == 1e-9 and warm.ranks is not None
    warm.update(spark.createDataFrame(edges[half:], "src long, dst long"))

    g = Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )
    want = _rank_map(pagerank(g, tol=1e-9, mode="sql"))
    got = _rank_map(warm.ranks)
    for k in got:
        assert math.isclose(got[k], want[k], abs_tol=1e-6), k
