"""BCC decomposition, articulation points, reach-weighted decomposed
betweenness identity, and pendant peeling — vs networkx."""

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.bcc import (
    articulation_points,
    bcc_size_histogram,
    betweenness_decomposed,
    biconnected_components,
    tarjan_bcc,
)
from centrality_gpu_spark.operators.pendant import pendant_peel
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR, sample_nx


def nx_bcc_sets(nxg):
    return {frozenset(c) for c in nx.biconnected_components(nxg)}


def test_tarjan_kernel_vs_nx(sample_name):
    nxg = sample_nx(sample_name)
    n = nxg.number_of_nodes()
    import numpy as np

    edges = list(nxg.edges())
    s = np.array([u for u, v in edges] + [v for u, v in edges])
    t = np.array([v for u, v in edges] + [u for u, v in edges])
    o = np.lexsort((t, s))
    s, t = s[o], t[o]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    indptr = np.cumsum(indptr)
    edge_bcc, art = tarjan_bcc(n, indptr, t)
    # group vertices per bcc id
    groups = {}
    for (a, b), k in edge_bcc.items():
        groups.setdefault(k, set()).update((a, b))
    assert {frozenset(g) for g in groups.values()} == nx_bcc_sets(nxg)
    assert {v for v in range(n) if art[v]} == set(nx.articulation_points(nxg))


def test_biconnected_components_df(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    rows = biconnected_components(g).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.bcc, set()).update((r.src, r.dst))
    assert {frozenset(v) for v in groups.values()} == nx_bcc_sets(nxg)
    # every undirected edge labeled exactly once
    assert len(rows) == g.num_edges()


def test_articulation_points_df(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    got = {r.id for r in articulation_points(g).collect()}
    assert got == set(nx.articulation_points(nxg))


def test_bcc_histogram(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test2.txt")
    nxg = sample_nx("test2")
    hist = {r["size"]: r.cnt for r in bcc_size_histogram(g).collect()}
    expected = {}
    for c in nx.biconnected_components(nxg):
        expected[len(c)] = expected.get(len(c), 0) + 1
    assert hist == expected


def test_decomposed_betweenness_identity(spark, sample_name):
    """The reference's central identity: per-BCC reach-weighted Brandes
    + art-point pair terms == whole-graph BC (2× nx unnormalized)."""
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    exp = {k: 2.0 * v for k, v in
           nx.betweenness_centrality(nxg, normalized=False).items()}
    got = {r.id: r.bc for r in betweenness_decomposed(g).collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_decomposed_betweenness_random(spark):
    """Random sparse graphs (bridges + cycles) vs networkx."""
    rng = np.random.default_rng(5)
    for trial in range(3):
        nxg = nx.gnm_random_graph(40, 55, seed=int(rng.integers(1 << 30)))
        edges = list(nxg.edges())
        if not edges:
            continue
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        )
        g = Graph.from_undirected_edges(df, weight_col="weight")
        exp = {k: 2.0 * v for k, v in
               nx.betweenness_centrality(nxg, normalized=False).items()}
        got = {r.id: r.bc for r in betweenness_decomposed(g).collect()}
        for k, v in got.items():
            assert v == pytest.approx(exp[k], abs=1e-6), (trial, k)


def test_pendant_peel(spark):
    # path 0-1-2-3 hanging off triangle 3-4-5
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_undirected_edges(df)
    remaining, peeled = pendant_peel(g)
    rounds = {r.id: (r["round"], r.parent) for r in peeled.collect()}
    assert rounds[0] == (0, 1)
    assert rounds[1] == (1, 2)
    assert rounds[2] == (2, 3)
    assert set(rounds) == {0, 1, 2}
    left = {r.src for r in remaining.edges.collect()}
    assert left == {3, 4, 5}


def test_pendant_peel_round_cap(spark):
    # a 12-path peels from both ends, 2 vertices per round; cap at 5
    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_undirected_edges(df)
    remaining, peeled = pendant_peel(g, max_rounds=5)
    assert peeled.count() == 10
    assert peeled.agg(F.max("round")).collect()[0][0] == 4
    assert remaining.edges.count() > 0


def test_bridges_vs_nx(spark, sample_name):
    from centrality_gpu_spark.operators.bcc import bridges

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    got = {(r.src, r.dst) for r in bridges(g).collect()}
    want = {(min(u, v), max(u, v)) for u, v in nx.bridges(nxg)}
    assert got == want


def test_bridges_random_vs_nx(spark):
    """Random sparse graphs (pendants + cycles) vs networkx."""
    from centrality_gpu_spark.operators.bcc import bridges

    rng = np.random.default_rng(11)
    for trial in range(3):
        nxg = nx.gnm_random_graph(40, 45, seed=int(rng.integers(1 << 30)))
        edges = list(nxg.edges())
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        )
        g = Graph.from_undirected_edges(df, weight_col="weight")
        got = {(r.src, r.dst) for r in bridges(g).collect()}
        want = {(min(u, v), max(u, v)) for u, v in nx.bridges(nxg)}
        assert got == want, trial


def test_two_edge_components_vs_nx(spark):
    """2-edge-connected blocks (bridge removal) vs nx.k_edge_components."""
    from centrality_gpu_spark.operators.bcc import two_edge_components

    rng = np.random.default_rng(23)
    for trial in range(3):
        nxg = nx.gnm_random_graph(30, 33, seed=int(rng.integers(1 << 30)))
        edges = list(nxg.edges())
        df = spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        )
        g = Graph.from_undirected_edges(df, weight_col="weight")
        got = {}
        for r in two_edge_components(g).collect():
            got.setdefault(r.component, set()).add(r.id)
        # operator only sees vertices with ≥1 edge
        seen = {u for e in edges for u in e}
        want = {frozenset(c & seen) for c in nx.k_edge_components(nxg, k=2) if c & seen}
        assert {frozenset(v) for v in got.values()} == want, trial
