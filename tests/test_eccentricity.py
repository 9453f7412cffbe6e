"""Eccentricity / radius / diameter / center vs networkx.

Semantics (eccentricity.py): ecc(u) = max BFS distance over the
*reachable* set, so disconnected graphs get per-component values
instead of the reference's abort (graph_ear_decompos.h:141-149).
"""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.eccentricity import (
    eccentricity,
    eccentricity_broadcast,
    eccentricity_bsp,
    graph_extent,
)
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR, sample_nx


@pytest.mark.parametrize("impl", [eccentricity_broadcast, eccentricity_bsp])
def test_eccentricity_samples(spark, sample_name, impl):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    got = {r.id: r.ecc for r in impl(g).collect()}
    for comp in nx.connected_components(nxg):
        exp = nx.eccentricity(nxg.subgraph(comp))
        for v, e in exp.items():
            assert got[v] == e, (sample_name, v)


def test_graph_extent_matches_nx(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test4.txt")
    nxg = sample_nx("test4")
    row = graph_extent(g).collect()[0]
    assert row.radius == nx.radius(nxg)
    assert row.diameter == nx.diameter(nxg)
    ecc = nx.eccentricity(nxg)
    assert row.n_center == sum(1 for v in ecc.values() if v == row.radius)
    assert row.n_periphery == sum(1 for v in ecc.values() if v == row.diameter)


def test_eccentricity_disconnected_per_component(spark):
    # two components: a path 1-2-3 (ecc 2,1,2) and an edge 10-11 (ecc 1,1)
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    from centrality_gpu_spark.graph import Graph

    g = Graph.from_undirected_edges(df)
    got = {r.id: r.ecc for r in eccentricity(g).collect()}
    assert got == {1: 2, 2: 1, 3: 2, 10: 1, 11: 1}


def test_eccentricity_auto_routes_to_bsp(spark, monkeypatch):
    """The size guard must route big graphs away from the CSR collect."""
    import centrality_gpu_spark.operators.eccentricity as emod

    def boom(*a, **k):  # pragma: no cover - should never run
        raise AssertionError("broadcast path used above the size guard")

    monkeypatch.setattr(emod, "eccentricity_broadcast", boom)
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    nxg = sample_nx("test1")
    got = {r.id: r.ecc for r in eccentricity(g, max_broadcast_edges=2).collect()}
    exp = nx.eccentricity(nxg)
    assert got == exp


def test_eccentricity_weighted_vs_networkx(spark):
    import numpy as np

    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.eccentricity import eccentricity_weighted

    rng = np.random.default_rng(23)
    nxg = nx.gnm_random_graph(40, 90, seed=23)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    if not nx.is_connected(nxg):
        nxg = nxg.subgraph(max(nx.connected_components(nxg), key=len)).copy()
    for u, v in nxg.edges():
        nxg[u][v]["weight"] = 1.0 + float(rng.integers(0, 4)) / 8.0
    df = spark.createDataFrame(
        [(u, v, nxg[u][v]["weight"]) for u, v in nxg.edges()],
        "src long, dst long, weight double",
    )
    g = Graph.from_undirected_edges(df, weight_col="weight")
    got = {r.id: r.ecc for r in eccentricity_weighted(g).collect()}
    exp = nx.eccentricity(nxg, weight="weight")
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12), v
