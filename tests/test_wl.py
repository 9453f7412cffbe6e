"""Weisfeiler-Leman refinement: isomorphism invariance + partition
agreement with networkx's WL subgraph hashes."""

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.wl import wl_graph_hash, wl_labels


def _graph(spark, edges):
    return Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )


def _partition(labels: dict):
    """Group keys by value — WL colors are canonical up to renaming."""
    inv = {}
    for k, v in labels.items():
        inv.setdefault(v, set()).add(k)
    return frozenset(frozenset(g) for g in inv.values())


def test_wl_isomorphic_graphs_same_hash(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    # relabel by +100 and flip edge direction: isomorphic
    edges2 = [(v + 100, u + 100) for u, v in edges]
    h1 = wl_graph_hash(_graph(spark, edges)).collect()[0]
    h2 = wl_graph_hash(_graph(spark, edges2)).collect()[0]
    assert h1.wl_hash == h2.wl_hash
    assert h1.n_colors == h2.n_colors


def test_wl_distinguishes_path_from_star(spark):
    path = [(i, i + 1) for i in range(4)]
    star = [(0, i) for i in range(1, 5)]
    h1 = wl_graph_hash(_graph(spark, path)).collect()[0].wl_hash
    h2 = wl_graph_hash(_graph(spark, star)).collect()[0].wl_hash
    assert h1 != h2


@pytest.mark.parametrize("seed", [1, 2])
def test_wl_partition_matches_networkx(spark, seed):
    nxg = nx.gnm_random_graph(30, 55, seed=seed)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    g = _graph(spark, list(nxg.edges()))
    got = {r.id: r.wl_label for r in wl_labels(g, iterations=3).collect()}
    nx_h = nx.weisfeiler_lehman_subgraph_hashes(nxg, iterations=3)
    exp = {v: h[-1] for v, h in nx_h.items()}
    assert _partition(got) == _partition(exp)


def test_wl_refinement_monotone(spark):
    """Color count never decreases with more iterations."""
    nxg = nx.gnm_random_graph(25, 40, seed=9)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    g = _graph(spark, list(nxg.edges()))
    counts = [
        wl_graph_hash(g, iterations=k).collect()[0].n_colors for k in (1, 2, 3)
    ]
    assert counts[0] <= counts[1] <= counts[2]
