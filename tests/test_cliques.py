"""4-clique counting vs brute-force networkx enumeration."""

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.cliques import (
    four_clique_count,
    four_cliques,
    four_cliques_per_vertex,
)


def _graph(spark, edges):
    return Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )


def _brute(nxg):
    return [
        frozenset(cl)
        for cl in nx.enumerate_all_cliques(nxg)
        if len(cl) == 4
    ]


@pytest.mark.parametrize("n,p,seed", [(18, 0.45, 3), (25, 0.3, 9)])
def test_four_cliques_vs_brute(spark, n, p, seed):
    nxg = nx.gnp_random_graph(n, p, seed=seed)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    exp = _brute(nxg)
    got = [
        frozenset((r.a, r.b, r.c, r.d))
        for r in four_cliques(_graph(spark, list(nxg.edges()))).collect()
    ]
    assert len(got) == len(set(got)), "each clique exactly once"
    assert sorted(map(sorted, got)) == sorted(map(sorted, exp))


def test_four_clique_count_k5(spark):
    # K5 has C(5,4) = 5 four-cliques
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    row = four_clique_count(_graph(spark, edges)).collect()[0]
    assert row.n_4cliques == 5


def test_four_cliques_per_vertex(spark):
    nxg = nx.gnp_random_graph(16, 0.5, seed=4)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    exp = {v: 0 for v in nxg.nodes()}
    for cl in _brute(nxg):
        for v in cl:
            exp[v] += 1
    got = {
        r.id: r.n_4clique
        for r in four_cliques_per_vertex(_graph(spark, list(nxg.edges()))).collect()
    }
    assert got == exp


def test_triangle_free_graph_has_none(spark):
    edges = [(i, i + 1) for i in range(10)]  # a path
    assert four_clique_count(_graph(spark, edges)).collect()[0].n_4cliques == 0
