"""k-truss: edge support vs networkx triangle counts, k-truss edge sets
vs nx.k_truss, truss numbers vs a brute-force nx peel."""

from __future__ import annotations

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.truss import edge_support, k_truss, truss_numbers
from tests.conftest import sample_nx


def _graph_from_nx(spark, g: nx.Graph) -> Graph:
    edges = [(int(u), int(v), 1.0) for u, v in g.edges()]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return Graph.from_undirected_edges(df, weight_col="weight")


def _rand_graph(seed: int, n: int = 40, p: float = 0.15) -> nx.Graph:
    g = nx.gnp_random_graph(n, p, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    return g


def _nx_support(g: nx.Graph) -> dict[tuple[int, int], int]:
    out = {}
    for u, v in g.edges():
        out[(min(u, v), max(u, v))] = len(
            set(g.neighbors(u)) & set(g.neighbors(v))
        )
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_edge_support_matches_nx(spark, seed):
    g = _rand_graph(seed)
    got = {
        (r.u, r.v): r.support
        for r in edge_support(_graph_from_nx(spark, g)).collect()
    }
    assert got == _nx_support(g)


def test_edge_support_on_samples(spark, sample_name):
    g = sample_nx(sample_name)
    got = {
        (r.u, r.v): r.support
        for r in edge_support(_graph_from_nx(spark, g)).collect()
    }
    assert got == _nx_support(g)


@pytest.mark.parametrize("k", [3, 4])
def test_k_truss_matches_nx(spark, k):
    g = _rand_graph(7, n=50, p=0.2)
    ours = {
        (r.u, r.v) for r in k_truss(_graph_from_nx(spark, g), k).collect()
    }
    want = {
        (min(u, v), max(u, v)) for u, v in nx.k_truss(g, k).edges()
    }
    assert ours == want


def test_truss_numbers_brute_force(spark):
    g = _rand_graph(11, n=35, p=0.25)
    tn = {
        (r.u, r.v): r.truss
        for r in truss_numbers(_graph_from_nx(spark, g)).collect()
    }
    # every edge accounted for exactly once
    assert set(tn) == {(min(u, v), max(u, v)) for u, v in g.edges()}
    # brute force: truss(e) = max k with e ∈ nx.k_truss(g, k)
    for (u, v), t in tn.items():
        assert (u, v) in {
            (min(a, b), max(a, b)) for a, b in nx.k_truss(g, t).edges()
        }, (u, v, t)
        assert (u, v) not in {
            (min(a, b), max(a, b)) for a, b in nx.k_truss(g, t + 1).edges()
        }, (u, v, t)


def test_k_truss_of_triangle_free_graph_is_empty(spark):
    g = nx.path_graph(6)
    assert k_truss(_graph_from_nx(spark, g), 3).count() == 0
