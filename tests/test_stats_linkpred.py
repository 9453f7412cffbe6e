"""Degree assortativity + graph summary vs networkx; Jaccard link
prediction vs nx.jaccard_coefficient."""

from __future__ import annotations

import math

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.hits import jaccard_link_prediction
from centrality_gpu_spark.operators.stats import degree_assortativity, graph_summary


def _graph_from_nx(spark, g: nx.Graph) -> Graph:
    edges = [(int(u), int(v), 1.0) for u, v in g.edges()]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return Graph.from_undirected_edges(df, weight_col="weight")


@pytest.mark.parametrize("seed", [2, 9])
def test_assortativity_matches_nx(spark, seed):
    g = nx.gnp_random_graph(60, 0.08, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    got = degree_assortativity(_graph_from_nx(spark, g)).collect()[0][
        "assortativity"
    ]
    want = nx.degree_assortativity_coefficient(g)
    assert abs(got - want) < 1e-6


def test_assortativity_star_is_minus_one(spark):
    g = nx.star_graph(9)
    got = degree_assortativity(_graph_from_nx(spark, g)).collect()[0][
        "assortativity"
    ]
    assert abs(got - (-1.0)) < 1e-9


def test_graph_summary(spark):
    g = nx.karate_club_graph()
    row = graph_summary(_graph_from_nx(spark, g)).collect()[0]
    assert row.n_vertices == g.number_of_nodes()
    assert row.n_edges == g.number_of_edges()
    assert row.min_degree == min(d for _, d in g.degree())
    assert row.max_degree == max(d for _, d in g.degree())
    assert abs(row.density - nx.density(g)) < 1e-8


@pytest.mark.parametrize("seed", [4])
def test_jaccard_matches_nx(spark, seed):
    g = nx.gnp_random_graph(40, 0.12, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    rows = jaccard_link_prediction(_graph_from_nx(spark, g)).collect()
    got = {(r.u, r.v): r.score for r in rows}
    want = {
        (min(u, v), max(u, v)): p
        for u, v, p in nx.jaccard_coefficient(g)
        if p > 0
    }
    assert set(got) == set(want)
    for k, s in got.items():
        assert math.isclose(s, want[k], abs_tol=1e-7), k


def test_jaccard_hub_cap_drops_hub_wedges(spark):
    # star + one extra edge: every leaf pair's only common neighbor is
    # the hub; capping below hub degree must drop those pairs
    g = nx.star_graph(8)
    sg = _graph_from_nx(spark, g)
    capped = jaccard_link_prediction(sg, max_neighbor_degree=4).collect()
    assert capped == []
    uncapped = jaccard_link_prediction(sg).count()
    assert uncapped == 8 * 7 // 2


# ----------------------------------------------------- RA + PA linkpred

from centrality_gpu_spark.operators.hits import (
    preferential_attachment,
    resource_allocation,
)


@pytest.mark.parametrize("seed", [3, 11])
def test_resource_allocation_matches_nx(spark, seed):
    g = nx.gnp_random_graph(40, 0.12, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    rows = resource_allocation(_graph_from_nx(spark, g)).collect()
    got = {(r.u, r.v): r.score for r in rows}
    want = {
        (min(u, v), max(u, v)): p
        for u, v, p in nx.resource_allocation_index(g)
        if p > 0
    }
    assert set(got) == set(want)
    for k, s in got.items():
        assert math.isclose(s, want[k], abs_tol=1e-7), k


@pytest.mark.parametrize("seed", [3, 11])
def test_preferential_attachment_matches_nx(spark, seed):
    g = nx.gnp_random_graph(40, 0.12, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    rows = preferential_attachment(_graph_from_nx(spark, g)).collect()
    got = {(r.u, r.v): r.score for r in rows}
    # nx scores ALL non-edges; the engine restricts to cn >= 1
    # candidates (documented) — compare on that subset
    cn1 = {
        (min(u, v), max(u, v))
        for u, v, p in nx.jaccard_coefficient(g)
        if p > 0
    }
    want = {
        (min(u, v), max(u, v)): p
        for u, v, p in nx.preferential_attachment(g)
        if (min(u, v), max(u, v)) in cn1
    }
    assert got == want


# ------------------------------------------------------------ rich club

from centrality_gpu_spark.operators.stats import rich_club


@pytest.mark.parametrize("seed", [2, 9])
def test_rich_club_matches_nx(spark, seed):
    g = nx.gnp_random_graph(50, 0.1, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    rows = {r.k: r.rc for r in rich_club(_graph_from_nx(spark, g)).collect()}
    want = nx.rich_club_coefficient(g, normalized=False)
    shared = set(rows) & set(want)
    assert shared  # overlapping k range
    for k in shared:
        assert math.isclose(rows[k], want[k], abs_tol=1e-7), k
    # the engine emits exactly the k with >= 2 qualifying nodes
    deg = dict(g.degree())
    for k in rows:
        assert sum(1 for d in deg.values() if d > k) >= 2
