"""Community detection: modularity vs networkx exactly; Louvain
structure on known-community graphs + modularity quality vs nx louvain."""

from __future__ import annotations

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.community import louvain, modularity
from centrality_gpu_spark.operators.components import connected_components


def _graph_from_nx(spark, g: nx.Graph) -> Graph:
    edges = [(int(u), int(v), 1.0) for u, v in g.edges()]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return Graph.from_undirected_edges(df, weight_col="weight")


def _nx_modularity(g: nx.Graph, labels: dict[int, int]) -> float:
    comms: dict[int, set] = {}
    for v, c in labels.items():
        comms.setdefault(c, set()).add(v)
    return nx.community.modularity(g, comms.values())


@pytest.mark.parametrize("seed", [1, 5])
def test_modularity_matches_nx(spark, seed):
    g = nx.gnp_random_graph(40, 0.12, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    sg = _graph_from_nx(spark, g)
    # arbitrary deterministic partition: id mod 4
    labels = {v: v % 4 for v in g.nodes()}
    adf = spark.createDataFrame(
        [(int(v), int(c)) for v, c in labels.items()], "id long, community long"
    )
    got = modularity(sg, adf).collect()[0]["modularity"]
    assert abs(got - _nx_modularity(g, labels)) < 1e-8


def test_modularity_of_component_partition(spark):
    # two disjoint cliques: components partition has known closed form
    g = nx.disjoint_union(nx.complete_graph(5), nx.complete_graph(6))
    sg = _graph_from_nx(spark, g)
    comp = connected_components(sg).withColumnRenamed("component", "community")
    got = modularity(sg, comp).collect()[0]["modularity"]
    want = _nx_modularity(
        g, {v: c for c, nodes in enumerate(nx.connected_components(g)) for v in nodes}
    )
    assert abs(got - want) < 1e-8


def test_louvain_two_cliques_bridge(spark):
    # two 6-cliques joined by one edge -> exactly the two cliques
    g = nx.disjoint_union(nx.complete_graph(6), nx.complete_graph(6))
    g.add_edge(0, 6)
    sg = _graph_from_nx(spark, g)
    rows = louvain(sg).collect()
    labels = {r.id: r.community for r in rows}
    assert set(labels) == set(range(12))
    assert len({labels[v] for v in range(6)}) == 1
    assert len({labels[v] for v in range(6, 12)}) == 1
    assert labels[0] != labels[6]
    # canonical labels are min member ids
    assert labels[0] == 0 and labels[6] == 6


def test_louvain_star_forest_is_components(spark):
    # disjoint stars: each star one community labeled by its min id
    edges = []
    centers = [0, 100, 200]
    for c in centers:
        for leaf in range(c + 1, c + 8):
            edges.append((c, leaf, 1.0))
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    sg = Graph.from_undirected_edges(df, weight_col="weight")
    labels = {r.id: r.community for r in louvain(sg).collect()}
    for c in centers:
        star = {c} | set(range(c + 1, c + 8))
        assert {labels[v] for v in star} == {c}


@pytest.mark.parametrize("seed", [3])
def test_louvain_quality_near_nx(spark, seed):
    # planted partition: our synchronous louvain should find a partition
    # whose modularity is at least ~nx louvain's (both near the planted Q)
    g = nx.planted_partition_graph(4, 12, 0.7, 0.03, seed=seed)
    g = nx.Graph(g)  # strip multi/planted metadata
    g.remove_nodes_from(list(nx.isolates(g)))
    sg = _graph_from_nx(spark, g)
    rows = louvain(sg).collect()
    labels = {r.id: r.community for r in rows}
    ours = _nx_modularity(g, labels)
    nx_comms = nx.community.louvain_communities(g, seed=1)
    theirs = nx.community.modularity(g, nx_comms)
    assert ours >= theirs - 0.05, (ours, theirs)


def test_louvain_assignment_covers_all_vertices(spark):
    g = nx.karate_club_graph()
    sg = _graph_from_nx(spark, g)
    rows = louvain(sg).collect()
    assert {r.id for r in rows} == set(g.nodes())
    # labels are community members (canonical min-id scheme)
    labels = {r.id: r.community for r in rows}
    for v, c in labels.items():
        assert labels[c] == c
