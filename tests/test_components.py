"""Connected components vs networkx (exact match)."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.components import connected_components, num_components
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR, sample_nx


def nx_min_labels(g: nx.Graph) -> dict[int, int]:
    out = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def test_components_samples(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    got = {r.id: r.component for r in connected_components(g).collect()}
    assert got == nx_min_labels(sample_nx(sample_name))


def test_components_disconnected(spark):
    # two components + a long path (exercises pointer jumping);
    # the reference would abort here (graph_ear_decompos.h:141-149)
    path = [(i, i + 1) for i in range(20)]
    other = [(100, 101), (101, 102), (102, 100)]
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in path + other], "src long, dst long, weight double"
    )
    g = Graph.from_undirected_edges(df, weight_col="weight")
    labels = {r.id: r.component for r in connected_components(g).collect()}
    assert all(labels[i] == 0 for i in range(21))
    assert all(labels[i] == 100 for i in (100, 101, 102))
    assert num_components(g) == 2


def test_component_summary(spark):
    import networkx as nx

    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.components import component_summary

    # triangle + path(3) + isolated edge: three components
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (20, 21)]
    g = Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )
    got = {
        r.component: (r.n_vertices, r.n_edges, r.density)
        for r in component_summary(g).collect()
    }
    assert got == {
        0: (3, 3, 1.0),
        10: (3, 2, round(2 * 2 / (3 * 2), 8)),
        20: (2, 1, 1.0),
    }


def test_ego_network_matches_nx(spark):
    import networkx as nx

    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.bfs import ego_network

    g = nx.gnm_random_graph(40, 80, seed=21)
    g.remove_nodes_from(list(nx.isolates(g)))
    graph = Graph.from_undirected_edges(
        spark.createDataFrame(
            [(int(u), int(v)) for u, v in g.edges()], "src long, dst long"
        )
    )
    center = min(g.nodes)
    for radius in (1, 2):
        ball, edges = ego_network(graph, center, radius=radius)
        want = nx.ego_graph(g, center, radius=radius)
        got_v = {r.id: r.dist for r in ball.collect()}
        assert set(got_v) == set(want.nodes)
        sp = nx.single_source_shortest_path_length(g, center, cutoff=radius)
        assert got_v == dict(sp)
        got_e = {
            (min(r.src, r.dst), max(r.src, r.dst)) for r in edges.collect()
        }
        want_e = {(min(u, v), max(u, v)) for u, v in want.edges}
        assert got_e == want_e
