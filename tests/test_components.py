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
