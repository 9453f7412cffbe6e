"""Triangle counting vs networkx (exact)."""

import networkx as nx

from centrality_gpu_spark.operators.triangles import triangle_count, triangles_per_vertex
from centrality_gpu_spark.sources.edgelist import read_edge_list_local
from centrality_gpu_spark.sources.testdata_graphs import copurchase_graph

from tests.conftest import SAMPLE_DIR, SF_SMALL, sample_nx


def test_triangle_count_samples(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    expected = sum(nx.triangles(nxg).values()) // 3
    got = triangle_count(g).collect()[0]["n_triangles"]
    assert got == expected


def test_triangles_per_vertex(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test3.txt")
    nxg = sample_nx("test3")
    got = {r.id: r.n_tri for r in triangles_per_vertex(g).collect()}
    assert got == nx.triangles(nxg)


def test_triangle_count_copurchase(spark):
    g = copurchase_graph(spark, SF_SMALL)
    edges = [(r.src, r.dst) for r in g.edges.collect()]
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    expected = sum(nx.triangles(nxg).values()) // 3
    got = triangle_count(g).collect()[0]["n_triangles"]
    assert got == expected
