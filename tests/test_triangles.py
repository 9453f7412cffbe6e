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


def test_sampled_count_p1_is_exact(spark):
    from centrality_gpu_spark.graph import Graph
    import networkx as nx

    from centrality_gpu_spark.operators.triangles import (
        triangle_count_sampled,
    )

    g = nx.gnm_random_graph(40, 160, seed=6)
    edges = spark.createDataFrame(
        [(int(u), int(v)) for u, v in g.edges()], "src long, dst long"
    )
    graph = Graph.from_undirected_edges(edges)
    exact = triangle_count(graph).collect()[0].n_triangles
    row = triangle_count_sampled(graph, p=1.0).collect()[0]
    assert row.n_sampled == exact and row.est == float(exact)


def test_sampled_count_estimate_and_determinism(spark):
    from centrality_gpu_spark.graph import Graph
    import networkx as nx

    from centrality_gpu_spark.operators.triangles import (
        triangle_count_sampled,
    )

    # triangle-rich graph so the p=0.5 estimator concentrates
    g = nx.powerlaw_cluster_graph(300, 8, 0.6, seed=4)
    edges = spark.createDataFrame(
        [(int(u), int(v)) for u, v in g.edges()], "src long, dst long"
    )
    graph = Graph.from_undirected_edges(edges)
    exact = triangle_count(graph).collect()[0].n_triangles
    r1 = triangle_count_sampled(graph, p=0.5).collect()[0]
    r2 = triangle_count_sampled(graph, p=0.5).collect()[0]
    assert (r1.n_sampled, r1.est) == (r2.n_sampled, r2.est)  # md5 coin
    assert abs(r1.est - exact) / exact < 0.35  # KDD'09 variance bound


def test_transitivity_matches_nx(spark):
    import networkx as nx

    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.triangles import transitivity

    for seed in (3, 14):
        g = nx.gnm_random_graph(40, 150, seed=seed)
        graph = Graph.from_undirected_edges(
            spark.createDataFrame(
                [(int(u), int(v)) for u, v in g.edges()], "src long, dst long"
            )
        )
        got = transitivity(graph).collect()[0].transitivity
        assert abs(got - nx.transitivity(g)) < 1e-7
