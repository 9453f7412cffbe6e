"""k-core, core numbers, clustering coefficient vs networkx."""

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.kcore import core_numbers, k_core
from centrality_gpu_spark.operators.triangles import clustering_coefficient
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR, sample_nx


def test_k_core_samples(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    for k in (2, 3):
        sub = k_core(g, k)
        got = {r.id for r in sub.vertices().collect()}
        assert got == set(nx.k_core(nxg, k).nodes())


def test_core_numbers(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test4.txt")
    nxg = sample_nx("test4")
    got = {r.id: r.core for r in core_numbers(g).collect()}
    assert got == nx.core_number(nxg)


def test_clustering_coefficient(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    got = {r.id: r.clustering for r in clustering_coefficient(g).collect()}
    exp = nx.clustering(nxg)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-6), v


def test_k_core_long_path_converges(spark):
    # a path peels one vertex per round from each end under k=2: a
    # capped loop would return a non-empty "2-core" — the real 2-core
    # of a path is empty
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_undirected_edges(df)
    assert k_core(g, 2).vertices().count() == 0
    got = {r.id: r.core for r in core_numbers(g).collect()}
    assert got == {i: 1 for i in range(61)}


def test_k_core_round_cap_raises(spark):
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_undirected_edges(df)
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(g, 2, max_rounds=2)


def test_core_numbers_copurchase_vs_networkx(spark):
    """Real power-law graph with a deep core structure — the star-forest
    driver oracle can't catch peel-order bugs; this can (VERDICT r1 #4)."""
    from centrality_gpu_spark.sources.testdata_graphs import copurchase_graph

    from tests.conftest import SF_SMALL

    g = copurchase_graph(spark, SF_SMALL)
    nxg = nx.Graph()
    nxg.add_edges_from(
        (r.src, r.dst) for r in g.edges.where("src < dst").collect()
    )
    got = {r.id: r.core for r in core_numbers(g).collect()}
    exp = nx.core_number(nxg)
    assert got == exp
