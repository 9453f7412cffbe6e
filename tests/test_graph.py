"""Graph canonicalization + edge-list scan vs the reference samples."""

import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.sources.edgelist import read_edge_list, read_edge_list_local

from tests.conftest import SAMPLE_DIR, read_sample_edges, sample_nx

EXPECTED_NM = {"test1": (9, 12), "test2": (15, 21), "test3": (6, 8), "test4": (21, 30)}


def test_edge_list_scan_matches_local(spark, sample_name):
    g_scan = read_edge_list(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    g_loc = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    n, m = EXPECTED_NM[sample_name]
    assert g_scan.num_vertices() == n
    assert g_scan.num_edges() == m
    assert g_loc.num_edges() == m
    a = {tuple(r) for r in g_scan.edges.select("src", "dst").collect()}
    b = {tuple(r) for r in g_loc.edges.select("src", "dst").collect()}
    assert a == b


def test_symmetrize_dedup_selfloop(spark):
    raw = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (0, 1, 1), (2, 2, 1), (1, 2, 3)],
        "src long, dst long, weight long",
    )
    g = Graph.from_undirected_edges(raw, weight_col="weight")
    rows = {(r.src, r.dst): r.weight for r in g.edges.collect()}
    assert set(rows) == {(0, 1), (1, 0), (1, 2), (2, 1)}
    assert rows[(1, 2)] == 3.0
    assert g.num_edges() == 2


def test_degrees_match_nx(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    got = {r.id: r.degree for r in g.degrees().collect()}
    assert got == dict(nxg.degree())


def test_degree_histogram(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    hist = {r.degree: r.cnt for r in g.degree_histogram().collect()}
    nxg = sample_nx("test1")
    expected = {}
    for _, d in nxg.degree():
        expected[d] = expected.get(d, 0) + 1
    assert hist == expected


def test_max_degree_vertex(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    nxg = sample_nx("test1")
    v, d = g.max_degree_vertex()
    max_d = max(dd for _, dd in nxg.degree())
    assert d == max_d
    assert v == min(n for n, dd in nxg.degree() if dd == max_d)


def test_min_degree_vertex(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    nxg = sample_nx("test1")
    v, d = g.min_degree_vertex()
    min_d = min(dd for _, dd in nxg.degree())
    assert d == min_d
    assert v == min(n for n, dd in nxg.degree() if dd == min_d)
