"""Multilevel partitioning: coverage/balance invariants, matched pairs
co-assigned, edge-cut summary vs brute."""

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.matching import maximal_matching
from centrality_gpu_spark.operators.partition import (
    edge_cut_summary,
    partition_graph,
)


def _graph(spark, edges):
    return Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )


@pytest.fixture(scope="module")
def gnm(spark):
    nxg = nx.gnm_random_graph(60, 140, seed=8)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    return nxg, _graph(spark, list(nxg.edges()))


@pytest.mark.parametrize("levels", [1, 2])
def test_partition_covers_all_vertices_once(spark, gnm, levels):
    nxg, g = gnm
    parts = {r.id: r.part for r in partition_graph(g, 4, levels=levels).collect()}
    assert set(parts) == set(nxg.nodes())
    assert all(0 <= p < 4 for p in parts.values())
    assert len(set(parts.values())) > 1  # actually spreads


def test_matched_pairs_co_assigned(spark, gnm):
    nxg, g = gnm
    m = maximal_matching(g).collect()
    parts = {r.id: r.part for r in partition_graph(g, 4, levels=1).collect()}
    for r in m:
        assert parts[r.src] == parts[r.dst]


def test_edge_cut_summary_vs_brute(spark, gnm):
    nxg, g = gnm
    pdf = partition_graph(g, 3, levels=1)
    parts = {r.id: r.part for r in pdf.collect()}
    row = edge_cut_summary(g, pdf).collect()[0]
    cut = sum(1.0 for u, v in nxg.edges() if parts[u] != parts[v])
    assert row.k_parts == len(set(parts.values()))
    assert row.cut_weight == pytest.approx(cut)
    assert row.total_weight == pytest.approx(nxg.number_of_edges())
    assert row.cut_fraction == pytest.approx(cut / nxg.number_of_edges(), abs=1e-6)
    sizes = {}
    for p in parts.values():
        sizes[p] = sizes.get(p, 0) + 1
    assert row.min_part_size == min(sizes.values())
    assert row.max_part_size == max(sizes.values())


def test_partition_beats_random_on_cut(spark):
    """Co-assigning matched pairs must cut fewer edges than the same
    hash assignment applied directly to the fine graph."""
    import hashlib

    nxg = nx.gnm_random_graph(80, 200, seed=13)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    g = _graph(spark, list(nxg.edges()))
    pdf = partition_graph(g, 4, levels=2)
    row = edge_cut_summary(g, pdf).collect()[0]

    def hpart(v):
        return int(hashlib.md5(f"part:{v}".encode()).hexdigest()[:15], 16) % 4

    rand_cut = sum(1.0 for u, v in nxg.edges() if hpart(u) != hpart(v))
    assert row.cut_weight < rand_cut
