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


# ---------------------------------------------------------------- refine

from centrality_gpu_spark.operators.partition import refine_partition  # noqa: E402


def _refine_ref(nxg, parts, k, rounds, slack_pct=25):
    """Pure-Python mirror of refine_partition's round rules (weights 1)."""
    parts = dict(parts)
    n = len(parts)
    cap = (n * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    for rnd in range(rounds):
        load = {}
        for p in parts.values():
            load[p] = load.get(p, 0) + 1
        wants = {}
        for v, cur in parts.items():
            w = {cur: 0.0}
            for u in nxg.neighbors(v):
                w[parts[u]] = w.get(parts[u], 0.0) + 1.0
            cands = [
                (wt, 1 if c == cur else 0, -c, c)
                for c, wt in w.items()
                if c == cur or load.get(c, 0) < cap
            ]
            wt, _, _, tgt = max(cands)
            gate = tgt < cur if rnd % 2 == 0 else tgt > cur
            if tgt != cur and wt > w[cur] and gate:
                wants[v] = (tgt, wt)
        by_target = {}
        for v, (tgt, wt) in wants.items():
            by_target.setdefault(tgt, []).append((-wt, v))
        for tgt, lst in by_target.items():
            lst.sort()
            room = cap - load.get(tgt, 0)
            for i, (_, v) in enumerate(lst):
                if i < room:
                    parts[v] = tgt
    return parts


def _initial(nxg, k):
    return {v: v % k for v in nxg.nodes()}


def _parts_df(spark, d):
    return spark.createDataFrame(
        [(int(v), int(p)) for v, p in sorted(d.items())], "id long, part int"
    )


@pytest.mark.parametrize("seed,rounds", [(3, 4), (9, 5)])
def test_refine_equals_python_reference(spark, seed, rounds):
    nxg = nx.gnm_random_graph(50, 120, seed=seed)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    g = _graph(spark, list(nxg.edges()))
    init = _initial(nxg, 4)
    got = {
        r.id: r.part
        for r in refine_partition(g, _parts_df(spark, init), 4, rounds=rounds).collect()
    }
    assert got == _refine_ref(nxg, init, 4, rounds)


def test_refine_improves_cut_on_clustered_graph(spark):
    nxg = nx.planted_partition_graph(4, 15, 0.6, 0.02, seed=7)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    g = _graph(spark, list(nxg.edges()))
    init = _parts_df(spark, _initial(nxg, 4))
    before = edge_cut_summary(g, init).collect()[0]
    refined = refine_partition(g, init, 4, rounds=8)
    after = edge_cut_summary(g, refined).collect()[0]
    assert after.cut_weight < before.cut_weight
    assert after.k_parts >= 2


def test_refine_capacity_bound(spark):
    nxg = nx.gnm_random_graph(60, 150, seed=21)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    g = _graph(spark, list(nxg.edges()))
    n = nxg.number_of_nodes()
    k, slack = 4, 25
    cap = (n * (100 + slack) + 100 * k - 1) // (100 * k)
    init = _initial(nxg, k)
    init_max = max(
        sum(1 for p in init.values() if p == q) for q in range(k)
    )
    refined = refine_partition(g, _parts_df(spark, init), k, rounds=6)
    sizes = {r.part: r["count"] for r in refined.groupBy("part").count().collect()}
    assert max(sizes.values()) <= max(cap, init_max)


def test_refine_fixpoint_stable(spark):
    nxg = nx.planted_partition_graph(3, 8, 0.7, 0.05, seed=5)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    g = _graph(spark, list(nxg.edges()))
    once = refine_partition(g, _parts_df(spark, _initial(nxg, 3)), 3, rounds=12)
    a = {r.id: r.part for r in once.collect()}
    twice = refine_partition(g, _parts_df(spark, a), 3, rounds=4)
    assert {r.id: r.part for r in twice.collect()} == a
