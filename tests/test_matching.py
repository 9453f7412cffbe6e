"""Maximal matching: matching/maximality invariants plus equality with
the sequential greedy matching under the same priority order."""

import hashlib

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.matching import maximal_matching


def _graph(spark, edges):
    return Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )


def _prio(u, v):
    h = hashlib.md5(f"match:{u}:{v}".encode()).hexdigest()
    return f"{h}|{u:020d}|{v:020d}"


def _greedy(edges):
    """Sequential greedy matching by ascending priority — the local-min
    parallel rounds must produce exactly this set."""
    canon = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    taken, used = set(), set()
    for u, v in sorted(canon, key=lambda e: _prio(*e)):
        if u not in used and v not in used:
            taken.add((u, v))
            used.update((u, v))
    return taken


@pytest.mark.parametrize("seed", [1, 5])
def test_matching_equals_sequential_greedy(spark, seed):
    nxg = nx.gnm_random_graph(40, 80, seed=seed)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    edges = list(nxg.edges())
    got = {(r.src, r.dst) for r in maximal_matching(_graph(spark, edges)).collect()}
    assert got == _greedy(edges)


def test_matching_is_matching_and_maximal(spark):
    nxg = nx.gnm_random_graph(30, 70, seed=11)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    edges = list(nxg.edges())
    rows = maximal_matching(_graph(spark, edges)).collect()
    used = [v for r in rows for v in (r.src, r.dst)]
    assert len(used) == len(set(used))  # a matching
    matched = set(used)
    for u, v in edges:  # maximal: no edge with both endpoints free
        assert u in matched or v in matched


def test_matching_path_graph(spark):
    # on a 2-edge path only one edge can match
    rows = maximal_matching(_graph(spark, [(0, 1), (1, 2)])).collect()
    assert len(rows) == 1


def test_matching_round_budget_raises(spark):
    chain = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="max_rounds"):
        maximal_matching(_graph(spark, chain), max_rounds=1)


def test_contract_matching_vs_brute(spark):
    from centrality_gpu_spark.operators.matching import (
        contract_matching,
        maximal_matching,
    )

    nxg = nx.gnm_random_graph(30, 60, seed=3)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    edges = list(nxg.edges())
    g = _graph(spark, edges)
    m = {(r.src, r.dst) for r in maximal_matching(g).collect()}
    coarse, mapping = contract_matching(g)
    rep = {r.id: r.rep for r in mapping.collect()}
    # mapping: matched pairs collapse to min endpoint, singles to self
    for u, v in m:
        assert rep[v] == u and rep[u] == u
    matched_vs = {x for p in m for x in p}
    for v in nxg.nodes():
        if v not in matched_vs:
            assert rep[v] == v
    # coarse edges == brute contraction of the symmetric weighted table
    brute = {}
    for u, v in edges:
        for a, b in ((u, v), (v, u)):
            ra, rb = rep[a], rep[b]
            if ra != rb:
                brute[(ra, rb)] = brute.get((ra, rb), 0.0) + 1.0
    got = {(r.src, r.dst): r.weight for r in coarse.collect()}
    assert got == brute
    # a coarsening level must shrink V by exactly |matching|
    n_coarse = len({r for r in rep.values()})
    assert n_coarse == nxg.number_of_nodes() - len(m)


def test_weighted_priority_fractional_weights_match_duckdb(spark):
    """Fractional weights must format identically on both engines
    (floor on both — a bare cast truncates in Spark but rounds in
    DuckDB, silently picking different matchings)."""
    import duckdb
    from pyspark.sql import functions as F

    from centrality_gpu_spark.operators.matching import (
        _WEIGHTED_PRIORITY_SQL,
        _edge_priority,
    )

    rows = [(1, 2, 1.7), (3, 4, 2.5), (5, 6, 3.0), (7, 8, 0.2)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = [
        r.p
        for r in df.select(
            _edge_priority(F.col("src"), F.col("dst"), F.col("weight")).alias("p")
        ).orderBy("src").collect()
    ]
    con = duckdb.connect()
    exp = [
        r[0]
        for r in con.execute(
            "SELECT " + _WEIGHTED_PRIORITY_SQL + " FROM (SELECT * FROM (VALUES "
            + ", ".join(f"({s}, {d}, {w})" for s, d, w in rows)
            + ") AS t(src, dst, weight)) ORDER BY src"
        ).fetchall()
    ]
    assert got == exp
