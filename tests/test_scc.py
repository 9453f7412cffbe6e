"""Strongly connected components: trim + coloring vs networkx and the
DuckDB mutual-reachability oracle."""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.scc import (
    condensation_summary,
    scc_oracle_sql,
    strongly_connected_components,
)


def _dedges(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _dedges_cte(edges) -> str:
    rows = ", ".join(f"({u}, {v})" for u, v in sorted(set(edges)))
    return f"dedges(src, dst) AS (SELECT * FROM (VALUES {rows}))"


def _nx_labels(edges) -> dict[int, int]:
    g = nx.DiGraph(edges)
    return {
        v: min(comp)
        for comp in nx.strongly_connected_components(g)
        for v in comp
    }


def _check(spark, edges):
    got = strongly_connected_components(_dedges(spark, edges)).toPandas()
    want = _nx_labels(edges)
    assert got.id.is_unique
    assert dict(zip(got.id, got.scc)) == want


def test_scc_simple_cycle_plus_tail(spark):
    _check(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)])


def test_scc_two_cycles_bridged(spark):
    _check(spark, [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 3)])


def test_scc_pure_dag(spark):
    # all-trivial: exercises the trim path alone
    _check(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5)])


def test_scc_long_cycle(spark):
    n = 12
    _check(spark, [(i, (i + 1) % n) for i in range(n)])


@pytest.mark.parametrize("seed", [1, 7])
def test_scc_random_digraphs(spark, seed):
    rng = nx.gnp_random_graph(40, 0.06, seed=seed, directed=True)
    edges = [(int(u), int(v)) for u, v in rng.edges]
    _check(spark, edges)


def test_scc_deterministic(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (0, 3)]
    a = strongly_connected_components(_dedges(spark, edges)).toPandas()
    b = strongly_connected_components(_dedges(spark, edges)).toPandas()
    assert a.sort_values("id").reset_index(drop=True).equals(
        b.sort_values("id").reset_index(drop=True)
    )


def test_scc_oracle_matches(spark):
    rng = nx.gnp_random_graph(30, 0.08, seed=3, directed=True)
    edges = [(int(u), int(v)) for u, v in rng.edges]
    got = (
        strongly_connected_components(_dedges(spark, edges))
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(scc_oracle_sql(_dedges_cte(edges)))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(got.id) == list(want.id)
    assert list(got.scc) == list(want.scc)


def test_scc_budget_raises(spark):
    edges = [(i, (i + 1) % 8) for i in range(8)]
    with pytest.raises(RuntimeError, match="rounds"):
        strongly_connected_components(_dedges(spark, edges), max_rounds=2)


def test_condensation_summary(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4)]
    de = _dedges(spark, edges)
    scc = strongly_connected_components(de)
    row = condensation_summary(de, scc).collect()[0]
    # SCCs: {0,1}, {2,3}, {4} → condensation edges {0,1}→{2,3}→{4}
    assert row.n_sccs == 3
    assert row.n_trivial == 1
    assert row.largest_scc == 2
    assert row.n_cond_edges == 2


def test_scc_lineitem_testdata(spark):
    # real-parquet run at sf0.001 vs networkx ground truth
    from centrality_gpu_spark.sources.testdata_graphs import lineitem_cycle_edges

    de = lineitem_cycle_edges(spark, "/root/testdata/sf0.001")
    edges = [(r.src, r.dst) for r in de.collect()]
    got = strongly_connected_components(de).toPandas()
    assert dict(zip(got.id, got.scc)) == _nx_labels(edges)
