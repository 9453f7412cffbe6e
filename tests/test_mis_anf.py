"""MIS / Jones-Plassmann coloring / ANF neighborhood sketches.

Validity is checked structurally (independence, maximality, proper
coloring) against networkx-loaded reference sample graphs and the
testdata graphs; determinism by re-running; the DuckDB oracles by
running the exact unrolled SQL on the same edges (the same check the
driver performs at sf0.01).
"""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.anf import (
    anf_oracle_sql,
    effective_diameter,
    effective_diameter_oracle_sql,
    neighborhood_function,
)
from centrality_gpu_spark.operators.mis import (
    jp_coloring,
    jp_coloring_oracle_sql,
    maximal_independent_set,
    mis_oracle_sql,
)
from tests.conftest import read_sample_edges, sample_nx


def _graph(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return Graph.from_undirected_edges(df)


def _edges_cte(edges) -> str:
    """Inline VALUES CTE named ``edges`` (both directions) for oracles."""
    sym = sorted({(u, v) for u, v in edges if u != v} | {(v, u) for u, v in edges if u != v})
    rows = ", ".join(f"({u}, {v}, 1.0)" for u, v in sym)
    return f"edges(src, dst, weight) AS (SELECT * FROM (VALUES {rows}))"


# ------------------------------------------------------------------ MIS


def test_mis_valid_on_samples(spark, sample_name):
    edges = read_sample_edges(sample_name)
    g = _graph(spark, edges)
    res = maximal_independent_set(g).toPandas()
    nxg = sample_nx(sample_name)
    mis = set(res[res.in_mis == 1].id)
    # covers every vertex exactly once
    assert sorted(res.id) == sorted(nxg.nodes)
    assert res.id.is_unique
    # independence
    assert not any(u in mis and v in mis for u, v in nxg.edges)
    # maximality: every non-member has a MIS neighbor
    for v in nxg.nodes:
        if v not in mis:
            assert any(u in mis for u in nxg.neighbors(v))


def test_mis_deterministic(spark):
    edges = read_sample_edges("test4")
    g = _graph(spark, edges)
    a = maximal_independent_set(g).toPandas().sort_values("id").reset_index(drop=True)
    b = maximal_independent_set(g).toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_mis_oracle_matches(spark, sample_name):
    edges = read_sample_edges(sample_name)
    g = _graph(spark, edges)
    got = (
        maximal_independent_set(g)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(mis_oracle_sql(_edges_cte(edges)))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(got.id) == list(want.id)
    assert list(got.in_mis) == list(want.in_mis)
    assert list(got["round"]) == list(want["round"])


def test_mis_raises_on_budget(spark):
    edges = read_sample_edges("test4")
    g = _graph(spark, edges)
    with pytest.raises(RuntimeError, match="max_rounds"):
        maximal_independent_set(g, max_rounds=1)


# ------------------------------------------------------------- coloring


def test_coloring_proper_on_samples(spark, sample_name):
    edges = read_sample_edges(sample_name)
    g = _graph(spark, edges)
    res = jp_coloring(g).toPandas()
    nxg = sample_nx(sample_name)
    assert sorted(res.id) == sorted(nxg.nodes)
    color = dict(zip(res.id, res.color))
    assert all(color[u] != color[v] for u, v in nxg.edges)


def test_coloring_oracle_matches(spark):
    edges = read_sample_edges("test3")
    g = _graph(spark, edges)
    got = jp_coloring(g).toPandas().sort_values("id").reset_index(drop=True)
    want = (
        duckdb.sql(jp_coloring_oracle_sql(_edges_cte(edges)))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(got.id) == list(want.id)
    assert list(got.color) == list(want.color)


# ----------------------------------------------------------------- ANF


def test_anf_accuracy(spark):
    # FM is biased for tiny cardinalities (a size-1 ball estimates to
    # ~2^0.5/φ ≈ 1.83), so bound tiny balls by a constant factor and
    # bigger balls by a relative band (trials=64 → σ ≈ 0.14 in log2)
    edges = read_sample_edges("test4")
    g = _graph(spark, edges)
    nf = neighborhood_function(g, max_hops=4, trials=64).toPandas()
    nxg = sample_nx("test4")
    exact = {
        (v, h): len(nx.single_source_shortest_path_length(nxg, v, cutoff=h))
        for v in nxg.nodes
        for h in range(5)
    }
    for _, row in nf.iterrows():
        e = exact[(row.id, row.hop)]
        if e <= 4:
            assert e / 3 <= row.est_reach <= e * 3, (row.id, row.hop, e)
        else:
            assert row.est_reach == pytest.approx(e, rel=0.5), (row.id, row.hop, e)


def test_anf_monotone_and_saturates(spark, sample_name):
    edges = read_sample_edges(sample_name)
    g = _graph(spark, edges)
    nf = neighborhood_function(g, max_hops=8, trials=8).toPandas()
    for _vid, grp in nf.groupby("id"):
        r = list(grp.sort_values("hop").est_reach)
        assert all(a <= b + 1e-9 for a, b in zip(r, r[1:]))  # OR-fold is monotone


def test_anf_oracle_matches(spark, sample_name):
    edges = read_sample_edges(sample_name)
    g = _graph(spark, edges)
    got = (
        neighborhood_function(g, max_hops=3, trials=8)
        .toPandas()
        .sort_values(["id", "hop"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(anf_oracle_sql(_edges_cte(edges), max_hops=3))
        .df()
        .sort_values(["id", "hop"])
        .reset_index(drop=True)
    )
    assert list(got.sum_b) == list(want.sum_b)
    assert list(got.est_reach) == list(want.est_reach)  # bit-identical doubles


def test_effective_diameter_oracle(spark):
    edges = read_sample_edges("test4")
    g = _graph(spark, edges)
    got = effective_diameter(g, max_hops=4).toPandas()
    want = duckdb.sql(
        effective_diameter_oracle_sql(_edges_cte(edges), max_hops=4)
    ).df()
    assert got.eff_diameter[0] == want.eff_diameter[0]
    assert got.n_vertices[0] == want.n_vertices[0]


def test_effective_diameter_sane(spark):
    # a clique saturates in one hop
    edges = [(u, v) for u in range(6) for v in range(u + 1, 6)]
    g = _graph(spark, edges)
    got = effective_diameter(g, max_hops=3).toPandas()
    assert got.eff_diameter[0] <= 1
    assert got.n_vertices[0] == 6
