"""Eigenvector centrality: fixed-iteration recurrence vs a numpy
replay (both physical modes), convergence mode vs networkx on a
non-bipartite sample, and the unrolled DuckDB oracle."""

import duckdb
import networkx as nx
import numpy as np
import pytest

from centrality_gpu_spark.operators.eigenvector import (
    eigenvector_centrality,
    eigenvector_oracle_sql,
)
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR, read_sample_edges, sample_nx


def np_eigen(edges, iters):
    ids = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    sym = {(idx[u], idx[v]) for u, v in edges if u != v}
    sym |= {(b, a) for a, b in sym}
    src = np.array([a for a, _ in sym])
    dst = np.array([b for _, b in sym])
    x = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        y = np.bincount(dst, weights=x[src], minlength=n)
        norm = np.sqrt((y * y).sum())
        if norm == 0:
            return {v: 0.0 for v in ids}
        x = y / norm
    return {v: x[idx[v]] for v in ids}


@pytest.mark.parametrize("mode", ["sql", "csr"])
def test_eigenvector_fixed_vs_numpy(spark, sample_name, mode):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    got = {
        r.id: r.score
        for r in eigenvector_centrality(g, fixed_iterations=12, mode=mode).collect()
    }
    exp = np_eigen(read_sample_edges(sample_name), iters=12)
    assert set(got) == set(exp)
    assert np.allclose(
        [got[k] for k in sorted(got)], [exp[k] for k in sorted(exp)],
        atol=1e-12, rtol=1e-12,
    )


def test_eigenvector_convergence_vs_networkx(spark):
    """Converged mode on a non-bipartite sample vs nx (L2-renormalized —
    nx returns a different normalization)."""
    name = next(
        n for n in ["test1", "test2", "test3", "test4"]
        if not nx.is_bipartite(sample_nx(n))
    )
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{name}.txt")
    got = {r.id: r.score for r in eigenvector_centrality(g, tol=1e-10).collect()}
    exp = nx.eigenvector_centrality(sample_nx(name), max_iter=1000, tol=1e-12)
    v = np.array([exp[k] for k in sorted(exp)])
    v = v / np.sqrt((v * v).sum())
    assert np.allclose([got[k] for k in sorted(got)], v, atol=1e-6)


def test_eigenvector_oracle_sql_matches_numpy():
    edges = read_sample_edges("test2")
    cte = (
        "raw(src, dst) AS (VALUES "
        + ", ".join(f"({u}, {v})" for u, v in edges)
        + "), edges AS (SELECT src, dst, 1.0 AS weight FROM raw "
        "UNION SELECT dst, src, 1.0 FROM raw)"
    )
    sql = eigenvector_oracle_sql(cte, iterations=12, round_digits=10)
    got = {int(i): s for i, s in duckdb.sql(sql).fetchall()}
    exp = np_eigen(edges, iters=12)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def np_katz(edges, alpha, beta, iters):
    ids = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    sym = {(idx[u], idx[v]) for u, v in edges if u != v}
    sym |= {(b, a) for a, b in sym}
    src = np.array([a for a, _ in sym])
    dst = np.array([b for _, b in sym])
    x = np.full(n, beta)
    for _ in range(iters):
        y = np.bincount(dst, weights=x[src], minlength=n)
        x = alpha * y + beta
    return {v: x[idx[v]] for v in ids}


@pytest.mark.parametrize("mode", ["sql", "csr"])
def test_katz_fixed_vs_numpy(spark, sample_name, mode):
    from centrality_gpu_spark.operators.eigenvector import katz_centrality

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    got = {
        r.id: r.katz
        for r in katz_centrality(
            g, alpha=0.05, fixed_iterations=8, mode=mode
        ).collect()
    }
    exp = np_katz(read_sample_edges(sample_name), 0.05, 1.0, 8)
    assert set(got) == set(exp)
    assert np.allclose(
        [got[k] for k in sorted(got)], [exp[k] for k in sorted(exp)],
        atol=1e-12, rtol=1e-12,
    )


def test_katz_convergence_vs_networkx(spark):
    from centrality_gpu_spark.operators.eigenvector import katz_centrality

    name = "test4"
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{name}.txt")
    nxg = sample_nx(name)
    alpha = 0.5 / max(d for _, d in nxg.degree())
    got = {r.id: r.katz for r in katz_centrality(g, alpha=alpha, tol=1e-12).collect()}
    exp = nx.katz_centrality(nxg, alpha=alpha, max_iter=5000, tol=1e-14)
    # nx L2-normalizes; ours is raw — compare directions
    gv = np.array([got[k] for k in sorted(got)])
    ev = np.array([exp[k] for k in sorted(exp)])
    assert np.allclose(gv / np.linalg.norm(gv), ev / np.linalg.norm(ev), atol=1e-6)


def test_katz_oracle_sql_matches_numpy():
    from centrality_gpu_spark.operators.eigenvector import katz_oracle_sql

    edges = read_sample_edges("test3")
    cte = (
        "raw(src, dst) AS (VALUES "
        + ", ".join(f"({u}, {v})" for u, v in edges)
        + "), edges AS (SELECT src, dst, 1.0 AS weight FROM raw "
        "UNION SELECT dst, src, 1.0 FROM raw)"
    )
    sql = katz_oracle_sql(cte, alpha=0.05, iterations=8, round_digits=10)
    got = {int(i): s for i, s in duckdb.sql(sql).fetchall()}
    exp = np_katz(edges, 0.05, 1.0, 8)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k
