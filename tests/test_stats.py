"""degree_skew: the hub-skew planning profile (rank-exact percentiles,
blockwise gini, log-log power-law slope), checked against direct
per-vertex numpy computation. The DuckDB twin is hash-checked by
tools/check_oracles.py (degree_skew_copurchase)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def test_degree_skew_profile(spark):
    from centrality_gpu_spark.operators.stats import degree_skew
    from centrality_gpu_spark.sources.testdata_graphs import (
        copurchase_graph,
    )

    g = copurchase_graph(spark, SF_SMALL)
    row = degree_skew(g).collect()[0]
    degs = np.array(
        sorted(r.degree for r in g.degrees().collect()), dtype=np.int64
    )
    n = len(degs)
    assert row.n_vertices == n
    assert row.max_degree == degs[-1]
    assert row.p50_degree == degs[int(np.ceil(0.50 * n)) - 1]
    assert row.p99_degree == degs[int(np.ceil(0.99 * n)) - 1]
    i = np.arange(1, n + 1)
    gini = (2 * (i * degs).sum() - (n + 1) * degs.sum()) / (
        n * degs.sum()
    )
    assert row.gini == pytest.approx(gini, abs=1e-6)
    # slope: log-log OLS over the histogram
    vals, cnts = np.unique(degs, return_counts=True)
    x, y = np.log(vals.astype(float)), np.log(cnts.astype(float))
    slope = ((x * y).mean() - x.mean() * y.mean()) / (
        (x * x).mean() - x.mean() ** 2
    )
    assert row.powerlaw_slope == pytest.approx(slope, abs=1e-6)


def test_degree_skew_uniform_graph(spark):
    """A 2-regular ring: gini exactly 0, percentiles = max = 2."""
    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.stats import degree_skew

    ring = Graph.from_undirected_edges(
        spark.createDataFrame(
            [(i, (i + 1) % 30) for i in range(30)], "src long, dst long"
        )
    )
    row = degree_skew(ring).collect()[0]
    assert row.n_vertices == 30
    assert (row.max_degree, row.p50_degree, row.p99_degree) == (2, 2, 2)
    assert row.gini == 0.0
    assert row.powerlaw_slope == 0.0  # single histogram row


def test_degree_skew_empty_graph(spark):
    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.stats import degree_skew

    g = Graph.from_undirected_edges(
        spark.createDataFrame([], "src long, dst long")
    )
    out = degree_skew(g)
    assert out.count() == 0
    assert out.columns == [
        "n_vertices", "max_degree", "p50_degree",
        "p99_degree", "gini", "powerlaw_slope",
    ]
