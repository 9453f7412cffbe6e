"""Butterfly counting vs brute-force enumeration on random bipartite
graphs (no networkx golden exists for butterflies)."""

from itertools import combinations

import numpy as np
import pytest

from centrality_gpu_spark.operators.butterflies import (
    butterflies_per_left_vertex,
    butterfly_count,
)


def _random_bipartite(seed, nl=12, nr=8, p=0.35):
    rng = np.random.default_rng(seed)
    edges = [
        (int(u), int(1000 + t))
        for u in range(nl)
        for t in range(nr)
        if rng.random() < p
    ]
    return edges


def _brute_butterflies(edges):
    nbrs = {}
    for u, t in edges:
        nbrs.setdefault(u, set()).add(t)
    total = 0
    per_left = {u: 0 for u in nbrs}
    for u, v in combinations(sorted(nbrs), 2):
        c = len(nbrs[u] & nbrs[v])
        bf = c * (c - 1) // 2
        total += bf
        per_left[u] += bf
        per_left[v] += bf
    return total, per_left


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_butterfly_count_vs_brute(spark, seed):
    edges = _random_bipartite(seed)
    df = spark.createDataFrame(edges, "src long, dst long")
    row = butterfly_count(df).collect()[0]
    total, _ = _brute_butterflies(edges)
    assert row.n_butterflies == total
    # wedge volumes: sum C(deg,2) per side
    from collections import Counter

    ld = Counter(u for u, _ in edges)
    rd = Counter(t for _, t in edges)
    assert row.n_left_wedges == sum(d * (d - 1) // 2 for d in ld.values())
    assert row.n_right_wedges == sum(d * (d - 1) // 2 for d in rd.values())


@pytest.mark.parametrize("seed", [4, 5])
def test_butterflies_per_left_vertex_vs_brute(spark, seed):
    edges = _random_bipartite(seed)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.butterflies for r in butterflies_per_left_vertex(df).collect()}
    _, per_left = _brute_butterflies(edges)
    assert got == per_left


def test_butterfly_side_selection_invariance(spark):
    """Anchoring side is a physical choice: flipping src/dst must give
    the same butterfly total (wedge columns swap)."""
    edges = _random_bipartite(7, nl=6, nr=20, p=0.5)  # skew: left-heavy degs
    df = spark.createDataFrame(edges, "src long, dst long")
    flipped = spark.createDataFrame(
        [(t, u) for u, t in edges], "src long, dst long"
    )
    a = butterfly_count(df).collect()[0]
    b = butterfly_count(flipped).collect()[0]
    assert a.n_butterflies == b.n_butterflies
    assert a.n_left_wedges == b.n_right_wedges
    assert a.n_right_wedges == b.n_left_wedges


def test_butterfly_empty_and_acyclic(spark):
    """A star (one right vertex) has wedges but zero butterflies."""
    df = spark.createDataFrame([(u, 100) for u in range(5)], "src long, dst long")
    row = butterfly_count(df).collect()[0]
    assert row.n_butterflies == 0
    assert row.n_right_wedges == 10


def test_bipartite_project_vs_brute(spark):
    from centrality_gpu_spark.operators.butterflies import bipartite_project

    edges = _random_bipartite(9)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.src, r.dst): r.weight for r in bipartite_project(df, None).collect()}
    nbrs = {}
    for u, t in edges:
        nbrs.setdefault(u, set()).add(t)
    exp = {}
    for u, v in combinations(sorted(nbrs), 2):
        c = len(nbrs[u] & nbrs[v])
        if c:
            exp[(u, v)] = c
    assert got == exp


def test_bipartite_project_hub_cap(spark):
    """A right vertex above the cap contributes no pairs."""
    from centrality_gpu_spark.operators.butterflies import bipartite_project

    edges = [(u, 100) for u in range(10)] + [(0, 200), (1, 200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.src, r.dst): r.weight for r in bipartite_project(df, 5).collect()}
    assert got == {(0, 1): 1}  # only via right vertex 200
