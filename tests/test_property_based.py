"""Property-based invariants (hypothesis): arbitrary edge lists —
self-loops, parallel edges, negative ids, disconnected shards — must
always canonicalize and analyze correctly, not just the fixture
graphs. Few examples per property (a Spark job runs per example);
deterministic (derandomized) so CI never flakes.
"""

from __future__ import annotations

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=12),
        st.integers(min_value=-5, max_value=12),
    ),
    min_size=1,
    max_size=40,
)

PROP = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _graph(spark, pairs):
    return Graph.from_undirected_edges(
        spark.createDataFrame(
            [(int(a), int(b)) for a, b in pairs], "src long, dst long"
        )
    )


def _nx(pairs):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    return g


@given(pairs=edge_lists)
@PROP
def test_canonical_form_invariants(spark, pairs):
    """P1/P4/P5 for ANY input: symmetric, self-loop-free, deduped."""
    rows = _graph(spark, pairs).edges.collect()
    seen = {(r.src, r.dst) for r in rows}
    assert len(seen) == len(rows)  # deduped
    assert all(s != d for s, d in seen)  # no self-loops
    assert all((d, s) in seen for s, d in seen)  # symmetric
    want = {
        (a, b)
        for a, b in pairs
        if a != b
        for a, b in [(a, b), (b, a)]
    }
    assert seen == want  # exactly the input's undirected support


@given(pairs=edge_lists)
@PROP
def test_degrees_match_networkx(spark, pairs):
    g = _graph(spark, pairs)
    got = {r.id: r.degree for r in g.degrees().collect()}
    ref = dict(_nx(pairs).degree())
    ref = {v: d for v, d in ref.items() if d > 0}
    assert got == ref


@given(pairs=edge_lists)
@PROP
def test_components_match_networkx(spark, pairs):
    from centrality_gpu_spark.operators.components import (
        connected_components,
    )

    g = _graph(spark, pairs)
    if g.edges.head(1) == []:
        return  # all self-loops: empty canonical graph
    got = {}
    for r in connected_components(g).collect():
        got.setdefault(r.component, set()).add(r.id)
    ref = {
        min(c): set(c) for c in nx.connected_components(_nx(pairs))
    }
    assert {frozenset(c) for c in got.values()} == {
        frozenset(c) for c in ref.values()
    }
    # label = min vertex id of the component (the engine's convention)
    for label, members in got.items():
        assert label == min(members)


@given(pairs=edge_lists)
@PROP
def test_triangle_count_matches_networkx(spark, pairs):
    from centrality_gpu_spark.operators.triangles import triangle_count

    g = _graph(spark, pairs)
    if g.edges.head(1) == []:
        return
    got = triangle_count(g).collect()[0].n_triangles
    ref = sum(nx.triangles(_nx(pairs)).values()) // 3
    assert got == ref
