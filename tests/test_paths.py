"""Shortest-path extraction: validity + canonical determinism on both
strategies, vs networkx distances."""

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.paths import shortest_path


def _graph(spark, edges):
    return Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )


def _canonical_path(nxg, source, target):
    """The min-id predecessor walk both engine strategies must emit."""
    dist = nx.single_source_shortest_path_length(nxg, source)
    path = [target]
    while path[-1] != source:
        d = dist[path[-1]]
        path.append(
            min(w for w in nxg.neighbors(path[-1]) if dist.get(w) == d - 1)
        )
    return list(reversed(path))


@pytest.mark.parametrize("strategy", ["broadcast", "bsp"])
@pytest.mark.parametrize("seed", [2, 6])
def test_path_matches_canonical(spark, strategy, seed):
    nxg = nx.gnm_random_graph(30, 60, seed=seed)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    comp = max(nx.connected_components(nxg), key=len)
    source, target = min(comp), max(comp)
    g = _graph(spark, list(nxg.edges()))
    rows = shortest_path(g, source, target, strategy=strategy).orderBy("pos").collect()
    got = [r.id for r in rows]
    assert [r.pos for r in rows] == list(range(len(got)))
    assert got == _canonical_path(nxg, source, target)


@pytest.mark.parametrize("strategy", ["broadcast", "bsp"])
def test_path_unreachable_is_empty(spark, strategy):
    g = _graph(spark, [(0, 1), (2, 3)])
    assert shortest_path(g, 0, 3, strategy=strategy).count() == 0


def test_path_source_equals_target(spark):
    g = _graph(spark, [(0, 1)])
    rows = shortest_path(g, 0, 0).collect()
    assert [(r.pos, r.id) for r in rows] == [(0, 0)]


def test_path_unknown_vertex_empty(spark):
    g = _graph(spark, [(0, 1)])
    assert shortest_path(g, 0, 99, strategy="broadcast").count() == 0


def test_bsp_collect_is_o_path_not_o_v(spark, monkeypatch):
    """The BSP backwalk must never collect an O(V) parent map to the
    driver: every .collect() during the call returns O(path) rows."""
    # long chain + wide star far from the path: V >> path length
    chain = [(i, i + 1) for i in range(6)]
    star = [(100, 100 + i) for i in range(1, 60)]
    g = _graph(spark, chain + star + [(6, 100)])

    # patch the CONCRETE DataFrame class (Spark 4's classic subclass
    # overrides collect, so patching the abstract base misses it)
    cls = type(g.edges)
    sizes = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    rows = shortest_path(g, 0, 5, strategy="bsp").orderBy("pos").collect()
    assert [r.id for r in rows] == [0, 1, 2, 3, 4, 5]
    # path has 6 vertices; the graph has 67 — every driver-side collect
    # must stay at path scale (the final result + 1-row probes only)
    assert sizes and max(sizes) <= 8, sizes
