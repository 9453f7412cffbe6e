"""GraphSAGE-style neighbor sampling: python-md5 golden replay +
structural properties (fanout bound, without-replacement, edge validity)."""

from __future__ import annotations

import hashlib

import networkx as nx

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.sampling import sample_neighbors


def _graph_from_nx(spark, g: nx.Graph) -> Graph:
    edges = [(int(u), int(v), 1.0) for u, v in g.edges()]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return Graph.from_undirected_edges(df, weight_col="weight")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_sample(g: nx.Graph, fanouts, seed="gs"):
    rows = set()
    for s in g.nodes():
        frontier = {s}
        for h, fan in enumerate(fanouts, start=1):
            nxt = set()
            for v in sorted(frontier):
                nbrs = sorted(
                    g.neighbors(v), key=lambda d: (_h60(f"{seed}:{h}:{v}:{d}"), d)
                )[:fan]
                for d in nbrs:
                    rows.add((s, h, v, d))
                    nxt.add(d)
            frontier = nxt
    return rows


def test_sample_neighbors_matches_python_golden(spark):
    g = nx.gnp_random_graph(25, 0.25, seed=7)
    g.remove_nodes_from(list(nx.isolates(g)))
    got = {
        (r.seed, r.hop, r.src, r.dst)
        for r in sample_neighbors(_graph_from_nx(spark, g), fanouts=[3, 2]).collect()
    }
    assert got == _python_sample(g, [3, 2])


def test_sample_neighbors_properties(spark):
    g = nx.connected_watts_strogatz_graph(50, 8, 0.2, seed=2)
    sg = _graph_from_nx(spark, g)
    rows = sample_neighbors(sg, fanouts=[4, 3]).collect()
    per = {}
    for r in rows:
        assert g.has_edge(r.src, r.dst)
        per.setdefault((r.seed, r.hop, r.src), []).append(r.dst)
    for (_, hop, _), dsts in per.items():
        assert len(dsts) == len(set(dsts))          # without replacement
        assert len(dsts) <= (4 if hop == 1 else 3)  # fanout bound
    # hop-1 of each seed samples the seed itself
    hop1_srcs = {(r.seed, r.src) for r in rows if r.hop == 1}
    assert all(s == v for s, v in hop1_srcs)
    # determinism
    again = {
        tuple(r) for r in sample_neighbors(sg, fanouts=[4, 3]).collect()
    }
    assert again == {tuple(r) for r in rows}
