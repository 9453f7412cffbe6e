"""Random walks: exact python-md5 golden replay; sampled betweenness:
s = n degenerates to exact, sample determinism."""

from __future__ import annotations

import hashlib

import networkx as nx
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.betweenness import (
    betweenness_broadcast,
    betweenness_sampled,
)
from centrality_gpu_spark.operators.walks import node2vec_walks, random_walks


def _graph_from_nx(spark, g: nx.Graph) -> Graph:
    edges = [(int(u), int(v), 1.0) for u, v in g.edges()]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return Graph.from_undirected_edges(df, weight_col="weight")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_walks(g: nx.Graph, walk_length: int, walks_per_vertex: int,
                  seed: str = "rw") -> set[tuple[int, int, int, int]]:
    adj = {v: sorted(g.neighbors(v)) for v in g.nodes()}
    rows = set()
    for start in g.nodes():
        for walk in range(walks_per_vertex):
            v = start
            rows.add((start, walk, 0, v))
            for t in range(1, walk_length + 1):
                nbrs = adj[v]
                v = nbrs[_h60(f"{seed}:{start}:{walk}:{t}") % len(nbrs)]
                rows.add((start, walk, t, v))
    return rows


@pytest.mark.parametrize("seed", [6])
def test_random_walks_match_python_md5_golden(spark, seed):
    g = nx.gnp_random_graph(25, 0.2, seed=seed)
    g.remove_nodes_from(list(nx.isolates(g)))
    got = {
        (r.start, r.walk, r.step, r.vertex)
        for r in random_walks(
            _graph_from_nx(spark, g), walk_length=4, walks_per_vertex=2
        ).collect()
    }
    assert got == _python_walks(g, 4, 2)


def test_random_walks_follow_edges_and_are_deterministic(spark):
    g = nx.karate_club_graph()
    sg = _graph_from_nx(spark, g)
    w1 = random_walks(sg, walk_length=3, walks_per_vertex=1).collect()
    w2 = random_walks(sg, walk_length=3, walks_per_vertex=1).collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
    pos = {(r.start, r.walk, r.step): r.vertex for r in w1}
    for (start, walk, step), v in pos.items():
        if step > 0:
            prev = pos[(start, walk, step - 1)]
            assert g.has_edge(prev, v), (start, walk, step)
    # full corpus: every vertex starts walks_per_vertex walks
    assert len(w1) == g.number_of_nodes() * 1 * 4


def test_random_walks_seed_changes_corpus(spark):
    g = nx.karate_club_graph()
    sg = _graph_from_nx(spark, g)
    a = {tuple(r) for r in random_walks(sg, 3, 1, seed="a").collect()}
    b = {tuple(r) for r in random_walks(sg, 3, 1, seed="b").collect()}
    assert a != b


def _python_n2v(g: nx.Graph, walk_length: int, walks_per_vertex: int,
                p: float, q: float, seed: str = "n2v"):
    """Exact float64 mirror of node2vec_walks' inverse-CDF sampling."""
    adj = {v: sorted(g.neighbors(v)) for v in g.nodes()}
    aset = {v: set(ns) for v, ns in adj.items()}
    rows = set()
    for start in g.nodes():
        for walk in range(walks_per_vertex):
            v, prev = start, None
            rows.add((start, walk, 0, v))
            for t in range(1, walk_length + 1):
                nbrs = adj[v]
                if t == 1:
                    nxt = nbrs[_h60(f"{seed}:{start}:{walk}:{t}") % len(nbrs)]
                else:
                    wgts = [
                        (1.0 / p) if x == prev
                        else 1.0 if x in aset[prev]
                        else (1.0 / q)
                        for x in nbrs
                    ]
                    u = (_h60(f"{seed}:{start}:{walk}:{t}") / 2 ** 60) * sum(wgts)
                    cw, nxt = 0.0, nbrs[-1]
                    for x, wt in zip(nbrs, wgts):
                        cw += wt
                        if u < cw:
                            nxt = x
                            break
                prev, v = v, nxt
                rows.add((start, walk, t, v))
    return rows


@pytest.mark.parametrize("p,q", [(0.5, 2.0), (2.0, 0.25)])
def test_node2vec_walks_match_python_golden(spark, p, q):
    g = nx.gnp_random_graph(22, 0.25, seed=11)
    g.remove_nodes_from(list(nx.isolates(g)))
    got = {
        (r.start, r.walk, r.step, r.vertex)
        for r in node2vec_walks(
            _graph_from_nx(spark, g), walk_length=4, walks_per_vertex=2,
            p=p, q=q,
        ).collect()
    }
    assert got == _python_n2v(g, 4, 2, p, q)


def test_node2vec_low_p_returns_more(spark):
    """p≪1 makes the return edge dominate: walkers bounce back to the
    predecessor far more often than under p≫1."""
    g = nx.connected_watts_strogatz_graph(40, 6, 0.3, seed=5)
    sg = _graph_from_nx(spark, g)

    def return_rate(p, q):
        pos = {
            (r.start, r.walk, r.step): r.vertex
            for r in node2vec_walks(sg, walk_length=4, p=p, q=q).collect()
        }
        rets = tot = 0
        for (s, w, t), v in pos.items():
            if t >= 2:
                tot += 1
                rets += v == pos[(s, w, t - 2)]
        return rets / tot

    assert return_rate(0.25, 1.0) > return_rate(4.0, 1.0) + 0.2


def test_sampled_betweenness_full_sample_is_exact(spark):
    g = nx.karate_club_graph()
    sg = _graph_from_nx(spark, g)
    exact = {r.id: r.bc for r in betweenness_broadcast(sg).collect()}
    est = {
        r.id: r.bc
        for r in betweenness_sampled(sg, n_samples=g.number_of_nodes()).collect()
    }
    assert set(est) == set(exact)
    for v in exact:
        assert abs(est[v] - exact[v]) < 1e-9


def test_sampled_betweenness_estimator_tracks_exact(spark):
    g = nx.connected_watts_strogatz_graph(60, 6, 0.2, seed=3)
    sg = _graph_from_nx(spark, g)
    exact = {r.id: r.bc for r in betweenness_broadcast(sg).collect()}
    est = {r.id: r.bc for r in betweenness_sampled(sg, n_samples=30).collect()}
    # estimator is unbiased; on half the sources the TOTAL mass should
    # be close (sum bc is a global invariant scaled by n/s)
    tot_exact = sum(exact.values())
    tot_est = sum(est.values())
    assert abs(tot_est - tot_exact) / tot_exact < 0.35
    # and the top-5 exact vertices should rank high in the estimate
    top_exact = sorted(exact, key=exact.get, reverse=True)[:5]
    top_est = set(sorted(est, key=est.get, reverse=True)[:12])
    assert sum(v in top_est for v in top_exact) >= 3
