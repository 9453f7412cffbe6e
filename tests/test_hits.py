"""HITS + Adamic–Adar vs networkx goldens."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.hits import adamic_adar, hits
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR


def test_hits_matches_dense_numpy(spark):
    """Alternating L2-normalized iteration vs an independent dense
    numpy replay of the same recurrence (nx.hits needs scipy, absent
    here), exact to 1e-9 at the same fixed budget."""
    import numpy as np

    dedges = [(0, 10), (0, 11), (1, 10), (2, 11), (2, 12), (3, 12), (3, 10)]
    iters = 20
    df = spark.createDataFrame(dedges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in hits(df, fixed_iterations=iters).collect()}

    nodes = sorted({u for e in dedges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v in dedges:
        A[idx[u], idx[v]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(iters):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v][0] == pytest.approx(h[idx[v]], abs=1e-9)
        assert got[v][1] == pytest.approx(a[idx[v]], abs=1e-9)


def test_hits_covers_both_roles(spark):
    """Pure sources have auth 0; pure sinks have hub 0; rows cover the
    full vertex set."""
    df = spark.createDataFrame([(1, 2), (1, 3), (4, 3)], "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in hits(df, fixed_iterations=5).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1][1] == 0.0 and got[4][1] == 0.0  # never a dst
    assert got[2][0] == 0.0 and got[3][0] == 0.0  # never a src


def _sample_graph(spark, name):
    return read_edge_list_local(spark, f"{SAMPLE_DIR}/{name}.txt")


@pytest.mark.parametrize("sample", ["test1", "test2", "test4"])
def test_adamic_adar_matches_networkx(spark, sample):
    g = _sample_graph(spark, sample)
    got = {(r.u, r.v): (r.cn, r.score) for r in adamic_adar(g).collect()}

    G = nx.Graph(
        (r.src, r.dst) for r in g.edges.where(F.col("src") < F.col("dst")).collect()
    )
    expected = {
        (min(u, v), max(u, v)): s
        for u, v, s in nx.adamic_adar_index(G)
        if s > 0
    }
    assert set(got) == set(expected)
    for k, s in expected.items():
        assert got[k][1] == pytest.approx(s, abs=1e-9)
        cn = len(set(G[k[0]]) & set(G[k[1]]))
        assert got[k][0] == cn


def test_adamic_adar_hub_cap_drops_heavy_wedges(spark):
    """With the cap below the hub's degree, pairs whose ONLY common
    neighbor is the hub disappear."""
    # star: hub 0 connects to 1..5; plus a side wedge 1-6-2
    edges = [(0, i) for i in range(1, 6)] + [(1, 6), (6, 2)]
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    g = Graph.from_undirected_edges(df, weight_col="weight")
    full = {(r.u, r.v) for r in adamic_adar(g).collect()}
    capped = {(r.u, r.v) for r in adamic_adar(g, max_neighbor_degree=3).collect()}
    assert (3, 4) in full and (3, 4) not in capped  # only via hub 0
    assert (1, 2) in capped  # still reachable through 6 (degree 2)


# ------------------------------------------------------------------ SALSA

def _salsa_numpy(edges, tol=1e-12):
    """Reference: explicit authority/hub chain power iteration per
    connected component of the bipartite support, weighted by the
    component's share of that side's vertices."""
    import numpy as np

    edges = sorted(set(edges))
    hubs = sorted({u for u, _ in edges})
    auths = sorted({v for _, v in edges})
    out = {h: sum(1 for u, _ in edges if u == h) for h in hubs}
    inn = {a: sum(1 for _, v in edges if v == a) for a in auths}

    # bipartite components via union-find on (('h',u), ('a',v))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        parent[find(x)] = find(y)

    for u, v in edges:
        union(("h", u), ("a", v))

    def chain_scores(side_nodes, step_pairs, side_tag):
        """step_pairs: list of (i, j, prob) transition summands."""
        import numpy as np

        comps = {}
        for n in side_nodes:
            comps.setdefault(find((side_tag, n)), []).append(n)
        scores = {}
        total = len(side_nodes)
        for members in comps.values():
            idx = {n: k for k, n in enumerate(members)}
            P = np.zeros((len(members), len(members)))
            for i, j, p in step_pairs:
                if i in idx:
                    P[idx[i], idx[j]] += p
            pi = np.full(len(members), 1.0 / len(members))
            for _ in range(10000):
                nxt = pi @ P
                if np.abs(nxt - pi).max() < tol:
                    pi = nxt
                    break
                pi = nxt
            w = len(members) / total
            for n in members:
                scores[n] = w * pi[idx[n]]
        return scores

    auth_steps = [
        (v1, v2, 1.0 / (inn[v1] * out[h]))
        for h, v1 in edges
        for h2, v2 in edges
        if h2 == h
    ]
    hub_steps = [
        (h1, h2, 1.0 / (out[h1] * inn[v]))
        for h1, v in edges
        for h2, v2 in edges
        if v2 == v
    ]
    return chain_scores(hubs, hub_steps, "h"), chain_scores(auths, auth_steps, "a")


def test_salsa_closed_form_k23(spark):
    from centrality_gpu_spark.operators.hits import salsa

    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in salsa(df).collect()}
    assert got[1] == (0.5, 0.0) and got[2] == (0.5, 0.0)
    for a in (10, 11, 12):
        assert got[a][0] == 0.0
        assert abs(got[a][1] - 1 / 3) < 1e-8


def test_salsa_two_disjoint_stars(spark):
    from centrality_gpu_spark.operators.hits import salsa

    edges = [(1, 10), (1, 11), (2, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in salsa(df).collect()}
    # authorities: C1={10,11} share 2/3, in=1 each -> 1/3; C2={12} -> 1/3
    for a in (10, 11, 12):
        assert abs(got[a][1] - 1 / 3) < 1e-8
    # hubs: C1={1} share 1/2 -> 0.5; C2={2} -> 0.5
    assert got[1][0] == 0.5 and got[2][0] == 0.5


@pytest.mark.parametrize("seed", [2, 6])
def test_salsa_equals_chain_power_iteration(spark, seed):
    import numpy as np

    from centrality_gpu_spark.operators.hits import salsa

    rng = np.random.default_rng(seed)
    edges = list(
        {
            (int(rng.integers(0, 8)), int(100 + rng.integers(0, 10)))
            for _ in range(25)
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in salsa(df).collect()}
    hub_ref, auth_ref = _salsa_numpy(edges)
    for h, s in hub_ref.items():
        assert abs(got[h][0] - s) < 1e-6, (h, got[h][0], s)
    for a, s in auth_ref.items():
        assert abs(got[a][1] - s) < 1e-6, (a, got[a][1], s)
