"""Ear decomposition (G7-G11) + interior postprocess (G17-G18):
structure properties and exact equivalence with plain Brandes."""

import networkx as nx
import numpy as np
import pytest

from centrality_gpu_spark.operators.betweenness import brandes_kernel
from centrality_gpu_spark.operators.ears import (
    brandes_ear_kernel,
    dependency_accumulation,
    ear_graph_order,
    find_ears,
)

from tests.conftest import sample_nx


def to_csr(nxg):
    ids = sorted(nxg.nodes())
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    s, t = [], []
    for u, v in nxg.edges():
        s += [idx[u], idx[v]]
        t += [idx[v], idx[u]]
    s, t = np.array(s), np.array(t)
    o = np.lexsort((t, s))
    s, t = s[o], t[o]
    iptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(iptr, s + 1, 1)
    return np.cumsum(iptr), t.astype(np.int64), n, ids


def subdivided_random_graph(trial, rng):
    """Connected random graph with ~60% of edges subdivided into paths
    of length 2-4 — rich in degree-2 runs (the ear regime)."""
    g = nx.gnm_random_graph(12, 20, seed=trial)
    g = nx.convert_node_labels_to_integers(
        max((g.subgraph(c) for c in nx.connected_components(g)), key=len)
    )
    h = nx.Graph()
    nid = max(g.nodes()) + 1
    for u, v in g.edges():
        if rng.random() < 0.6:
            prev = u
            for _ in range(int(rng.integers(1, 4))):
                h.add_edge(prev, nid)
                prev = nid
                nid += 1
            h.add_edge(prev, v)
        else:
            h.add_edge(u, v)
    return h


def test_find_ears_structure():
    """Ears partition exactly the non-cycle degree-2 vertices; ld/rd
    are consistent run prefix sums (the preSum contract)."""
    rng = np.random.default_rng(2)
    h = subdivided_random_graph(3, rng)
    iptr, idxs, n, _ = to_csr(h)
    deg = np.diff(iptr)
    ears = find_ears(iptr, idxs, n)
    covered = np.zeros(n, dtype=bool)
    for e in ears:
        assert not covered[e.nodes].any()  # vertex-disjoint
        covered[e.nodes] = True
        assert (deg[e.nodes] == 2).all()
        assert deg[e.lnode] != 2 and deg[e.rnode] != 2
        td = len(e.nodes) + 1
        assert (e.ld + e.rd == td).all()
        assert (np.diff(e.ld) == 1).all()
        # interiors really form a path lnode—…—rnode
        path = [e.lnode, *e.nodes.tolist(), e.rnode]
        for a, b in zip(path, path[1:]):
            assert b in idxs[iptr[a] : iptr[a + 1]]
    assert (covered == (deg == 2)).all()


def test_find_ears_pure_cycle_left_alone():
    cyc = nx.cycle_graph(9)
    iptr, idxs, n, _ = to_csr(cyc)
    assert find_ears(iptr, idxs, n) == []
    # and the kernel still equals plain Brandes (all-free fallback)
    a = brandes_kernel(iptr, idxs, np.arange(n), n)
    b = brandes_ear_kernel(iptr, idxs, n)
    assert np.allclose(a, b, atol=1e-9)


def test_ear_graph_order_covers_all():
    rng = np.random.default_rng(4)
    h = subdivided_random_graph(7, rng)
    iptr, idxs, n, _ = to_csr(h)
    ears = find_ears(iptr, idxs, n)
    order = ear_graph_order(ears)
    assert sorted(order) == list(range(len(ears)))


@pytest.mark.parametrize("trial", [0, 1, 2, 3])
def test_ear_kernel_equals_brandes_random(trial):
    rng = np.random.default_rng(trial + 100)
    h = subdivided_random_graph(trial, rng)
    iptr, idxs, n, _ = to_csr(h)
    reach = rng.integers(0, 5, n).astype(float) if trial % 2 else None
    a = brandes_kernel(iptr, idxs, np.arange(n), n, reach)
    b = brandes_ear_kernel(iptr, idxs, n, reach, row_cache_size=4)
    assert len(find_ears(iptr, idxs, n)) > 0
    assert np.allclose(a, b, atol=1e-9)


def test_ear_kernel_samples(sample_name):
    nxg = sample_nx(sample_name)
    iptr, idxs, n, _ = to_csr(nxg)
    a = brandes_kernel(iptr, idxs, np.arange(n), n)
    b = brandes_ear_kernel(iptr, idxs, n)
    assert np.allclose(a, b, atol=1e-9)


def test_ear_kernel_dangling_paths():
    """Tree chains (boundary can be degree 1) and theta graphs
    (parallel chains between the same two endpoints)."""
    g = nx.Graph()
    # theta: two chains + direct edge between hubs 0 and 1
    g.add_edge(0, 1)
    g.add_edge(0, 10), g.add_edge(10, 11), g.add_edge(11, 1)
    g.add_edge(0, 20), g.add_edge(20, 21), g.add_edge(21, 22), g.add_edge(22, 1)
    # dangling path off hub 0
    g.add_edge(0, 30), g.add_edge(30, 31), g.add_edge(31, 32)
    iptr, idxs, n, _ = to_csr(g)
    a = brandes_kernel(iptr, idxs, np.arange(n), n)
    b = brandes_ear_kernel(iptr, idxs, n)
    assert np.allclose(a, b, atol=1e-9)


def test_dependency_accumulation_matches_true_rows():
    """Feeding *true* BFS rows through the shared reverse sweep must
    reproduce one source's Brandes deltas (G18 == G15 on real rows)."""
    from centrality_gpu_spark.operators.csrkernels import bfs_forward

    nxg = sample_nx("test2")
    iptr, idxs, n, _ = to_csr(nxg)
    reach = np.zeros(n)
    for s in range(3):
        dist, sigma, _ = bfs_forward(iptr, idxs, s, n)
        delta = dependency_accumulation(iptr, idxs, dist, sigma, reach)
        delta[s] = 0.0
        one = brandes_kernel(iptr, idxs, np.array([s]), n)
        assert np.allclose(delta, one, atol=1e-9)


def test_betweenness_decomposed_with_ears(spark, sample_name):
    from centrality_gpu_spark.operators.bcc import betweenness_decomposed
    from centrality_gpu_spark.sources.edgelist import read_edge_list_local

    from tests.conftest import SAMPLE_DIR

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    exp = {
        k: 2.0 * v
        for k, v in nx.betweenness_centrality(
            sample_nx(sample_name), normalized=False
        ).items()
    }
    got = {r.id: r.bc for r in betweenness_decomposed(g, use_ears=True).collect()}
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-6), v


def test_ear_dispatch_rule():
    """The measured decision region (BENCH.md q16c A/B): modest BCCs
    with enough degree-2 interiors ride the ear kernel; large or
    chain-free BCCs take plain Brandes."""
    import numpy as np

    from centrality_gpu_spark.operators.bcc import (
        EAR_MAX_BCC_VERTICES,
        _ear_dispatch,
    )

    ring = np.full(100, 2)          # all-degree-2 ring, small
    assert _ear_dispatch(100, ring)
    assert not _ear_dispatch(EAR_MAX_BCC_VERTICES + 1,
                             np.full(EAR_MAX_BCC_VERTICES + 1, 2))
    dense = np.full(100, 9)          # no degree-2 interiors to compress
    assert not _ear_dispatch(100, dense)
    mixed = np.array([2] * 30 + [5] * 70)  # 30% deg-2: in-region
    assert _ear_dispatch(100, mixed)
    thin = np.array([2] * 10 + [5] * 90)   # 10% deg-2: out
    assert not _ear_dispatch(100, thin)


def test_ear_dispatch_env_override(monkeypatch):
    """The win region encodes THIS box's cache hierarchy (VERDICT r04
    nit #3): other hardware overrides it via env without code edits."""
    import numpy as np

    from centrality_gpu_spark.operators.bcc import _ear_dispatch

    ring = np.full(100, 2)
    monkeypatch.setenv("CGS_EAR_MAX_BCC_VERTICES", "50")
    assert not _ear_dispatch(100, ring)  # cap lowered below 100
    monkeypatch.setenv("CGS_EAR_MAX_BCC_VERTICES", "200")
    monkeypatch.setenv("CGS_EAR_MIN_DEG2_FRACTION", "0.0")
    dense = np.full(100, 9)
    assert _ear_dispatch(100, dense)  # fraction floor removed


def test_ear_calibration_probe():
    """One-shot in-place calibration: the probe times both kernels on a
    ~2/3-degree-2 synthetic, asserts output equality, and caches a
    session verdict that _ear_dispatch then honors."""
    import numpy as np

    from centrality_gpu_spark.operators import bcc

    try:
        out = bcc.calibrate_ear_dispatch(probe_vertices=1_000)
        assert out["probe_vertices"] >= 900
        assert out["plain_s"] > 0 and out["ear_s"] > 0
        assert out["max_vertices"] in (0, bcc.EAR_MAX_BCC_VERTICES)
        ring = np.full(100, 2)
        expect = out["max_vertices"] > 0
        assert bcc._ear_dispatch(100, ring) is expect
    finally:
        bcc._EAR_CAL.clear()  # don't leak the verdict into other tests


@pytest.mark.parametrize("mode", ["auto", True, False])
def test_decomposed_bc_kernel_independent(spark, mode):
    """use_ears=auto/True/False must agree to 1e-9 — the dispatch can
    only change wall time, never values (both sides of the threshold
    exercised: the chain-of-cliques graph has deg-2-rich and dense
    BCCs)."""
    from centrality_gpu_spark.operators.bcc import betweenness_decomposed

    # two 5-cliques joined by a 6-vertex path: one dense BCC, one
    # chain-heavy BCC region, bridges, articulation points
    edges = []
    for base in (0, 20):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    path = [4, 10, 11, 12, 13, 14, 20]
    edges += list(zip(path, path[1:]))
    from centrality_gpu_spark.graph import Graph

    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    g = Graph.from_undirected_edges(df, weight_col="weight")
    got = {
        r.id: r.bc
        for r in betweenness_decomposed(g, use_ears=mode).collect()
    }
    exp = {
        k: 2.0 * v
        for k, v in nx.betweenness_centrality(
            nx.Graph(edges), normalized=False
        ).items()
    }
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v
