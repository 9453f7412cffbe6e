"""BFS, betweenness (both physical modes), and closeness vs networkx.

Golden semantics (FIXTURES.md §4): reference BC = ordered-pair counting
= 2× nx unnormalized; closeness = nx (wf_improved).
"""

import networkx as nx
import numpy as np
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.betweenness import (
    betweenness_broadcast,
    betweenness_bsp,
    brandes_kernel,
    graph_to_csr,
)
from centrality_gpu_spark.operators.bfs import multi_source_bfs, sssp_distances
from centrality_gpu_spark.operators.closeness import closeness_broadcast, closeness_bsp
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR, SF_SMALL, sample_nx


def golden_bc(nxg):
    return {k: 2.0 * v for k, v in
            nx.betweenness_centrality(nxg, normalized=False).items()}


def test_bfs_distances_and_sigma(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    srcs = sorted(nxg.nodes())[:3]
    res = multi_source_bfs(
        g, spark.createDataFrame([(int(s),) for s in srcs], "source long")
    )
    rows = res.visited.collect()
    got_d = {(r.source, r.vertex): r.dist for r in rows}
    got_s = {(r.source, r.vertex): r.sigma for r in rows}
    for s in srcs:
        dist = nx.single_source_shortest_path_length(nxg, s)
        # sigma: number of shortest paths
        sigma = {v: 0 for v in nxg.nodes()}
        sigma[s] = 1
        for v in sorted(dist, key=dist.get):
            for u in nxg.neighbors(v):
                if dist.get(u, -1) == dist[v] + 1:
                    sigma[u] += sigma[v]
        for v, d in dist.items():
            assert got_d[(s, v)] == d
            assert got_s[(s, v)] == pytest.approx(sigma[v])


def test_brandes_kernel_numpy(spark, sample_name):
    """The numpy kernel alone (no Spark) vs the golden values."""
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    ids, indptr, indices = graph_to_csr(g)
    bc = brandes_kernel(indptr, indices, np.arange(len(ids)), len(ids))
    exp = golden_bc(sample_nx(sample_name))
    for i, v in enumerate(ids.tolist()):
        assert bc[i] == pytest.approx(exp[v], abs=1e-6)


@pytest.mark.parametrize("impl", [betweenness_broadcast, betweenness_bsp])
def test_betweenness_samples(spark, sample_name, impl):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    got = {r.id: r.bc for r in impl(g).collect()}
    exp = golden_bc(sample_nx(sample_name))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_betweenness_bsp_small_batches(spark):
    """Waves of 4 sources must sum to the same result as one wave."""
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test2.txt")
    got = {r.id: r.bc for r in betweenness_bsp(g, batch_size=4).collect()}
    exp = golden_bc(sample_nx("test2"))
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_betweenness_disconnected(spark):
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_undirected_edges(df)
    nxg = nx.Graph(edges)
    got = {r.id: r.bc for r in betweenness_broadcast(g).collect()}
    exp = golden_bc(nxg)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6)


@pytest.mark.parametrize("impl", [closeness_broadcast, closeness_bsp])
def test_closeness_samples(spark, sample_name, impl):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    got = {r.id: r.closeness for r in impl(g).collect()}
    exp = nx.closeness_centrality(nxg)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_sssp(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test4.txt")
    nxg = sample_nx("test4")
    got = {r.vertex: r.dist for r in sssp_distances(g, 0).collect()}
    assert got == nx.single_source_shortest_path_length(nxg, 0)


def test_diameter_estimate(spark):
    from centrality_gpu_spark.operators.bfs import diameter_estimate

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test4.txt")
    nxg = sample_nx("test4")
    med = diameter_estimate(g, n_samples=21)
    eccs = sorted(nx.eccentricity(nxg).values())
    assert eccs[0] <= med <= eccs[-1]


def test_weighted_sssp(spark):
    from centrality_gpu_spark.operators.bfs import weighted_sssp

    rng = np.random.default_rng(9)
    nxg = nx.gnm_random_graph(30, 60, seed=7)
    for u, v in nxg.edges():
        nxg[u][v]["weight"] = float(rng.integers(1, 10))
    df = spark.createDataFrame(
        [(u, v, nxg[u][v]["weight"]) for u, v in nxg.edges()],
        "src long, dst long, weight double",
    )
    g = Graph.from_undirected_edges(df, weight_col="weight")
    src = 0
    got = {r.vertex: r.dist for r in weighted_sssp(g, src).collect()}
    exp = nx.single_source_dijkstra_path_length(nxg, src)
    assert got == pytest.approx(exp)


# ------------------------- round 2: direction switch + regime guards

def test_bfs_forward_direction_invariance(spark, sample_name):
    """Forcing all-top-down vs all-bottom-up gives identical dist/sigma
    (G6: the Beamer switch is a physical choice, not a semantic one)."""
    from centrality_gpu_spark.operators.csrkernels import bfs_forward

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    ids, indptr, indices = graph_to_csr(g)
    n = len(ids)
    for s in range(min(n, 4)):
        d_td, s_td, lv_td = bfs_forward(indptr, indices, s, n, alpha=float("inf"))
        d_bu, s_bu, lv_bu = bfs_forward(indptr, indices, s, n, alpha=0.0)
        d_auto, s_auto, _ = bfs_forward(indptr, indices, s, n)
        assert (d_td == d_bu).all() and (d_td == d_auto).all()
        assert np.allclose(s_td, s_bu) and np.allclose(s_td, s_auto)
        assert len(lv_td) == len(lv_bu)
        for a, b in zip(lv_td, lv_bu):
            assert (np.sort(a) == np.sort(b)).all()


def test_graph_to_csr_size_guard(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    with pytest.raises(ValueError, match="broadcast limit"):
        graph_to_csr(g, max_edges=2)


def test_auto_strategy_routes_to_bsp(spark, monkeypatch):
    """Above the size guard the front doors must never collect the edge
    table — broadcast kernels are made unreachable and results must
    still be golden-correct via the BSP twins."""
    import centrality_gpu_spark.operators.betweenness as bmod
    import centrality_gpu_spark.operators.closeness as cmod
    from centrality_gpu_spark.operators.betweenness import betweenness
    from centrality_gpu_spark.operators.closeness import closeness

    def boom(*a, **k):
        raise AssertionError("broadcast path must not run above the guard")

    monkeypatch.setattr(bmod, "betweenness_broadcast", boom)
    monkeypatch.setattr(cmod, "closeness_broadcast", boom)
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test2.txt")
    nxg = sample_nx("test2")
    bc = {r.id: r.bc for r in betweenness(g, max_broadcast_edges=2).collect()}
    exp = golden_bc(nxg)
    for v in exp:
        assert bc[v] == pytest.approx(exp[v], abs=1e-6)
    cl = {r.id: r.closeness for r in closeness(g, max_broadcast_edges=2).collect()}
    exp_c = nx.closeness_centrality(nxg)
    for v in exp_c:
        assert cl[v] == pytest.approx(exp_c[v], abs=1e-6)


def test_bfs_visited_broadcast_equals_bsp(spark, sample_name):
    from centrality_gpu_spark.operators.bfs import bfs_visited

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    srcs = spark.createDataFrame([(0,), (1,)], "source long")
    fast = {
        (r.source, r.vertex): (r.dist, r.sigma)
        for r in bfs_visited(g, srcs, strategy="broadcast").collect()
    }
    slow = {
        (r.source, r.vertex): (r.dist, r.sigma)
        for r in bfs_visited(g, srcs, strategy="bsp").collect()
    }
    assert fast.keys() == slow.keys()
    for k in fast:
        assert fast[k][0] == slow[k][0]
        assert fast[k][1] == pytest.approx(slow[k][1])


def test_bfs_broadcast_unknown_source_raises(spark):
    from centrality_gpu_spark.operators.bfs import multi_source_bfs_broadcast

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    srcs = spark.createDataFrame([(424242,)], "source long")
    with pytest.raises(Exception, match="unknown BFS source"):
        multi_source_bfs_broadcast(g, srcs).collect()


def test_direction_switch_chain_vs_clique(spark):
    """G14 evidence: on a chain (high diameter) the per-level cost rule
    never goes bottom-up; on a clique (diameter 1) it does — the same
    signal the reference's sampled-diameter gate proxies."""
    from centrality_gpu_spark.operators.csrkernels import bfs_forward

    from pyspark.sql import functions as F

    chain = Graph.from_undirected_edges(
        spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    )
    ids, indptr, indices = graph_to_csr(chain)
    recs: list = []
    bfs_forward(indptr, indices, 0, len(ids), directions=recs)
    # the walk down the chain stays top-down (frontier degree ~2 never
    # outweighs the remaining edges); only the tail, where almost
    # nothing is undiscovered, may flip to a (then-cheap) bottom-up
    half = recs[: len(recs) // 2]
    assert set(half) == {"td"}

    clique = Graph.from_undirected_edges(
        spark.createDataFrame(
            [(i, j) for i in range(12) for j in range(i + 1, 12)],
            "src long, dst long",
        )
    )
    ids, indptr, indices = graph_to_csr(clique)
    recs = []
    bfs_forward(indptr, indices, 0, len(ids), directions=recs)
    assert "bu" in recs


def _sample_edges_cte(name: str) -> str:
    """Inline symmetrized edges CTE for a reference sample graph."""
    from tests.conftest import read_sample_edges

    rows = ", ".join(f"({u}, {v})" for u, v in read_sample_edges(name))
    return (
        f"raw(src, dst) AS (VALUES {rows}),\n"
        "edges AS (SELECT src, dst FROM raw "
        "UNION ALL SELECT dst, src FROM raw)"
    )


def test_apsp_oracle_sql_vs_networkx(sample_name):
    """The unrolled-APSP DuckDB oracle (used by the driver for the
    events-graph centralities) reproduces 2x-unnormalized networkx BC
    and wf-improved closeness on every reference sample graph."""
    import duckdb

    from centrality_gpu_spark.operators.betweenness import brandes_apsp_oracle_sql
    from centrality_gpu_spark.operators.closeness import closeness_apsp_oracle_sql
    from tests.conftest import sample_nx

    g = sample_nx(sample_name)
    cte = _sample_edges_cte(sample_name)
    con = duckdb.connect()
    bc = dict(con.execute(brandes_apsp_oracle_sql(cte, max_depth=12)).fetchall())
    cl = dict(con.execute(closeness_apsp_oracle_sql(cte, max_depth=12)).fetchall())
    nx_bc = nx.betweenness_centrality(g, normalized=False)
    nx_cl = nx.closeness_centrality(g, wf_improved=True)
    assert set(bc) == set(g.nodes)
    for v in g.nodes:
        assert bc[v] == pytest.approx(2 * nx_bc[v], abs=1e-6)
        assert cl[v] == pytest.approx(nx_cl[v], abs=1e-6)


def test_apsp_oracle_sql_events_graph():
    """Oracle vs networkx on the real sf0.001 events graph (the same
    CTE the driver hash-checks betweenness/closeness_events against)."""
    import duckdb

    from centrality_gpu_spark.operators.betweenness import brandes_apsp_oracle_sql
    from centrality_gpu_spark.sources.testdata_graphs import EVENTS_EDGES_CTE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'"
    )
    bc = dict(con.execute(brandes_apsp_oracle_sql(EVENTS_EDGES_CTE)).fetchall())
    edges = con.execute(f"WITH {EVENTS_EDGES_CTE} SELECT src, dst FROM edges").fetchall()
    g = nx.Graph()
    g.add_edges_from(edges)
    nx_bc = nx.betweenness_centrality(g, normalized=False)
    assert set(bc) == set(g.nodes)
    for v in g.nodes:
        assert bc[v] == pytest.approx(2 * nx_bc[v], abs=1e-6)


@pytest.mark.parametrize("strategy", ["broadcast", "bsp"])
def test_harmonic_samples(spark, sample_name, strategy):
    from centrality_gpu_spark.operators.closeness import harmonic

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    got = {r.id: r.harmonic for r in harmonic(g, strategy=strategy).collect()}
    exp = nx.harmonic_centrality(sample_nx(sample_name))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def test_harmonic_disconnected(spark):
    """Unreachable pairs contribute 0 (no wf correction needed)."""
    from centrality_gpu_spark.operators.closeness import harmonic

    edges = [(0, 1), (1, 2), (10, 11)]
    g = Graph.from_undirected_edges(spark.createDataFrame(edges, "src long, dst long"))
    got = {r.id: r.harmonic for r in harmonic(g).collect()}
    nxg = nx.Graph(edges)
    exp = nx.harmonic_centrality(nxg)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


# --------------------------- round 2: weighted betweenness / closeness


def _weighted_random_graph(spark, n=40, m=90, seed=11):
    rng = np.random.default_rng(seed)
    nxg = nx.gnm_random_graph(n, m, seed=seed)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    for u, v in nxg.edges():
        # exact binary fractions so float sums are deterministic
        nxg[u][v]["weight"] = 1.0 + float(rng.integers(0, 4)) / 8.0
    df = spark.createDataFrame(
        [(u, v, nxg[u][v]["weight"]) for u, v in nxg.edges()],
        "src long, dst long, weight double",
    )
    return Graph.from_undirected_edges(df, weight_col="weight"), nxg


def test_betweenness_weighted_vs_networkx(spark):
    from centrality_gpu_spark.operators.betweenness import betweenness_weighted

    g, nxg = _weighted_random_graph(spark)
    got = {r.id: r.bc for r in betweenness_weighted(g).collect()}
    exp = nx.betweenness_centrality(nxg, normalized=False, weight="weight")
    assert set(got) == set(nxg.nodes)
    for v in nxg.nodes:
        assert got[v] == pytest.approx(2 * exp[v], abs=1e-6), v


def test_betweenness_weighted_sources_subset(spark):
    from centrality_gpu_spark.operators.betweenness import (
        betweenness_weighted,
        brandes_weighted_kernel,
    )
    from centrality_gpu_spark.operators.csrkernels import graph_to_csr_weighted

    g, _ = _weighted_random_graph(spark, seed=12)
    ids, indptr, indices, weights = graph_to_csr_weighted(g)
    srcs = [0, 3, 7]
    got = {r.id: r.bc for r in betweenness_weighted(g, sources=srcs).collect()}
    exp = brandes_weighted_kernel(
        indptr, indices, weights, np.asarray(srcs), len(ids)
    )
    for i, vid in enumerate(ids):
        assert got[int(vid)] == pytest.approx(exp[i], abs=1e-9)
    with pytest.raises(ValueError, match="unknown source"):
        betweenness_weighted(g, sources=[99999]).collect()


def test_closeness_weighted_vs_networkx(spark):
    from centrality_gpu_spark.operators.closeness import closeness_weighted

    g, nxg = _weighted_random_graph(spark, seed=13)
    got = {r.id: r.closeness for r in closeness_weighted(g).collect()}
    exp = nx.closeness_centrality(nxg, distance="weight", wf_improved=True)
    for v in nxg.nodes:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v


def test_closeness_weighted_disconnected(spark):
    from centrality_gpu_spark.operators.closeness import closeness_weighted

    edges = [(0, 1, 1.0), (1, 2, 1.5), (10, 11, 2.0)]
    g = Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long, weight double"),
        weight_col="weight",
    )
    got = {r.id: r.closeness for r in closeness_weighted(g).collect()}
    nxg = nx.Graph()
    nxg.add_weighted_edges_from(edges)
    exp = nx.closeness_centrality(nxg, distance="weight", wf_improved=True)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def test_dijkstra_forward_sigma(spark):
    """σ from the Dijkstra kernel == number of shortest weighted paths."""
    from centrality_gpu_spark.operators.csrkernels import (
        dijkstra_forward,
        graph_to_csr_weighted,
    )

    g, nxg = _weighted_random_graph(spark, seed=14)
    ids, indptr, indices, weights = graph_to_csr_weighted(g)
    s = 5
    dist, sigma = dijkstra_forward(indptr, indices, weights, s, len(ids))
    exp_dist = nx.single_source_dijkstra_path_length(nxg, s, weight="weight")
    for i, vid in enumerate(ids):
        if int(vid) in exp_dist:
            assert dist[i] == pytest.approx(exp_dist[int(vid)], abs=1e-12)
        else:
            assert np.isinf(dist[i])
    # path counts vs brute enumeration on the nx side
    allsp = {t: len(list(nx.all_shortest_paths(nxg, s, t, weight="weight")))
             for t in exp_dist}
    for i, vid in enumerate(ids):
        if int(vid) in allsp:
            assert sigma[i] == pytest.approx(allsp[int(vid)]), vid


# ------------------------------- round 2: edge betweenness + weighted harmonic


def test_edge_betweenness_vs_networkx(spark, sample_name):
    from centrality_gpu_spark.operators.betweenness import edge_betweenness

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    got = {(r.src, r.dst): r.ebc for r in edge_betweenness(g).collect()}
    exp = nx.edge_betweenness_centrality(nxg, normalized=False)
    assert set(got) == {(min(u, v), max(u, v)) for u, v in nxg.edges()}
    for (u, v), e in exp.items():
        assert got[(min(u, v), max(u, v))] == pytest.approx(2 * e, abs=1e-6), (u, v)


def test_edge_betweenness_random_graph(spark):
    from centrality_gpu_spark.operators.betweenness import edge_betweenness

    nxg = nx.gnm_random_graph(35, 80, seed=21)
    nxg.remove_nodes_from([v for v, d in dict(nxg.degree()).items() if d == 0])
    df = spark.createDataFrame(list(nxg.edges()), "src long, dst long")
    g = Graph.from_undirected_edges(df)
    got = {(r.src, r.dst): r.ebc for r in edge_betweenness(g).collect()}
    exp = nx.edge_betweenness_centrality(nxg, normalized=False)
    for (u, v), e in exp.items():
        assert got[(min(u, v), max(u, v))] == pytest.approx(2 * e, abs=1e-6)


def test_edge_betweenness_sums_to_vertex_farness(spark):
    """Σ_e ebc(e) = Σ_{s≠t reachable} d(s,t) (each ordered pair s→t
    contributes total weight 1 to each of the d(s,t) levels it spans)."""
    from centrality_gpu_spark.operators.betweenness import edge_betweenness

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test4.txt")
    nxg = sample_nx("test4")
    total = edge_betweenness(g).agg({"ebc": "sum"}).collect()[0][0]
    exp = sum(
        d for lengths in dict(nx.all_pairs_shortest_path_length(nxg)).values()
        for d in lengths.values()
    )
    assert total == pytest.approx(exp, abs=1e-6)


def test_harmonic_weighted_vs_networkx(spark):
    from centrality_gpu_spark.operators.closeness import harmonic_weighted

    g, nxg = _weighted_random_graph(spark, seed=17)
    got = {r.id: r.harmonic for r in harmonic_weighted(g).collect()}
    exp = nx.harmonic_centrality(nxg, distance="weight")
    for v in nxg.nodes:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v


# ----------------------------------- round 2: bit-parallel MS-BFS kernel


def test_msbfs_equals_bfs_forward(spark, sample_name):
    """MS-BFS per-lane stats == per-source bfs_forward aggregates."""
    from centrality_gpu_spark.operators.csrkernels import (
        bfs_forward,
        msbfs_distance_stats,
    )

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    ids, indptr, indices = graph_to_csr(g)
    n = len(ids)
    srcs = np.arange(min(n, 64))
    far, reach, harm, ecc = msbfs_distance_stats(indptr, indices, srcs, n)
    for i, s in enumerate(srcs):
        dist, _sigma, _levels = bfs_forward(indptr, indices, int(s), n)
        fin = dist > 0
        assert far[i] == dist[fin].sum()
        assert reach[i] == (dist >= 0).sum()
        assert harm[i] == pytest.approx((1.0 / dist[fin]).sum(), abs=1e-12)
        assert ecc[i] == dist.max()


def test_msbfs_more_than_64_sources_chunking(spark):
    """A 100-vertex chain exercises the >64-source chunk loop in the
    closeness/harmonic/eccentricity broadcast operators, deep levels,
    and the push/pull switch."""
    from centrality_gpu_spark.operators.closeness import closeness_broadcast
    from centrality_gpu_spark.operators.eccentricity import eccentricity_broadcast

    edges = [(i, i + 1) for i in range(100)]
    g = Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )
    nxg = nx.Graph(edges)
    got = {r.id: r.closeness for r in closeness_broadcast(g).collect()}
    exp = nx.closeness_centrality(nxg)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)
    got_e = {r.id: r.ecc for r in eccentricity_broadcast(g).collect()}
    exp_e = nx.eccentricity(nxg)
    assert got_e == exp_e


def test_multicomponent_kernels_match_single_component_semantics(spark):
    """The round-5 multi-component scale fix (component-restricted
    bottom-up + component-grouped MS-BFS) must be bit-identical to the
    ungrouped kernels on a graph of several disjoint pieces — the
    10x-disjoint-replica shape that made the ungrouped paths pay
    O(E_total) per level/pass."""
    from centrality_gpu_spark.operators.csrkernels import (
        bfs_forward,
        csr_components,
        msbfs_distance_stats_grouped,
        msbfs_distance_stats,
    )

    # 3 disjoint pieces: a clique (fat frontier -> bottom-up fires),
    # a chain (deep), an isolated edge
    edges = (
        [(a, b) for a in range(8) for b in range(a + 1, 8)]
        + [(10 + i, 11 + i) for i in range(20)]
        + [(50, 51)]
    )
    g = Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )
    ids, indptr, indices = graph_to_csr(g)
    n = len(ids)
    comp = csr_components(indptr, indices, n)
    # labels: min-id per component, exactly 3 of them
    assert len(np.unique(comp)) == 3
    for s in range(n):
        d0, s0, l0 = bfs_forward(indptr, indices, s, n)
        d1, s1, l1 = bfs_forward(indptr, indices, s, n, comp=comp)
        assert np.array_equal(d0, d1) and np.array_equal(s0, s1)
        assert len(l0) == len(l1)
        for a, b in zip(l0, l1):
            assert np.array_equal(a, b)
    srcs = np.arange(n)
    f0, r0, h0, e0 = msbfs_distance_stats(indptr, indices, srcs, n)[:4]
    f1, r1, h1, e1 = msbfs_distance_stats_grouped(
        indptr, indices, srcs, n, comp
    )
    assert np.array_equal(f0, f1) and np.array_equal(r0, r1)
    assert np.array_equal(h0, h1) and np.array_equal(e0, e1)
    # bottom-up actually fired somewhere with comp (clique mid-level)
    dirs = []
    bfs_forward(indptr, indices, 0, n, comp=comp, directions=dirs)
    assert "bu" in dirs


# --------------------------- round 2: landmark-sampled closeness


def test_closeness_sampled_full_sample_is_exact(spark, sample_name):
    """s = n degenerates to exact closeness on connected graphs."""
    from centrality_gpu_spark.operators.closeness import closeness_sampled

    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    nxg = sample_nx(sample_name)
    n = g.num_vertices()
    got = {r.id: r.closeness for r in closeness_sampled(g, n_samples=n).collect()}
    exp = nx.closeness_centrality(nxg)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v


def test_closeness_sampled_estimator_quality(spark):
    """On a 200-vertex random graph, 64 landmarks rank-correlate with
    exact closeness (spearman-ish: top-decile overlap)."""
    from centrality_gpu_spark.operators.closeness import closeness_sampled

    nxg = nx.gnm_random_graph(200, 800, seed=3)
    df = spark.createDataFrame(list(nxg.edges()), "src long, dst long")
    g = Graph.from_undirected_edges(df)
    got = {r.id: r.closeness for r in closeness_sampled(g, n_samples=64).collect()}
    exp = nx.closeness_centrality(nxg)
    top_got = sorted(got, key=got.get, reverse=True)[:20]
    top_exp = sorted(exp, key=exp.get, reverse=True)[:20]
    assert len(set(top_got) & set(top_exp)) >= 12
    # unbiasedness sanity: mean estimate within 10% of mean exact
    import statistics

    assert statistics.mean(got.values()) == pytest.approx(
        statistics.mean(exp.values()), rel=0.1
    )
