"""Shared numpy CSR kernels for the broadcast regime.

The reference keeps the CSR resident on the GPU and runs one BFS per
thread-block (``kernels_free.cu:43-79,154-473``); here the CSR arrays
are broadcast once per job and each Spark task runs vectorized numpy
over a batch of sources. Everything in this module is driver/worker
numpy — no Spark imports — so both the betweenness and closeness
operators (and the BFS fast path) share one forward kernel.

Direction-optimizing BFS (G6/G14): each level picks top-down
(frontier → neighbors) or bottom-up (undiscovered → neighbors) by
comparing the edges each side would touch, the Beamer α-heuristic the
reference hardcodes as α=15/β=25 (``bcc_bfs.cpp:322-323,542-567``) and
gates by its sampled-diameter test (``kernels_free.cu:447-470``). On
power-law graphs the middle BFS levels hold most of the graph, so the
bottom-up steps touch Σdeg(undiscovered) ≪ Σdeg(frontier) edges.
"""

from __future__ import annotations

import numpy as np

# Above this many *directed* edge rows the CSR no longer belongs on the
# driver/in a task: callers must fall back to the BSP superstep path.
# 64M rows ≈ 1 GiB of int64 CSR — comfortable for this sandbox's 48 GiB
# driver; tune per deployment.
DEFAULT_BROADCAST_MAX_EDGES = 64_000_000

# Beamer direction switch: bottom-up when the frontier's edge count
# exceeds (undiscovered edges)/alpha (reference α=15, bcc_bfs.cpp:322)
BEAMER_ALPHA = 15.0


def _flat_neighbors(indptr: np.ndarray, indices: np.ndarray, verts: np.ndarray):
    """Vectorized CSR slice gather: all neighbors of ``verts``.

    Returns (vrep, nbr): per-edge source vertex (repeated) and target.
    """
    starts = indptr[verts]
    counts = indptr[verts + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=indices.dtype), np.empty(0, dtype=indices.dtype)
    # flat positions: for each vert, the range [start, start+count)
    offs = np.repeat(starts - np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    flat = np.arange(total, dtype=np.int64) + offs
    return np.repeat(verts, counts), indices[flat]


def graph_to_csr(graph, max_edges: int | None = DEFAULT_BROADCAST_MAX_EDGES):
    """Collect the (symmetric) edge table into dense-relabel CSR arrays.

    Returns (ids, indptr, indices): ids[i] = original vertex id of dense
    id i. Only valid in the broadcast regime; raises when the edge table
    exceeds ``max_edges`` directed rows instead of silently OOMing the
    driver — callers with an auto strategy route to their BSP twin
    before hitting this guard.
    """
    if max_edges is not None:
        directed = graph.num_edges() * 2
        if directed > max_edges:
            raise ValueError(
                f"graph has {directed} directed edges > broadcast limit "
                f"{max_edges}; use the BSP strategy (betweenness_bsp / "
                "closeness_bsp / multi_source_bfs) or raise max_edges"
            )
    pdf = graph.edges.select("src", "dst").toPandas()
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    t = np.searchsorted(ids, dst)
    n = len(ids)
    order = np.lexsort((t, s))  # counting-sort CSR build (O2 analog)
    s, t = s[order], t[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    indptr = np.cumsum(indptr)
    return ids, indptr, t.astype(np.int64)


def csr_components(indptr: np.ndarray, indices: np.ndarray, n: int):
    """Connected-component labels of a symmetric CSR: labels[v] = the
    smallest vertex id in v's component. One O(V+E) BFS sweep (the
    python loop touches each vertex once as a root *candidate* — no
    per-component rescans, so star forests with thousands of
    components stay linear)."""
    labels = np.full(n, -1, dtype=np.int64)
    for s in range(n):
        if labels[s] != -1:
            continue
        labels[s] = s
        frontier = np.array([s], dtype=np.int64)
        while frontier.size:
            _, nbr = _flat_neighbors(indptr, indices, frontier)
            nbr = np.unique(nbr)
            nbr = nbr[labels[nbr] == -1]
            labels[nbr] = s
            frontier = nbr
    return labels


def bfs_forward(
    indptr: np.ndarray,
    indices: np.ndarray,
    s: int,
    n: int,
    alpha: float = BEAMER_ALPHA,
    directions: list | None = None,
    comp: np.ndarray | None = None,
):
    """Direction-optimizing single-source BFS with σ path counting.

    Returns (dist, sigma, levels): dist[v] = hop distance (-1 if
    unreached), sigma[v] = number of shortest s→v paths (float64 — the
    reference's ull σ only ever enters results as the float ratio σw/σv,
    ``kernels_free.cu:391``), levels[d] = vertices at distance d.

    Top-down step cost ∝ Σdeg(frontier); bottom-up ∝ Σdeg(undisc);
    pick bottom-up when deg(frontier)·α > deg(undisc) (Beamer; the
    reference's α=15 switch at ``bcc_bfs.cpp:542-567``). This per-level
    cost rule *subsumes* the reference's sampled-diameter gate (G14,
    ``kernels_free.cu:447-470``): on a high-diameter chain the frontier
    never accumulates enough edges to trigger bottom-up, while on a
    small-diameter power-law graph the bulk middle levels do — the same
    decision the diameter median proxies, made per level instead of per
    graph. ``directions`` (optional list) records 'td'/'bu' per level
    for tests/metrics.

    ``comp`` (optional per-vertex component labels, ``csr_components``)
    restricts the bottom-up candidate set — and the α cost model's
    undiscovered-edge budget — to the SOURCE'S component. Without it, a
    multi-component graph (disjoint shards, star forests, 10× replica
    scale-ups) makes bottom-up scan every *unreachable* vertex's full
    degree at every fat level: vertices that can never find a parent
    have no early-exit, so the α calibration collapses and a per-source
    BFS pays O(E_total) per level instead of O(E_component). Measured
    on 10 disjoint sf0.1 copurchase copies: betweenness-64src 88.5 s →
    component-restricted ≈ its 1× traversal cost + the shared CSR
    build. Results are bit-identical either way (a bottom-up parent is
    always in the source's component).
    """
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n)
    dist[s] = 0
    sigma[s] = 1.0
    levels = [np.array([s], dtype=indices.dtype)]
    deg = np.diff(indptr)
    if comp is None:
        cmask = None
        deg_undisc = int(deg.sum()) - int(deg[s])
    else:
        cmask = comp == comp[s]
        deg_undisc = int(deg[cmask].sum()) - int(deg[s])
    d = 0
    while levels[-1].size:
        frontier = levels[-1]
        deg_frontier = int(deg[frontier].sum())
        use_bu = deg_frontier * alpha > deg_undisc
        if directions is not None:
            directions.append("bu" if use_bu else "td")
        if use_bu:
            # bottom-up: undiscovered vertices scan for level-d parents
            # (component-restricted when labels are supplied)
            und_mask = dist == -1 if cmask is None else (dist == -1) & cmask
            undisc = np.nonzero(und_mask)[0].astype(indices.dtype)
            vrep, nbr = _flat_neighbors(indptr, indices, undisc)
            m = dist[nbr] == d
            v = vrep[m]
            np.add.at(sigma, v, sigma[nbr[m]])
            nxt = np.unique(v)
        else:
            # top-down: frontier scans its neighbors (J1/A1/A2)
            vrep, nbr = _flat_neighbors(indptr, indices, frontier)
            undisc_nbr = nbr[dist[nbr] == -1]
            dist[undisc_nbr] = d + 1  # claim before σ so ties all count
            nxt_mask = dist[nbr] == d + 1
            np.add.at(sigma, nbr[nxt_mask], sigma[vrep[nxt_mask]])
            nxt = np.unique(undisc_nbr)
        dist[nxt] = d + 1
        deg_undisc -= int(deg[nxt].sum())
        levels.append(nxt)
        d += 1
    levels.pop()  # last level is empty
    return dist, sigma, levels


# ------------------------------------------------------------ weighted path

def _flat_neighbors_eidx(indptr: np.ndarray, indices: np.ndarray, verts: np.ndarray):
    """Like ``_flat_neighbors`` but also returns the flat CSR slot index
    of each emitted edge, so callers can gather a parallel weights
    array."""
    starts = indptr[verts]
    counts = indptr[verts + 1] - starts
    total = int(counts.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    offs = np.repeat(starts - np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    flat = np.arange(total, dtype=np.int64) + offs
    return np.repeat(verts, counts), indices[flat], flat


def graph_to_csr_weighted(graph, max_edges: int | None = DEFAULT_BROADCAST_MAX_EDGES):
    """``graph_to_csr`` plus the per-slot edge weights (float64), kept
    parallel to ``indices`` by the same counting sort — the ``weights``
    array of the reference CSR (`graph_ear_decompos.h:36-101`)."""
    if max_edges is not None:
        directed = graph.num_edges() * 2
        if directed > max_edges:
            raise ValueError(
                f"graph has {directed} directed edges > broadcast limit "
                f"{max_edges}; weighted centralities currently require "
                "the broadcast regime (raise max_edges deliberately, or "
                "sample sources via betweenness_sampled semantics)"
            )
    pdf = graph.edges.select("src", "dst", "weight").toPandas()
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    wt = pdf["weight"].to_numpy().astype(np.float64)
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    t = np.searchsorted(ids, dst)
    n = len(ids)
    order = np.lexsort((t, s))
    s, t, wt = s[order], t[order], wt[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    indptr = np.cumsum(indptr)
    return ids, indptr, t.astype(np.int64), wt


def dijkstra_forward(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    s: int,
    n: int,
):
    """Single-source Dijkstra with shortest-path counting (σ merged on
    exact float distance equality — callers keep weights in exact
    binary fractions when cross-engine determinism matters).

    Returns (dist float64 with inf for unreachable, sigma float64).
    The ☠ Dijkstra intent of the reference (`dijkstra_apsp.cpp`),
    extended with the σ accumulation Brandes needs.
    """
    import heapq

    dist = np.full(n, np.inf)
    sigma = np.zeros(n)
    done = np.zeros(n, dtype=bool)
    dist[s] = 0.0
    sigma[s] = 1.0
    heap = [(0.0, s)]
    while heap:
        d, v = heapq.heappop(heap)
        if done[v] or d > dist[v]:
            continue
        done[v] = True
        for e in range(indptr[v], indptr[v + 1]):
            w = int(indices[e])
            nd = d + weights[e]
            if nd < dist[w]:
                dist[w] = nd
                sigma[w] = sigma[v]
                heapq.heappush(heap, (nd, w))
            elif nd == dist[w] and not done[w]:
                sigma[w] += sigma[v]
    return dist, sigma


# ------------------------------------------------------ bit-parallel MS-BFS

def msbfs_distance_stats(
    indptr: np.ndarray,
    indices: np.ndarray,
    sources: np.ndarray,
    n: int,
):
    """Bit-parallel multi-source BFS over up to 64 sources at once
    (MS-BFS, Then et al. VLDB'14): one uint64 lane per source, so a
    whole source batch shares each edge traversal instead of re-walking
    the CSR per source. Distance-only — σ cannot ride a bitmask — so
    this serves the distance-aggregating centralities (closeness,
    harmonic, eccentricity), which is exactly the reference's
    "closeness via the same BFS machinery" split with the per-source
    loop collapsed 64-fold.

    Per level the frontier propagates in one of two physical forms
    (the MS-BFS analog of the Beamer switch in ``bfs_forward``):

    - *pull*: every vertex OR-combines its neighbors' frontier words —
      a full-CSR gather + ``np.bitwise_or.reduceat`` segment reduce
      (contiguous, branch-free) — right when the frontier is wide;
    - *push*: only frontier vertices scatter their words with
      ``np.bitwise_or.at`` — right for the narrow first/last levels.

    Returns per-source float64 arrays (farness Σd, reachable incl.
    self, harmonic Σ1/d, eccentricity max d) of len(sources).
    """
    nb = len(sources)
    assert nb <= 64
    lane = np.uint64(1) << np.arange(nb, dtype=np.uint64)
    frontier = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(frontier, sources, lane)
    seen = frontier.copy()

    farness = np.zeros(nb)
    reachable = np.ones(nb)  # self
    harmonic = np.zeros(nb)
    ecc = np.zeros(nb)

    deg = np.diff(indptr)
    nzrow = deg > 0
    nz_starts = indptr[:-1][nzrow]
    total_e = int(indptr[-1])

    d = 0
    active = np.nonzero(frontier)[0]
    while active.size:
        d += 1
        # push costs ~4x per slot (scatter ufunc.at) vs the pull
        # gather+reduceat sweep of the whole CSR
        if 4 * int(deg[active].sum()) < total_e:
            nxt = np.zeros(n, dtype=np.uint64)
            vrep, nbr = _flat_neighbors(indptr, indices, active)
            np.bitwise_or.at(nxt, nbr, frontier[vrep])
        else:
            gathered = frontier[indices]
            nxt = np.zeros(n, dtype=np.uint64)
            nxt[nzrow] = np.bitwise_or.reduceat(gathered, nz_starts)
        new = nxt & ~seen
        active = np.nonzero(new)[0]
        if not active.size:
            break
        seen |= new
        lanes = np.unpackbits(
            new[active].view(np.uint8).reshape(-1, 8),
            axis=1,
            bitorder="little",
        ).sum(axis=0)[:nb].astype(np.float64)
        farness += d * lanes
        reachable += lanes
        harmonic += lanes / d
        ecc = np.where(lanes > 0, float(d), ecc)
        frontier = new
    return farness, reachable, harmonic, ecc


def _csr_subgraph(indptr: np.ndarray, indices: np.ndarray, verts: np.ndarray):
    """Renumbered sub-CSR induced on a COMPONENT's sorted vertex set
    (every neighbor of ``verts`` is itself in ``verts``, so the
    searchsorted renumbering is exact). O(V_c + E_c)."""
    counts = indptr[verts + 1] - indptr[verts]
    sub_indptr = np.zeros(len(verts) + 1, dtype=np.int64)
    np.cumsum(counts, out=sub_indptr[1:])
    _, nbr = _flat_neighbors(indptr, indices, verts)
    return sub_indptr, np.searchsorted(verts, nbr)


def msbfs_distance_stats_grouped(
    indptr: np.ndarray,
    indices: np.ndarray,
    sids: np.ndarray,
    n: int,
    comp: np.ndarray | None = None,
):
    """``msbfs_distance_stats`` over an arbitrary source set,
    COMPONENT-partitioned (labels from ``csr_components``): sources are
    grouped by component, each component's sub-CSR is extracted ONCE
    per call, and the 64-lane passes run on the component-local arrays
    — so a pull sweep costs O(E_component), not O(E_total). On a
    multi-component graph (disjoint shards, star forests, k× replica
    scale-ups) the ungrouped kernel pays the whole graph per pass for
    lanes that can only ever see their own component: measured on 10
    disjoint sf0.1 copurchase copies, all-source harmonic went 38.8×
    its 1× wall ungrouped vs the ≤12× linear bar. Distances are
    renumber-invariant, so results are bit-identical to the ungrouped
    kernel. ``comp=None`` (or a single component) falls through to the
    plain kernel with no extraction.

    Returns (farness, reachable, harmonic, ecc) aligned to ``sids``.
    """
    sids = np.asarray(sids, dtype=np.int64)
    k = len(sids)
    far = np.zeros(k)
    reach = np.zeros(k)
    harm = np.zeros(k)
    ecc = np.zeros(k)

    def run_plain(iptr, idx, local_sids, nn, out_pos):
        for c0 in range(0, len(local_sids), 64):
            sl = slice(c0, c0 + 64)
            f, r, h, e = msbfs_distance_stats(iptr, idx, local_sids[sl], nn)
            pos = out_pos[sl]
            far[pos], reach[pos], harm[pos], ecc[pos] = f, r, h, e

    if comp is None or len(np.unique(comp)) <= 1:
        run_plain(indptr, indices, sids, n, np.arange(k))
        return far, reach, harm, ecc
    csid = comp[sids]
    order = np.argsort(csid, kind="stable")
    bounds = np.nonzero(np.diff(csid[order]))[0] + 1
    for grp in np.split(order, bounds):
        if grp.size == 0:
            continue
        verts = np.nonzero(comp == csid[grp[0]])[0]
        sub_iptr, sub_idx = _csr_subgraph(indptr, indices, verts)
        run_plain(sub_iptr, sub_idx, np.searchsorted(verts, sids[grp]),
                  len(verts), grp)
    return far, reach, harm, ecc


def msbfs_target_sums(
    indptr: np.ndarray,
    indices: np.ndarray,
    sources: np.ndarray,
    n: int,
):
    """MS-BFS accumulated per *target*: for up to 64 sources at once,
    returns (tsum, tcnt) with tsum[v] = Σ_{s ∈ sources} d(s, v) over the
    sources that reach v and tcnt[v] = how many do (d(v, v) = 0 counts).
    The per-target view the landmark-closeness estimator needs — same
    lane propagation as ``msbfs_distance_stats``, popcounted per vertex
    instead of per lane."""
    nb = len(sources)
    assert nb <= 64
    lane = np.uint64(1) << np.arange(nb, dtype=np.uint64)
    frontier = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(frontier, sources, lane)
    seen = frontier.copy()

    tsum = np.zeros(n)
    tcnt = np.zeros(n)
    np.add.at(tcnt, sources, 1.0)  # self, d=0

    deg = np.diff(indptr)
    nzrow = deg > 0
    nz_starts = indptr[:-1][nzrow]
    total_e = int(indptr[-1])

    d = 0
    active = np.nonzero(frontier)[0]
    while active.size:
        d += 1
        if 4 * int(deg[active].sum()) < total_e:
            nxt = np.zeros(n, dtype=np.uint64)
            vrep, nbr = _flat_neighbors(indptr, indices, active)
            np.bitwise_or.at(nxt, nbr, frontier[vrep])
        else:
            gathered = frontier[indices]
            nxt = np.zeros(n, dtype=np.uint64)
            nxt[nzrow] = np.bitwise_or.reduceat(gathered, nz_starts)
        new = nxt & ~seen
        active = np.nonzero(new)[0]
        if not active.size:
            break
        seen |= new
        pc = np.unpackbits(
            new[active].view(np.uint8).reshape(-1, 8),
            axis=1,
            bitorder="little",
        ).sum(axis=1).astype(np.float64)
        tsum[active] += d * pc
        tcnt[active] += pc
        frontier = new
    return tsum, tcnt
