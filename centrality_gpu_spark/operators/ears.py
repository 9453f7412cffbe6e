"""Ear decomposition + interior postprocess (G7-G11, G17-G18) —
the reference's deepest optimization, re-expressed numpy/Spark-first.

What the reference's ~1,200 LoC of NTE/LCA/master machinery *computes*
(``bcc_bfs.cpp:611-1311``): the maximal runs of degree-2 vertices in
each biconnected component, each with its two boundary vertices
``(lnode, rnode)`` and per-interior distances ``(ld, rd)`` along the
run (``ear_graph.h:3-32``, ``preSum`` at ``bcc_bfs.cpp:100-236``). The
spanning-tree + non-tree-edge + LCA + master-assignment walk is the
reference's *parallel discovery method* for that set; here discovery is
a direct chain walk over the CSR (this engine's per-BCC work is already
task-local numpy, so the GPU-oriented indirection buys nothing).

The payoff (``postprocesses.cu``): ear interiors never run as BFS
sources. An interior ``z`` derives its whole shortest-path row from its
endpoints' memoized rows:

- min-combine (``bc_postprocess1``, ``postprocesses.cu:329-351``):
  ``d_z[k] = min(dL[k]+ld, dR[k]+rd)``; σ from the winning side, sum on
  tie. Correct for every off-chain target because interiors have degree
  2 — any z→k path exits via lnode or rnode, and a side whose σ would
  include through-chain (hence through-z) paths provably loses the min.
- own-chain fixup (``check_neighbours``, ``postprocesses.cu:205-274``):
  targets on z's own run take the direct chain distance when shorter
  (σ=1), add one path on tie.
- dependency accumulation (``bc_postprocess2``,
  ``postprocesses.cu:366-470``): vertices sorted by derived distance
  (the cub radix sort ≅ argsort), then the standard successor-form
  reverse sweep with reach weights; ``bc += δ·(reach[z]+1)``.

Sources therefore split exactly as the reference's
free/active/interior partition (P6, ``to_eargraph_construct.cpp:
113-125``): free and active vertices run plain Brandes (active rows
are memoized for reuse — G16, ``kernels_active.cu:544-552``); interior
rows are derived. The contracted ear graph (G11,
``make_ear_graph.cpp:119-218``) orders ear processing from its
min-degree vertex (O6, ``:198-201``) so consecutive ears share
endpoints — the memory-locality role its BFS level batching plays on
the GPU, here realized as an LRU row cache.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from centrality_gpu_spark.operators.csrkernels import bfs_forward


@dataclass
class Ear:
    """One maximal degree-2 run: interiors ``nodes`` in order from
    ``lnode`` to ``rnode``; ``ld[i]``/``rd[i]`` = distance along the
    run to each boundary (``ld[i]+rd[i]`` = run length, the reference's
    ``td``)."""

    lnode: int
    rnode: int
    nodes: np.ndarray
    ld: np.ndarray
    rd: np.ndarray


def find_ears(indptr: np.ndarray, indices: np.ndarray, n: int) -> list[Ear]:
    """All maximal degree-2 runs (G9 output contract). Boundary = the
    first non-degree-2 vertex in each direction (degree ≥3, or degree 1
    for dangling paths). Vertices on pure cycles (every vertex degree
    2, walk returns to start) are left un-eared — the caller runs them
    as plain Brandes sources.
    """
    deg = np.diff(indptr)
    is2 = deg == 2
    ears: list[Ear] = []
    seen = np.zeros(n, dtype=bool)
    for v in np.nonzero(is2)[0]:
        if seen[v]:
            continue
        # walk from v in both directions to the run boundaries
        chain = [int(v)]
        seen[v] = True
        bounds = []
        cyclic = False
        for direction in (0, 1):
            prev = int(v)
            cur = int(indices[indptr[v] + direction])
            while is2[cur]:
                if cur == v:  # came all the way around: pure cycle
                    cyclic = True
                    break
                seen[cur] = True
                if direction == 0:
                    chain.insert(0, cur)
                else:
                    chain.append(cur)
                nb0 = int(indices[indptr[cur]])
                nb1 = int(indices[indptr[cur] + 1])
                cur, prev = (nb1 if nb0 == prev else nb0), cur
            if cyclic:
                break
            bounds.append(cur)
        if cyclic:
            continue
        lnode, rnode = bounds[0], bounds[1]
        nodes = np.array(chain, dtype=np.int64)
        ld = np.arange(1, len(chain) + 1, dtype=np.int64)
        rd = np.arange(len(chain), 0, -1, dtype=np.int64)
        ears.append(Ear(lnode, rnode, nodes, ld, rd))
    return ears


def ear_graph_order(ears: list[Ear]) -> list[int]:
    """Processing order of ears for endpoint-row cache locality: build
    the contracted ear graph (each ear → one lnode-rnode edge, G11),
    BFS it from its min-degree vertex (O6) per component, and emit ears
    in the order their endpoints are first reached — the scheduling
    role of the reference's ear-graph level order (G12/G10), minus the
    GPU memory chunking this engine doesn't need."""
    if not ears:
        return []
    adj: dict[int, list[tuple[int, int]]] = {}
    for i, e in enumerate(ears):
        adj.setdefault(e.lnode, []).append((e.rnode, i))
        adj.setdefault(e.rnode, []).append((e.lnode, i))
    order: list[int] = []
    emitted = [False] * len(ears)
    visited: set[int] = set()
    # min-degree start per component (make_ear_graph.cpp:198-201)
    for start in sorted(adj, key=lambda v: (len(adj[v]), v)):
        if start in visited:
            continue
        queue = [start]
        visited.add(start)
        while queue:
            u = queue.pop(0)
            for w, ei in adj[u]:
                if not emitted[ei]:
                    emitted[ei] = True
                    order.append(ei)
                if w not in visited:
                    visited.add(w)
                    queue.append(w)
    return order


def dependency_accumulation(
    indptr: np.ndarray,
    indices: np.ndarray,
    dist: np.ndarray,
    sigma: np.ndarray,
    reach: np.ndarray,
) -> np.ndarray:
    """Successor-form reverse sweep (G15/G18) from given (dist, sigma)
    rows: δ[w] += σw/σv·(reach[v]+1+δ[v]) per level, deepest first.
    Unreached vertices (dist<0 or non-finite sentinel) are skipped —
    the derived-row analog of the cub radix-sort level schedule
    (``postprocesses.cu:143-155``)."""
    from centrality_gpu_spark.operators.csrkernels import _flat_neighbors

    delta = np.zeros(len(sigma))
    reached = dist >= 0
    if not reached.any():
        return delta
    maxd = int(dist[reached].max())
    # bucket vertices by distance (argsort ≅ radix sort)
    levels: list[np.ndarray] = []
    order = np.argsort(dist[reached], kind="stable")
    rv = np.nonzero(reached)[0][order]
    rd = dist[rv]
    cuts = np.searchsorted(rd, np.arange(maxd + 2))
    for lvl in range(maxd + 1):
        levels.append(rv[cuts[lvl] : cuts[lvl + 1]].astype(indices.dtype))
    for lvl in range(maxd, 0, -1):
        vrep, nbr = _flat_neighbors(indptr, indices, levels[lvl - 1])
        m = dist[nbr] == lvl
        v, w = vrep[m], nbr[m]
        np.add.at(delta, v, sigma[v] / sigma[w] * (reach[w] + 1.0 + delta[w]))
    return delta


def brandes_ear_kernel(
    indptr: np.ndarray,
    indices: np.ndarray,
    n: int,
    reach: np.ndarray | None = None,
    row_cache_size: int = 64,
) -> np.ndarray:
    """All-sources BC with ear compression: free+active sources run
    plain Brandes; interior sources derive their rows (G17) and run
    only the reverse sweep (G18). Equals ``brandes_kernel`` output
    exactly (tested to 1e-9); the saving is one full BFS per interior
    vertex — the dominant cost on mesh/road-like graphs whose vertices
    are mostly degree-2 chain members.
    """
    import collections

    from centrality_gpu_spark.operators.betweenness import brandes_kernel

    if reach is None:
        reach = np.zeros(n)
    ears = find_ears(indptr, indices, n)
    interior = np.zeros(n, dtype=bool)
    for e in ears:
        interior[e.nodes] = True
    bc = np.zeros(n)

    # free + active (ear-endpoint) sources: plain Brandes (G13+G15)
    non_interior = np.nonzero(~interior)[0]
    if len(non_interior):
        bc += brandes_kernel(indptr, indices, non_interior, n, reach)
    if not ears:
        return bc

    # memoized endpoint rows (G16) with ear-graph-ordered processing
    cache: collections.OrderedDict[int, tuple[np.ndarray, np.ndarray]] = (
        collections.OrderedDict()
    )

    def rows(vtx: int):
        hit = cache.get(vtx)
        if hit is not None:
            cache.move_to_end(vtx)
            return hit
        dist, sigma, _levels = bfs_forward(indptr, indices, vtx, n)
        cache[vtx] = (dist, sigma)
        if len(cache) > row_cache_size:
            cache.popitem(last=False)
        return dist, sigma

    big = np.int64(1) << 40  # +inf stand-in for unreached (-1) rows
    for ei in ear_graph_order(ears):
        e = ears[ei]
        dL, sL = rows(e.lnode)
        dR, sR = rows(e.rnode)
        dLs = np.where(dL >= 0, dL, big)
        dRs = np.where(dR >= 0, dR, big)
        for i in range(len(e.nodes)):
            z = int(e.nodes[i])
            ld, rd = int(e.ld[i]), int(e.rd[i])
            left_d = dLs + ld
            right_d = dRs + rd
            d = np.minimum(left_d, right_d)
            sig = np.where(left_d < right_d, sL, 0.0)
            sig = sig + np.where(right_d < left_d, sR, 0.0)
            sig = sig + np.where(left_d == right_d, sL + sR, 0.0)
            # own-chain fixup (check_neighbours): direct run distance
            ch = e.nodes
            dch = np.abs(e.ld - e.ld[i])
            better = dch < d[ch]
            equal = dch == d[ch]
            d[ch] = np.where(better, dch, d[ch])
            sig[ch] = np.where(better, 1.0, sig[ch] + equal)
            d[z] = 0
            sig[z] = 1.0
            dist = np.where(d >= big, -1, d)
            delta = dependency_accumulation(indptr, indices, dist, sig, reach)
            delta[z] = 0.0
            bc += delta * (reach[z] + 1.0)
    return bc
