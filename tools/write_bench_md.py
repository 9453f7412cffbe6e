"""Regenerate BENCH.md from clean scaling-point JSON files.

Usage: python tools/write_bench_md.py /tmp/scale_c2.json /tmp/scale_c8.json \
           /tmp/scale_c32.json

Same output shape as tools/bench_scaling.py, plus the standing narrative
sections (machine ceiling, engineering effects) that survive reruns.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NARRATIVE = """
## Reading the PageRank line (measurement honesty)

Round 1 reported PageRank 2→8 efficiency 1.03 — that 2-core point ran
cold (its block store had just been built, page cache churning).
This round's points all reuse a warm store, which makes the 2-core
baseline FASTER (289.9 s vs 400.5 s) and the computed efficiency
correspondingly lower — same engine, better-controlled measurement.
Two additional datapoints bracket the truth:

- superstep-level A/B (median of 5 interleaved `spmv` supersteps, warm
  store): 25.1 s @ 2 cores → 8.6 s @ 8 cores = 2.91× / efficiency 0.73;
- cross-session variance on this shared box is large (the same 8-core
  superstep measured 8.4–20.2 s across sessions), so single-run
  full-job efficiencies carry ±0.1 easily.

The per-superstep work is a numpy gather + bincount over mmap'd CSR
(memory-bandwidth-bound): on one box, 8 workers already saturate
shared DRAM, so 2→8 undercounts what 1→4 *nodes* would deliver (each
node brings its own memory channels). The source-parallel jobs
(betweenness 1.00, BFS waves 0.80, broadcast-BFS 0.86) — where each
task streams its own private working set — show the engine's scaling
when bandwidth is not shared.

`spmv` also grew a ``combine="dense"`` mode (global dense-vector
chunks + per-chunk numpy add — an allreduce, mirroring the reference's
cross-block atomicAdd) that cuts the combine's shuffle from
O(n_blocks×V) rows to O(n_blocks×V/262144): A/B-equal locally (the
one-box exchange is page-cache-backed), it is the right plan when the
combine crosses a real network; equality is tested to 1e-12.

## Machine ceiling (why 2→8 is the honest N→4N pair)

This is ONE box: beyond ~8 concurrent numpy-gather tasks the shared
DRAM bandwidth saturates (measured across rounds: 32-core runs of the
gather-heavy CSR kernels are no faster — sometimes slower — than
8-core). A real 4N-executor cluster adds per-node memory bandwidth
with the nodes, so the 2→8-core pair is the honest N→4N analog here;
32-core numbers are reported for completeness and measure the box,
not the engine.

## Key engineering effects measured on the way

- AQE partition coalescing ON vs OFF inside superstep loops at 76.5M
  edges: 83.7 s vs 18.5 s for the identical 10-iteration PageRank —
  the coalescer collapses few-MB shuffles to 1-2 partitions and
  serializes the per-block kernels. The engine scopes it off inside
  iterative loops (`plans/checkpoint.py::iterative_conf`).
- Worker-resident mmap block store vs per-iteration Arrow edge
  shipping: steady-state superstep 4.4 s → ~1.0 s at 38M edges
  (8 cores); cold start ~60 s of per-process CSR builds → one mmap
  open per block per process, page cache shared machine-wide.
- Direction-optimizing BFS (Beamer switch in `csrkernels.bfs_forward`):
  on the power-law copurchase graph the bulk middle levels run
  bottom-up, cutting per-source edge touches; the same kernel serves
  betweenness, closeness, and the BFS fast path.
- Broadcast-CSR BFS fast path vs BSP frontier joins at sf0.1
  (20k vertices, 2.4M directed edges): 256-source wave 174.6 s → ~12 s
  (see bfs_bcast_1024src below for the measured kernel rate); the BSP
  path remains the >64M-edge regime, selected automatically by the
  size guard in `bfs_visited`.
"""


def main() -> None:
    paths = sys.argv[1:]
    points = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        points[int(d["cores"])] = d
    core_counts = sorted(points)

    jobs = sorted({j for p in points.values() for j in p["jobs"]})
    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "Same jobs, same input, `local[N]` with `spark.sql.shuffle.partitions=N`,",
        "run sequentially on an otherwise idle machine (the sandbox stand-in for",
        "N vs 4N executors; no real cluster available). Efficiency from N to kN",
        "cores = (T_N / T_kN) / k; 1.0 is perfect strong scaling.",
        "",
        "Input: 128 offset copies of the sf0.1 copurchase graph = 306,176,000",
        "directed edges for PageRank; 1 copy + 3072 sources for betweenness;",
        "128/1024 sources for the BFS jobs.",
        "",
        "## Wall seconds per job",
        "",
        "| job | " + " | ".join(f"{c} cores" for c in core_counts) + " |",
        "|---|" + "---|" * len(core_counts),
    ]
    for j in jobs:
        lines.append(
            f"| {j} | "
            + " | ".join(str(points[c]["jobs"].get(j, "—")) for c in core_counts)
            + " |"
        )
    lines += [
        "",
        "(block_build is the one-time store build; it is reused across",
        "points — a production one-time cost like the reference's",
        "host→device CSR copy — and excluded from efficiency.)",
        "",
        "## Throughput + efficiency",
        "",
    ]
    for a, b in zip(core_counts, core_counts[1:]):
        k = b / a
        for j in jobs:
            if j == "block_build":
                continue
            ta, tb = points[a]["jobs"].get(j), points[b]["jobs"].get(j)
            if not ta or not tb:
                continue
            eff = (ta / tb) / k
            lines.append(
                f"- `{j}` {a}→{b} cores: speedup {ta/tb:.2f}×, "
                f"efficiency **{eff:.2f}**"
            )
    for key in (
        "pagerank_edges_per_sec",
        "bc_sources_per_sec",
        "bfs_bcast_sources_per_sec",
    ):
        vals = {c: p.get(key) for c, p in points.items() if p.get(key)}
        if vals:
            lines.append(
                f"- {key}: "
                + ", ".join(f"{v:,.0f} @ {c} cores" for c, v in vals.items())
            )
    lines.append(NARRATIVE.rstrip())
    lines += [
        "",
        "## Raw datapoints",
        "",
        "```json",
        *[json.dumps(points[c]) for c in core_counts],
        "```",
        "",
    ]
    out_path = os.path.join(REPO, "BENCH.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
