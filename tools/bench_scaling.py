"""Scaling-efficiency harness: run tools/scaling_job.py at two (or
more) core counts SEQUENTIALLY on the same input and write BENCH.md.

The north rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency from N to 4N executors) cannot use a real cluster in this
sandbox; per the driver's instruction it is evidenced by the identical
job at two parallelism levels. Efficiency from N to kN cores:

    eff = (T_N / T_kN) / k        (1.0 = perfect strong scaling)

Run with nothing else on the machine — the jobs are measured
sequentially in subprocesses so JVMs don't overlap.

Usage: python tools/bench_scaling.py [N kN ...]   (default: 2 8 32)
"""

from __future__ import annotations

import json
import os
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


def main() -> None:
    core_counts = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    points = {c: run_point(c) for c in core_counts}

    jobs = sorted({j for p in points.values() for j in p["jobs"]})
    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "Same jobs, same input, `local[N]` with `spark.sql.shuffle.partitions=N`,",
        "run sequentially on an otherwise idle machine (the sandbox stand-in for",
        "N vs 4N executors; no real cluster available). Efficiency from N to kN",
        "cores = (T_N / T_kN) / k; 1.0 is perfect strong scaling.",
        "",
        "Machine note: this is ONE box — beyond ~8 concurrent numpy gather",
        "tasks the shared memory bandwidth saturates, which a real cluster",
        "(per-node bandwidth) does not suffer. The 2→8-core pair is therefore",
        "the cleanest N→4N analog; 32-core numbers are reported for",
        "completeness.",
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
        "## Raw datapoints",
        "",
        "```json",
        *[json.dumps(p) for p in points.values()],
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
