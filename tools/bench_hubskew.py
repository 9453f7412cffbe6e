"""Hub-skew stress datapoint (VERDICT r04 item #7): a synthetic
sf0.1-scale graph with a genuinely pathological hub (one vertex of
degree V/HUB_STRIDE — default V/10) driven through PageRank (CSR mode — the explicit-salting
path), triangle counting (degree orientation — the wedge-explosion
control), and BSP betweenness over 64 sources (the frontier-join skew
path). Per-task skew is read from Spark's own task summaries (the
/taskSummary REST quantiles with the UI enabled for this session):
pass bar = in every heavyweight stage, max task time <= 4x median.

The graph is deterministic (no RNG): V vertices in a pseudo-random
2-regular-ish base (i -> i*2654435761 mod V, i -> i*40503+7 mod V) plus
vertex 0 wired to every 10th vertex — degree exactly V/10. PageRank is
run twice, salting ON (default hub_threshold=10k < V/10) and salting
OFF (hub_threshold above the hub degree), so the salting effect is a
measured contrast, not an assertion. Results are appended to BENCH.md.

Run: python tools/bench_hubskew.py  (env: HUB_V, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from centrality_gpu_spark.session import get_spark  # noqa: E402

V = int(os.environ.get("HUB_V", "160000"))
# hub degree = V / HUB_STRIDE (10 -> the verdict's max-degree ~ V/10;
# 2 -> a harsher V/2 contrast where one block would hold ~4x the
# median block's edges unsalted)
STRIDE = int(os.environ.get("HUB_STRIDE", "10"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
UI = "http://localhost:4040/api/v1"


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=10) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _get("/applications")[0]["id"]


def _stage_ids(app: str) -> set[int]:
    return {s["stageId"] for s in _get(f"/applications/{app}/stages")}


def _skew_of_new_stages(app: str, before: set[int], min_med_ms: int = 25):
    """Task-time skew over the job's new stages.

    Returns {"worst": ..., "heaviest": ...}: the worst max/median
    executorRunTime ratio among SUBSTANTIVE stages (>= 8 tasks, median
    task >= min_med_ms — a 1 ms-median bookkeeping stage whose one real
    task takes 300 ms is scheduler noise, not data skew), and the
    heaviest stage (largest total executorRunTime) with its ratio —
    the stage a skewed key would actually stretch."""
    worst = None
    heaviest = None
    heaviest_total = -1
    for s in _get(f"/applications/{app}/stages?status=COMPLETE"):
        sid = s["stageId"]
        if sid in before or s.get("numCompleteTasks", 0) < 8:
            continue
        try:
            q = _get(
                f"/applications/{app}/stages/{sid}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        rec = {
            "stage": sid,
            "tasks": s["numCompleteTasks"],
            "med_task_ms": round(med, 1),
            "max_task_ms": round(mx, 1),
            "ratio": round(mx / max(med, 1.0), 2),
            "name": s.get("name", "")[:60],
        }
        total = s.get("executorRunTime", 0)
        if total > heaviest_total:
            heaviest_total, heaviest = total, rec
        if med < min_med_ms:
            continue
        if worst is None or rec["ratio"] > worst["ratio"]:
            worst = rec
    return {"worst": worst, "heaviest": heaviest}


def hub_graph(spark):
    from centrality_gpu_spark.graph import Graph

    ids = spark.range(V).select(F.col("id").cast("long"))
    base = ids.select(
        F.col("id").alias("src"),
        ((F.col("id") * F.lit(2654435761)) % V).alias("dst"),
    ).unionByName(
        ids.select(
            F.col("id").alias("src"),
            ((F.col("id") * 40503 + 7) % V).alias("dst"),
        )
    )
    hub = ids.where(F.col("id") % STRIDE == 0).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    e = base.unionByName(hub).withColumn("weight", F.lit(1.0))
    return Graph.from_undirected_edges(e, weight_col="weight")


def main() -> None:
    spark = get_spark(
        app_name="bench_hubskew",
        cores=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    from centrality_gpu_spark.operators.betweenness import betweenness
    from centrality_gpu_spark.operators.pagerank import pagerank
    from centrality_gpu_spark.operators.superstep import block_edges
    from centrality_gpu_spark.operators.triangles import triangle_count

    app = _app_id()
    g = hub_graph(spark)
    g.persist()
    m = g.edges.count()
    deg = g.degrees()
    dmax = deg.agg(F.max("degree")).collect()[0][0]
    out = {
        "V": V,
        "hub_stride": STRIDE,
        "directed_edges": m,
        "max_degree": int(dmax),
        "hub_fraction": round(dmax / V, 4),
        "jobs": {},
    }
    print(f"RESULT graph V={V} m={m} max_degree={dmax}", flush=True)

    def run(name, fn):
        before = _stage_ids(app)
        t0 = time.time()
        extra = fn() or {}
        dt = round(time.time() - t0, 2)
        skew = _skew_of_new_stages(app, before)
        out["jobs"][name] = {"wall_s": dt, "skew": skew, **extra}
        print(f"RESULT {name} {dt}s skew={skew} {extra}", flush=True)

    def pr(threshold):
        # partition_by="src" — the ROUTED-value store, the only mode
        # where hub salting applies (dst mode broadcasts values and
        # bounds skew by max in-degree instead; see block_edges)
        def job():
            blocked = block_edges(
                g,
                scratch_dir=tempfile.mkdtemp(prefix="hubskew_"),
                partition_by="src",
                hub_threshold=threshold,
            )
            s = (
                pagerank(g, fixed_iterations=10, mode="csr", blocked=blocked)
                .agg(F.sum("rank"))
                .collect()[0][0]
            )
            return {"rank_sum": round(float(s), 6), "n_hubs": blocked.n_hubs}

        return job

    order = os.environ.get("HUB_ORDER", "salted_first")
    if order == "salted_first":
        run("pagerank_csr_salted", pr(None))      # default 10k < V/10: salted
        run("pagerank_csr_unsalted", pr(V))       # threshold above hub degree
    else:
        run("pagerank_csr_unsalted", pr(V))
        run("pagerank_csr_salted", pr(None))
    run("triangle_count", lambda: {
        "n_triangles": triangle_count(g).collect()[0]["n_triangles"]})
    srcs = [int(x) for x in range(1, 6401, 100)]  # 64 spread sources
    run("betweenness_bsp_64src", lambda: {
        "bc_sum": round(float(
            betweenness(g, sources=srcs, strategy="bsp")
            .agg(F.sum("bc")).collect()[0][0]), 3)})

    worst = max(
        (
            j["skew"]["worst"]["ratio"]
            for j in out["jobs"].values()
            if j["skew"] and j["skew"]["worst"]
        ),
        default=0.0,
    )
    out["worst_task_ratio"] = worst
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
