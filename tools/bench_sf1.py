"""One-order-of-magnitude scale check (VERDICT r3 item #5): run the
three newest heavy families — ``dedup_clusters``, structured
``partition_multilevel``, and ``temporal_arrival`` — at sf0.1 AND at a
deterministic 10x synthesis of the same inputs, in one session on
local[32], and report wall ratios.

There is no driver-generated sf1 directory, so the 10x inputs are
synthesized in-session from the sf0.1 parquet (no external data, no
RNG):

- documents x10: replica k rewrites every token ``w -> wxk`` (one
  regexp), so each replica carries the SAME near-duplicate structure as
  the original corpus but shares no shingles across replicas — ten
  independent sf0.1 corpora, the honest linear scale-up for an LSH
  pipeline (cross-replica mega-clusters would instead quadratically
  inflate the verify stage and measure the wrong thing).
- custorder star forest x10: replica k offsets both endpoint ids —
  ten disjoint forests, 10x vertices AND 10x edges for the
  partitioner (vertex count is the axis its windows/coarsening care
  about).
- temporal handoff edges x10: replica k shifts ts by k seconds on the
  SAME vertex set — 10x messages per fixpoint round, the axis the
  arrival relaxation cares about.

Pass/fail lens: a job is scale-clean when wall(10x) <~ 10-12x
wall(1x) (linear + fixed overheads); a cliff (quadratic bucket, depth
blowup) shows up as 30-100x. Results are appended to BENCH.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from centrality_gpu_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))


def replicate_documents(docs, k_replicas: int):
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for k in range(k_replicas):
        r = docs
        if k:
            r = r.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1x{k}")
            )
        reps.append(
            r.withColumn("doc_id", F.col("doc_id") + F.lit(k * n))
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def replicate_edges(edges, k_replicas: int, offset: int):
    reps = [
        edges.select(
            (F.col("src") + F.lit(k * offset)).alias("src"),
            (F.col("dst") + F.lit(k * offset)).alias("dst"),
            "weight",
        )
        for k in range(k_replicas)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def replicate_temporal(te, k_replicas: int):
    reps = [
        te.select(
            "src", "dst", (F.col("ts") + F.lit(k * 1_000_000)).alias("ts")
        )
        for k in range(k_replicas)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    spark = get_spark(app_name="bench_sf1", cores=CPUS, shuffle_partitions=CPUS)
    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.dedup import dedup_clusters
    from centrality_gpu_spark.operators.partition import (
        edge_cut_summary,
        partition_multilevel,
    )
    from centrality_gpu_spark.operators.temporal import earliest_arrival
    from centrality_gpu_spark.sources.testdata_graphs import (
        custorder_graph,
        events_temporal_edges,
    )

    out: dict[str, dict] = {}

    def timed(name, scale, fn):
        t0 = time.time()
        extra = fn() or {}
        dt = round(time.time() - t0, 2)
        out.setdefault(name, {})[scale] = {"wall_s": dt, **extra}
        print(f"RESULT {name} {scale} {dt}s {extra}", flush=True)

    # ---- dedup_clusters
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint()
    docs10 = replicate_documents(docs1, REPLICAS).localCheckpoint()

    def run_dedup(docs):
        def job():
            n = dedup_clusters(docs, threshold=0.5).count()
            return {"rows": n}
        return job

    timed("dedup_clusters", "1x", run_dedup(docs1))
    timed("dedup_clusters", "10x", run_dedup(docs10))

    # ---- partition_multilevel on the structured star forest
    g1 = custorder_graph(spark, SF_DIR)
    e1 = g1.edges.localCheckpoint()
    off = e1.agg(F.max(F.greatest("src", "dst"))).collect()[0][0] + 1
    e10 = replicate_edges(e1, REPLICAS, int(off)).localCheckpoint()

    def run_part(edges):
        def job():
            g = Graph.from_symmetric_edges(edges)
            parts = partition_multilevel(
                g, 32, match_rounds=4, refine_rounds=2
            ).localCheckpoint()
            row = edge_cut_summary(g, parts).collect()[0]
            return {
                "cut_fraction": float(row.cut_fraction),
                "balance": [int(row.min_part_size), int(row.max_part_size)],
            }
        return job

    timed("partition_multilevel", "1x", run_part(e1))
    timed("partition_multilevel", "10x", run_part(e10))

    # ---- temporal_arrival to fixpoint
    te1 = events_temporal_edges(spark, SF_DIR).localCheckpoint()
    te10 = replicate_temporal(te1, REPLICAS).localCheckpoint()
    srcs = spark.range(10).select(F.col("id"))

    def run_temporal(te):
        def job():
            n = earliest_arrival(
                te, srcs, rounds=512, to_fixpoint=True
            ).count()
            return {"reached": n}
        return job

    timed("temporal_arrival", "1x", run_temporal(te1))
    timed("temporal_arrival", "10x", run_temporal(te10))

    for name, scales in out.items():
        r = scales["10x"]["wall_s"] / max(scales["1x"]["wall_s"], 1e-9)
        scales["ratio_10x_over_1x"] = round(r, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
