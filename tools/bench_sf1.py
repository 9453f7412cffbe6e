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


if __name__ == "__main__" and "--full" not in sys.argv:
    main()
    raise SystemExit(0)


# ---------------------------------------------------------------- full suite
#
# VERDICT r04 item #1: the complete bench.py suite as 1x/10x pairs on
# deterministically synthesized 10x inputs (same replication recipes as
# main() above; graphs become 10 disjoint id-offset copies, the
# transcripts pipeline generates a TRUE 10x instance). Pass bar: no
# query >12x its 1x wall; the per-family invariants asserted at 10x
# (10x triangles / components / rank mass on disjoint copies; identical
# BFS visits for the fixed source set; dedup drop count exactly 10x on
# token-renamed replicas). q16c (the ear kernel A/B) is a driver-local
# capped numpy benchmark, not a data-scale job — it has no 10x row by
# design. Run: python tools/bench_sf1.py --full


def replicate_embeddings(embs, k_replicas: int):
    """10 disjoint corpora: replica k offsets ids and flips embedding
    dimension signs by the bits of k — norms and within-replica
    similarities are preserved, cross-replica vectors decorrelate, so
    LSH bucket density stays flat while rows go 10x."""
    n = embs.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = []
    for k in range(k_replicas):
        r = embs
        if k:
            # k is a driver int: precompute its 5 sign bits as a literal
            # array and pick by dimension index (shiftright needs a
            # Python int for numBits, not a Column)
            signs = F.array(
                *[
                    F.lit(-1.0 if (k >> j) & 1 else 1.0)
                    for j in range(5)
                ]
            )
            r = r.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x * F.element_at(signs, (i % 5 + 1).cast("int"))
                    ).cast("float"),
                ),
            )
        reps.append(r.withColumn("vec_id", F.col("vec_id") + F.lit(k * n)))
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def full_suite() -> None:
    import statistics
    import tempfile

    import numpy as np  # noqa: F401

    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.betweenness import betweenness
    from centrality_gpu_spark.operators.bfs import bfs_visited
    from centrality_gpu_spark.operators.closeness import harmonic
    from centrality_gpu_spark.operators.components import connected_components
    from centrality_gpu_spark.operators.dedup import dedup_clusters
    from centrality_gpu_spark.operators.eigenvector import eigenvector_centrality
    from centrality_gpu_spark.operators.labelprop import label_propagation
    from centrality_gpu_spark.operators.pagerank import pagerank
    from centrality_gpu_spark.operators.partition import (
        edge_cut_summary,
        partition_graph,
        partition_multilevel,
    )
    from centrality_gpu_spark.operators.similarity import lsh_topk
    from centrality_gpu_spark.operators.superstep import block_edges
    from centrality_gpu_spark.operators.temporal import earliest_arrival
    from centrality_gpu_spark.operators.text import quality_filter
    from centrality_gpu_spark.operators.corpus import pack_sequences
    from centrality_gpu_spark.sources.testdata_graphs import (
        copurchase_graph,
        custorder_graph,
        events_graph,
        events_temporal_edges,
    )

    spark = get_spark(app_name="bench_sf1_full", cores=CPUS,
                      shuffle_partitions=CPUS)
    results: dict[str, dict] = {}
    inv: dict[str, dict] = {}

    def timed(name, scale, fn):
        t0 = time.time()
        extra = fn() or {}
        dt = round(time.time() - t0, 2)
        results.setdefault(name, {})[scale] = {"wall_s": dt, **extra}
        print(f"RESULT {name} {scale} {dt}s {extra}", flush=True)
        return extra

    # ---------- inputs: 1x and 10x
    g1 = copurchase_graph(spark, SF_DIR)
    e1 = g1.edges.localCheckpoint()
    g1 = Graph.from_symmetric_edges(e1)
    off = int(e1.agg(F.max("src")).collect()[0][0]) + 1
    e10 = replicate_edges(e1, REPLICAS, off).localCheckpoint()
    g10 = Graph.from_symmetric_edges(e10)

    ev1 = events_graph(spark, SF_DIR)
    ev_e1 = ev1.edges.localCheckpoint()
    ev1 = Graph.from_symmetric_edges(ev_e1)
    ev_off = int(ev_e1.agg(F.max("src")).collect()[0][0]) + 1
    ev10 = Graph.from_symmetric_edges(
        replicate_edges(ev_e1, REPLICAS, ev_off).localCheckpoint()
    )

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint()
    docs10 = replicate_documents(docs1, REPLICAS).localCheckpoint()
    embs1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").localCheckpoint()
    embs10 = replicate_embeddings(embs1, REPLICAS).localCheckpoint()

    co1 = custorder_graph(spark, SF_DIR)
    co_e1 = co1.edges.localCheckpoint()
    co1 = Graph.from_symmetric_edges(co_e1)
    co_off = int(co_e1.agg(F.max(F.greatest("src", "dst")))
                 .collect()[0][0]) + 1
    co10 = Graph.from_symmetric_edges(
        replicate_edges(co_e1, REPLICAS, co_off).localCheckpoint()
    )

    te1 = events_temporal_edges(spark, SF_DIR).localCheckpoint()
    te10 = replicate_temporal(te1, REPLICAS).localCheckpoint()

    # fixed source sets: the SAME 256 (or 64) sources at both scales,
    # spread evenly across the 10 copies at 10x via the id offset
    base_srcs = [r.id for r in
                 g1.vertices().orderBy("id").limit(256).collect()]
    srcs_1x = base_srcs
    srcs_10x = [
        int(base_srcs[i] + (i % REPLICAS) * off) for i in range(256)
    ]

    def suite(scale, g, ev, docs, embs, co, te, srcs, n_convs):
        pr_it = 10
        blocked = block_edges(
            g, scratch_dir=tempfile.mkdtemp(prefix=f"sf1full_{scale}_"),
            partition_by="dst",
        )
        s = timed(f"q1_pagerank_csr_{pr_it}it", scale, lambda: {
            "rank_sum": float(
                pagerank(g, fixed_iterations=pr_it, mode="csr",
                         blocked=blocked)
                .agg(F.sum("rank")).collect()[0][0])})
        inv.setdefault("rank_sum", {})[scale] = s["rank_sum"]
        timed("q2_pagerank_sql_10it", scale, lambda: {
            "rank_sum": float(
                pagerank(g, fixed_iterations=pr_it, mode="sql")
                .agg(F.sum("rank")).collect()[0][0])})
        s = timed("q3_components", scale, lambda: {
            "n_components": connected_components(g)
            .agg(F.countDistinct("component")).collect()[0][0]})
        inv.setdefault("n_components", {})[scale] = s["n_components"]
        s = timed("q4_triangle_count", scale, lambda: {
            "n_triangles": __import__(
                "centrality_gpu_spark.operators.triangles",
                fromlist=["triangle_count"],
            ).triangle_count(g).collect()[0]["n_triangles"]})
        inv.setdefault("n_triangles", {})[scale] = s["n_triangles"]
        src_df = spark.createDataFrame(
            [(int(x),) for x in srcs], "source long")
        s = timed("q5_bfs_256src", scale, lambda: {
            "pair_visits": bfs_visited(g, src_df).count()})
        inv.setdefault("bfs_visits", {})[scale] = s["pair_visits"]
        timed("q6_labelprop_5it", scale, lambda: {
            "rows": label_propagation(g, max_iterations=5).count()})
        timed("q7_betweenness_64src", scale, lambda: {
            "bc_sum": float(
                betweenness(g, sources=[int(x) for x in srcs[:64]])
                .agg(F.sum("bc")).collect()[0][0])})
        timed("q8_events_pagerank", scale, lambda: {
            "rows": pagerank(ev, fixed_iterations=10, mode="sql").count()})

        holder = {}

        def transcripts_job():
            from centrality_gpu_spark.datagen import generate_transcripts
            from centrality_gpu_spark.sources.transcripts import (
                transcript_graph,
            )

            tr = generate_transcripts(
                spark, n_conversations=n_convs, n_tools=100, max_turns=40,
                embed_samples=False,
            )
            tg = transcript_graph(tr, id_mode="hash")
            holder["g"] = tg.graph
            holder["g"].persist()
            return {"rows": pagerank(
                holder["g"], fixed_iterations=10, mode="sql").count()}

        timed("q9_transcripts_pipeline", scale, transcripts_job)
        timed("q14_transcript_pagerank_to_1e6", scale, lambda: {
            "rank_sum": float(
                pagerank(holder["g"], tol=1e-6, mode="sql")
                .agg(F.sum("rank")).collect()[0][0])})
        holder["g"].unpersist()

        s = timed("q10_dedup_clusters", scale, lambda: {
            "dropped": dedup_clusters(docs, threshold=0.5)
            .where(F.col("keep") == 0).count()})
        inv.setdefault("dedup_dropped", {})[scale] = s["dropped"]
        timed("q11_ann_lsh_topk", scale, lambda: {
            "rows": lsh_topk(embs, k=10).count()})
        timed("q12_eigenvector_csr_10it", scale, lambda: {
            "score_sum": float(
                eigenvector_centrality(g, fixed_iterations=10, mode="csr",
                                       blocked=blocked)
                .agg(F.sum("score")).collect()[0][0])})
        timed("q13_harmonic", scale, lambda: {
            "h_sum": float(harmonic(g).agg(F.sum("harmonic"))
                           .collect()[0][0])})
        srcs10 = spark.range(10).select(F.col("id"))
        s = timed("q15_temporal_arrival_fixpoint", scale, lambda: {
            "reached": earliest_arrival(
                te, srcs10, rounds=512, to_fixpoint=True).count()})
        inv.setdefault("temporal_reached", {})[scale] = s["reached"]

        def part_job():
            parts = partition_graph(
                co, 32, levels="auto", match_rounds=4).localCheckpoint()
            row = edge_cut_summary(co, parts).collect()[0]
            return {"cut": float(row.cut_fraction),
                    "balance": [int(row.min_part_size),
                                int(row.max_part_size)]}

        s = timed("q16_partition_custorder_32way", scale, part_job)
        inv.setdefault("custorder_cut", {})[scale] = s["cut"]

        def expander_job():
            parts = partition_graph(
                g, 32, levels="auto", match_rounds=2).localCheckpoint()
            row = edge_cut_summary(g, parts).collect()[0]
            return {"cut": float(row.cut_fraction)}

        timed("q16b_partition_expander_gate", scale, expander_job)

        def vcycle_job():
            parts = partition_multilevel(
                co, 32, match_rounds=4, refine_rounds=2).localCheckpoint()
            row = edge_cut_summary(co, parts).collect()[0]
            return {"cut": float(row.cut_fraction)}

        timed("q16v_partition_vcycle", scale, vcycle_job)
        timed("q17_quality_filter_gate", scale, lambda: {
            "kept": quality_filter(docs).where("keep").count()})
        timed("q18_pack_sequences", scale, lambda: {
            "max_shard": int(pack_sequences(docs, seq_len=2048)
                             .agg(F.max("shard")).collect()[0][0])})

    suite("1x", g1, ev1, docs1, embs1, co1, te1, srcs_1x, 20_000)
    suite("10x", g10, ev10, docs10, embs10, co10, te10, srcs_10x, 200_000)

    # ---------- invariants at 10x
    checks = []

    def chk(name, ok, detail):
        checks.append({"invariant": name, "ok": bool(ok), "detail": detail})
        print(f"INVARIANT {name}: {'OK' if ok else 'FAIL'} ({detail})",
              flush=True)

    chk("triangles_10x_exact",
        inv["n_triangles"]["10x"] == 10 * inv["n_triangles"]["1x"],
        inv["n_triangles"])
    chk("components_10x_exact",
        inv["n_components"]["10x"] == 10 * inv["n_components"]["1x"],
        inv["n_components"])
    # pagerank normalizes total rank mass to 1.0 at ANY scale — the
    # invariant on disjoint copies is conservation at both scales
    r1, r10 = inv["rank_sum"]["1x"], inv["rank_sum"]["10x"]
    chk("rank_mass_conserved",
        abs(r1 - 1.0) <= 1e-6 and abs(r10 - 1.0) <= 1e-6,
        inv["rank_sum"])
    chk("bfs_visits_10x_exact",
        inv["bfs_visits"]["10x"] == inv["bfs_visits"]["1x"],
        inv["bfs_visits"])
    chk("dedup_dropped_10x_exact",
        inv["dedup_dropped"]["10x"] == 10 * inv["dedup_dropped"]["1x"],
        inv["dedup_dropped"])
    chk("temporal_reached_monotone",
        inv["temporal_reached"]["10x"] >= inv["temporal_reached"]["1x"],
        inv["temporal_reached"])
    chk("custorder_cut_flat",
        inv["custorder_cut"]["10x"] <= inv["custorder_cut"]["1x"] + 0.05,
        inv["custorder_cut"])

    ratios = {}
    for name, scales in results.items():
        if "1x" in scales and "10x" in scales:
            ratios[name] = round(
                scales["10x"]["wall_s"] / max(scales["1x"]["wall_s"], 1e-9),
                2,
            )
    worst = max(ratios.values()) if ratios else 0.0
    print(json.dumps({
        "results": results, "ratios": ratios,
        "worst_ratio": worst,
        "median_ratio": round(statistics.median(ratios.values()), 2),
        "invariants": checks,
        "replicas": REPLICAS, "sf_dir": SF_DIR, "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__" and "--full" in sys.argv:
    full_suite()
