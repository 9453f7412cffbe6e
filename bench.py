"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric (BASELINE.json): PageRank wall-time (fixed 10
iterations, CSR superstep mode) on the copurchase graph, plus derived
edges-processed/sec per SpMV superstep. Other queries time the rest of
the operator inventory at the same scale.

Scaling evidence (N vs 4N cores) is produced separately by
tools/bench_scaling.py → BENCH.md (same job, local[8] vs local[32]).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from centrality_gpu_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus)

    from pyspark.sql import functions as F

    from centrality_gpu_spark.operators.betweenness import betweenness
    from centrality_gpu_spark.operators.bfs import bfs_visited
    from centrality_gpu_spark.operators.components import connected_components
    from centrality_gpu_spark.operators.labelprop import label_propagation
    from centrality_gpu_spark.operators.pagerank import pagerank
    from centrality_gpu_spark.operators.superstep import block_edges
    from centrality_gpu_spark.operators.triangles import triangle_count
    from centrality_gpu_spark.sources.testdata_graphs import copurchase_graph, events_graph

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        return out, dt

    # canonical bench graph: copurchase at the given sf
    g = copurchase_graph(spark, sf_dir).persist()
    m_directed = g.edges.count()  # materialize + size
    extras["graph_directed_edges"] = m_directed
    extras["graph_vertices"] = g.num_vertices()

    # q1: PageRank, 10 fixed iterations, CSR superstep mode (headline):
    # edges bucketed to disk once, per-block CSR cached worker-side
    import tempfile

    pr_iters = 10
    blocked = block_edges(
        g, scratch_dir=tempfile.mkdtemp(prefix="bench_blk_"), partition_by="dst"
    )
    from centrality_gpu_spark.plans.checkpoint import CheckpointManager

    q1_ck = CheckpointManager(spark)
    _, pr_secs = timed(
        "q1_pagerank_csr_10it",
        lambda: pagerank(g, fixed_iterations=pr_iters, mode="csr",
                         blocked=blocked, checkpoint=q1_ck)
        .agg(F.sum("rank")).collect(),
    )
    extras["pagerank_edges_per_sec"] = round(m_directed * pr_iters / pr_secs, 1)
    # per-iteration MEDIAN from the superstep metrics: robust to a GC
    # pause or box-noise spike landing inside the wall-clock window —
    # the honest latency-per-superstep read next to the total
    iter_secs = sorted(
        m["secs"] for m in q1_ck.metrics
        if m.get("op") == "pagerank" and "secs" in m
    )
    if iter_secs:
        extras["pagerank_per_iter_median_s"] = round(
            statistics.median(iter_secs), 3
        )

    # q2: PageRank SQL mode (Catalyst/Tungsten reference point)
    timed(
        "q2_pagerank_sql_10it",
        lambda: pagerank(g, fixed_iterations=pr_iters, mode="sql")
        .agg(F.sum("rank")).collect(),
    )

    # q3: connected components to fixpoint
    timed("q3_components", lambda: connected_components(g).agg(F.countDistinct("component")).collect())

    # q4: triangle count
    tri, _ = timed("q4_triangle_count", lambda: triangle_count(g).collect())
    extras["n_triangles"] = tri[0]["n_triangles"]

    # q5: batched multi-source BFS, 256 sources — auto regime (broadcast
    # CSR kernel at this scale; BSP supersteps above the size guard)
    srcs = [r.id for r in g.vertices().limit(256).collect()]
    src_df = spark.createDataFrame([(int(s),) for s in srcs], "source long")
    bfs_res, bfs_secs = timed(
        "q5_bfs_256src", lambda: bfs_visited(g, src_df).count()
    )
    extras["bfs_pair_visits"] = bfs_res
    extras["bfs_traversals_per_sec"] = round(len(srcs) * m_directed / bfs_secs, 1)

    # q6: label propagation, capped iterations
    timed("q6_labelprop_5it", lambda: label_propagation(g, max_iterations=5).count())

    # q7: exact betweenness, 64 sampled sources (auto regime: broadcast
    # CSR here, size-guarded to BSP at 100×)
    timed(
        "q7_betweenness_64src",
        lambda: betweenness(g, sources=srcs[:64]).agg(F.sum("bc")).collect(),
    )

    # q8: events-graph PageRank end-to-end (scan → edges → rank)
    timed(
        "q8_events_pagerank",
        lambda: pagerank(events_graph(spark, sf_dir), fixed_iterations=10, mode="sql")
        .count(),
    )

    # q9: the north-rule pipeline end-to-end — synthesize transcripts,
    # build the conv/tool graph (tool + co-invocation edges, dense
    # relabel), PageRank it. Generation is distributed + deterministic.
    tg_holder = {}

    def transcripts_pipeline():
        from centrality_gpu_spark.datagen import generate_transcripts
        from centrality_gpu_spark.sources.transcripts import transcript_graph

        tr = generate_transcripts(
            spark, n_conversations=20_000, n_tools=100, max_turns=40,
            embed_samples=False,
        )
        tg = transcript_graph(tr, id_mode="hash")
        tg_holder["g"] = tg.graph.persist()
        return pagerank(tg.graph, fixed_iterations=10, mode="sql").count()

    timed("q9_transcripts_pipeline_20k", transcripts_pipeline)

    # q14: the north-rule headline phrasing verbatim — PageRank
    # iterations-to-1e-6 wall-time on the transcript-derived edge table
    # (graph reused from q9; convergence mode counts its own iterations)
    tr_g = tg_holder["g"]
    _, conv_secs = timed(
        "q14_transcript_pagerank_to_1e6",
        lambda: pagerank(tr_g, tol=1e-6, mode="sql").agg(F.sum("rank")).collect(),
    )
    extras["transcript_graph_directed_edges"] = tr_g.edges.count()

    # q10/q11: the training-data pipeline ops at the same sf — the full
    # dedup decision (shingle → minhash → band join → verify → connected
    # components → representative pick) and LSH ANN top-k
    from centrality_gpu_spark.operators.dedup import dedup_clusters
    from centrality_gpu_spark.operators.similarity import lsh_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dropped, _ = timed(
        "q10_dedup_clusters",
        lambda: dedup_clusters(docs, threshold=0.5)
        .where(F.col("keep") == 0).count(),
    )
    extras["dedup_docs_dropped"] = dropped
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("q11_ann_lsh_topk", lambda: lsh_topk(embs, k=10).count())

    # q12: eigenvector centrality — another SpMV client, reuses the q1
    # block store (no rebuild); q13: harmonic centrality via the
    # broadcast BFS kernel (auto regime)
    from centrality_gpu_spark.operators.closeness import harmonic
    from centrality_gpu_spark.operators.eigenvector import eigenvector_centrality

    timed(
        "q12_eigenvector_csr_10it",
        lambda: eigenvector_centrality(
            g, fixed_iterations=10, mode="csr", blocked=blocked
        ).agg(F.sum("score")).collect(),
    )
    timed("q13_harmonic", lambda: harmonic(g).agg(F.sum("harmonic")).collect())

    # q15: temporal earliest-arrival to fixpoint over the events handoff
    # stream; q16: multilevel 32-way partition + edge-cut metric
    from centrality_gpu_spark.operators.partition import (
        edge_cut_summary,
        partition_graph,
        refine_partition,
    )
    from centrality_gpu_spark.operators.temporal import earliest_arrival
    from centrality_gpu_spark.sources.testdata_graphs import events_temporal_edges

    te = events_temporal_edges(spark, sf_dir)
    srcs10 = spark.range(10).select(F.col("id"))
    timed(
        "q15_temporal_arrival_fixpoint",
        lambda: earliest_arrival(te, srcs10, rounds=256, to_fixpoint=True).count(),
    )
    cut_holder = {}

    # q16: the clustered case — the customer↔order star forest (the
    # transcript-shaped graph): pendant collapse + LPA packing should
    # reach cut ≈ 0 with balanced parts
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    gco = custorder_graph(spark, sf_dir).persist()
    gco.edges_by_src().count()

    def partition_custorder_job():
        parts = partition_graph(gco, 32, levels="auto", match_rounds=4)
        parts = parts.localCheckpoint()
        row = edge_cut_summary(gco, parts).collect()[0]
        cut_holder["custorder_cut_fraction"] = row.cut_fraction
        refined = refine_partition(gco, parts, 32, rounds=2)
        row2 = edge_cut_summary(gco, refined).collect()[0]
        cut_holder["custorder_cut_refined"] = row2.cut_fraction
        cut_holder["custorder_balance"] = [
            int(row2.min_part_size), int(row2.max_part_size)
        ]
        return row2

    timed("q16_partition_custorder_32way", partition_custorder_job)
    extras["partition_custorder_cut"] = cut_holder["custorder_cut_fraction"]
    extras["partition_custorder_cut_refined"] = cut_holder["custorder_cut_refined"]
    extras["partition_custorder_balance"] = cut_holder["custorder_balance"]
    gco.unpersist()

    # q16b: the structure-free case — the copurchase co-occurrence graph
    # is an expander (contraction merges <5% of its edges), so the auto
    # gate hash-assigns: measuring that the engine REFUSES to burn
    # compute where no partition helps is the honest scale behavior
    # (r2 spent 59 s here for a 0.926 cut ≈ random). Since r4 the
    # verdict comes from an md5-sampled induced subgraph (~1/64 of the
    # edges) instead of a full-graph matching level.
    def partition_expander_job():
        # localCheckpoint: edge_cut_summary joins parts twice; without
        # it the peel+matching pipeline would execute once per side
        parts = partition_graph(
            g, 32, levels="auto", match_rounds=2
        ).localCheckpoint()
        row = edge_cut_summary(g, parts).collect()[0]
        cut_holder["copurchase_cut_fraction"] = row.cut_fraction
        return row

    timed("q16b_partition_expander_gate", partition_expander_job)
    extras["partition_copurchase_cut"] = cut_holder["copurchase_cut_fraction"]

    # q16c: ear-compression cost/benefit (the reference's deepest
    # optimization, G7-G18 / bcc_bfs.cpp:611-894): subdivide events
    # edges into 3-hop chains — ~90% of vertices become degree-2 ear
    # interiors, the mesh/road-like regime the kernel targets — and
    # time the all-source BC kernels head to head (outputs equal to
    # 1e-9, tested in tests/test_ears.py). MEASURED RESULTS (r3):
    # n=3,305 (this capped job): ear 1.16–1.37× FASTER across 3 bench
    # passes; n=16,505 (full sf0.1 subdivision): 0.86× — SLOWER. The
    # win is cache-residency-bound: once the per-source rows spill out
    # of LLC, the per-interior-source reverse sweep costs as much as
    # the forward BFS it avoids, so the kernel stays OFF by default
    # for large graphs (its value there is exact output parity with
    # the reference's ear pipeline; the reference's win was
    # GPU-specific). The capped rerun keeps the record measured, not
    # asserted.
    import numpy as np

    from centrality_gpu_spark.operators.betweenness import brandes_kernel
    from centrality_gpu_spark.operators.ears import brandes_ear_kernel
    from centrality_gpu_spark.sources.testdata_graphs import events_graph

    epd = (
        events_graph(spark, sf_dir)
        .edges_by_src()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .orderBy("src", "dst")
        .limit(1500)
        .toPandas()
    )
    ids = np.unique(np.concatenate([epd["src"].to_numpy(), epd["dst"].to_numpy()]))
    lut = {int(v): i for i, v in enumerate(ids)}
    s0 = np.array([lut[int(v)] for v in epd["src"]], dtype=np.int64)
    d0 = np.array([lut[int(v)] for v in epd["dst"]], dtype=np.int64)
    n0, m0 = len(ids), len(s0)
    mid1 = n0 + 2 * np.arange(m0, dtype=np.int64)
    mid2 = mid1 + 1
    es = np.concatenate([s0, mid1, mid2])
    ed = np.concatenate([mid1, mid2, d0])
    n_sub = n0 + 2 * m0
    asrc = np.concatenate([es, ed])
    adst = np.concatenate([ed, es])
    order = np.argsort(asrc, kind="stable")
    sub_indices = adst[order]
    sub_indptr = np.zeros(n_sub + 1, dtype=np.int64)
    np.add.at(sub_indptr, asrc + 1, 1)
    sub_indptr = np.cumsum(sub_indptr)

    holder = {}

    def ear_kernel_job():
        t0 = time.time()
        plain = brandes_kernel(sub_indptr, sub_indices, np.arange(n_sub), n_sub)
        t_plain = time.time() - t0
        t0 = time.time()
        eared = brandes_ear_kernel(sub_indptr, sub_indices, n_sub)
        t_ear = time.time() - t0
        assert np.allclose(plain, eared, atol=1e-6)
        holder.update(plain=t_plain, ear=t_ear)
        return eared

    timed("q16c_ear_kernel_vs_brandes", ear_kernel_job)
    extras["ear_kernel_vertices"] = int(n_sub)
    extras["ear_brandes_plain_s"] = round(holder["plain"], 2)
    extras["ear_brandes_ear_s"] = round(holder["ear"], 2)
    extras["ear_kernel_speedup"] = round(holder["plain"] / holder["ear"], 2)

    # q17: the per-document curation signal scans (token/quality/langid/
    # entropy/repetition joined into the filter gate) + q18 sequence
    # packing — the corpus side's cheap codegen paths at the same sf
    from centrality_gpu_spark.operators.corpus import pack_sequences
    from centrality_gpu_spark.operators.text import quality_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n_docs = docs.count()
    extras["corpus_docs"] = n_docs

    def signals_job():
        kept = quality_filter(docs).where("keep").count()
        extras["quality_kept_docs"] = kept
        return kept

    timed("q17_quality_filter_gate", signals_job)
    timed("q18_pack_sequences", lambda: pack_sequences(docs, seq_len=2048).agg(
        F.max("shard").alias("mx")).collect())

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_pagerank_csr_10it_walltime",
                "value": queries["q1_pagerank_csr_10it"],
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "total_sec": total,
                "cpus": cpus,
                "extras": extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
