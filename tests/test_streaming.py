"""Streaming transcript ingestion: incremental edges ≡ batch edges,
replay dedup across restarts, warm-started snapshot PageRank."""

import shutil

import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.datagen import generate_transcripts
from centrality_gpu_spark.sources.transcripts import tool_invocations
from centrality_gpu_spark.streaming import (
    compact_edge_deltas,
    run_edge_delta_stream,
    snapshot_graph,
    snapshot_pagerank,
    windowed_tool_counts,
    read_transcript_stream,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "delta": str(tmp_path / "delta"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def _chunks(spark):
    tr = generate_transcripts(
        spark, n_conversations=300, n_tools=20, max_turns=12, embed_samples=False
    ).persist()
    c1 = tr.where(F.crc32(F.col("conv_id")) % 2 == 0)
    c2 = tr.where(F.crc32(F.col("conv_id")) % 2 == 1)
    return tr, c1, c2


def test_incremental_equals_batch(spark, dirs):
    tr, c1, c2 = _chunks(spark)
    # chunk 1 arrives, stream drains it
    # wide watermark: the synthetic ts span is months, and chunk 2
    # arrives "out of order" behind chunk 1's max event time — a real
    # deployment sizes the watermark to its replay/disorder horizon
    c1.write.mode("append").parquet(dirs["in"])
    run_edge_delta_stream(spark, dirs["in"], dirs["delta"], dirs["ckpt"],
                          watermark="3650 days")
    mid = compact_edge_deltas(spark, dirs["delta"])
    batch_mid = tool_invocations(c1)
    assert (
        mid.join(batch_mid, ["conv_id", "tool"])
        .where(mid.n != batch_mid.n).count() == 0
    )
    assert mid.count() == batch_mid.count()

    # chunk 2 arrives later — PLUS a full replay of chunk 1 (at-least-
    # once upstream): the checkpointed dedup state must absorb it
    c2.write.mode("append").parquet(dirs["in"])
    c1.write.mode("append").parquet(dirs["in"])
    run_edge_delta_stream(spark, dirs["in"], dirs["delta"], dirs["ckpt"],
                          watermark="3650 days")
    final = compact_edge_deltas(spark, dirs["delta"])
    batch_all = tool_invocations(tr)
    diff = (
        final.join(batch_all, ["conv_id", "tool"], "full")
        .where(
            final.n.isNull() | batch_all.n.isNull() | (final.n != batch_all.n)
        )
        .count()
    )
    assert diff == 0
    tr.unpersist()


def test_snapshot_pagerank_warm_start(spark, dirs):
    tr, c1, c2 = _chunks(spark)
    c1.write.mode("append").parquet(dirs["in"])
    run_edge_delta_stream(spark, dirs["in"], dirs["delta"], dirs["ckpt"],
                          watermark="3650 days")
    r1 = snapshot_pagerank(spark, dirs["delta"]).persist()
    assert abs(r1.agg(F.sum("rank")).collect()[0][0] - 1.0) < 1e-6

    c2.write.mode("append").parquet(dirs["in"])
    run_edge_delta_stream(spark, dirs["in"], dirs["delta"], dirs["ckpt"],
                          watermark="3650 days")
    # warm-started snapshot equals the cold run on the same edges (same
    # fixpoint, init only affects the path to it)
    warm = snapshot_pagerank(spark, dirs["delta"], prev_ranks=r1).persist()
    cold = snapshot_pagerank(spark, dirs["delta"]).persist()
    joined = warm.alias("w").join(cold.alias("c"), "id")
    max_diff = joined.agg(
        F.max(F.abs(F.col("w.rank") - F.col("c.rank")))
    ).collect()[0][0]
    assert max_diff < 1e-4  # both at tol=1e-6 fixpoint
    # ranks over MORE data differ from the first snapshot (it really
    # incorporated chunk 2)
    assert warm.count() > r1.count()
    for df in (r1, warm, cold):
        df.unpersist()
    tr.unpersist()


def test_windowed_counts_and_schema(spark, dirs, tmp_path):
    tr, c1, _c2 = _chunks(spark)
    c1.write.mode("append").parquet(dirs["in"])
    stream = read_transcript_stream(spark, dirs["in"])
    assert stream.isStreaming
    counts = windowed_tool_counts(stream, window="1 hour", watermark="1 hour")
    out = str(tmp_path / "win_out")
    q = (
        counts.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark is the max event time, so windows strictly
    # before it are emitted. Validate schema + per-window totals ≤ batch.
    res = spark.read.parquet(out)
    assert set(res.columns) == {"window", "tool", "n"}
    batch_totals = {
        r.tool: r.n
        for r in c1.where(F.col("tool").isNotNull())
        .groupBy("tool").agg(F.count("*").alias("n")).collect()
    }
    for r in res.groupBy("tool").agg(F.sum("n").alias("n")).collect():
        assert r.n <= batch_totals[r.tool]
    tr.unpersist()


def test_streaming_sessions_equal_batch(spark, tmp_path):
    """session_window streaming aggregation converges to exactly the
    batch gap-based session_stats on the same rows (the +1ms gap pad
    reconciles `> gap` batch breaks with `< gap` window merges)."""
    from centrality_gpu_spark.operators.sessions import session_stats
    from centrality_gpu_spark.streaming import streaming_session_stats

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "ev_in")
    # two out-of-order chunks, like a replayed backfill
    events.where(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)
    events.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    assert stream.isStreaming
    stats = streaming_session_stats(stream, gap_ms=30 * 60 * 1000)
    q = (
        stats.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.start_ms, r.duration_ms, r.n_events, r.n_types)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    exp = {
        (r.user_id, r.start_ms, r.duration_ms, r.n_events, r.n_types)
        for r in session_stats(events, gap_ms=30 * 60 * 1000).collect()
    }
    assert got == exp
