"""Streaming sessionization: the stateful-operator counterpart of the
batch ``operators/sessions.py`` pass, built on Spark's native
``session_window`` (merging event-time session state, watermark-bounded)
instead of hand-rolled state — the idiomatic Structured Streaming shape
for "gap-based sessions over an unbounded event stream".

Semantics contract (tested: streaming ≡ batch on the same rows):
batch ``sessionize`` breaks a session when the gap to the previous
event of the same user is **> gap_ms**; ``session_window(ts, g)``
merges events strictly **< g** apart. Passing ``g = gap_ms + 1 ms``
makes the two rules identical on integer-millisecond data, so the
streaming aggregate converges to exactly ``session_stats``.

State & scale: session-window state is per (user, open session) and is
dropped once the watermark passes the session's end — bounded by the
watermark horizon times the active-user rate, independent of stream
length. The aggregation shuffles on ``user_id`` only (the same
partitioning the batch window pass uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.sessions import DEFAULT_GAP_MS


def streaming_session_stats(
    stream: DataFrame,
    gap_ms: int = DEFAULT_GAP_MS,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, start_ms, duration_ms, n_events, n_types) per closed
    session — the streaming twin of ``session_stats`` (which also emits
    ``session_idx``; a streaming operator cannot know a session's
    per-user ordinal until the user's stream ends, so the stable key
    here is ``start_ms``).

    In append mode a row is emitted exactly once, when the watermark
    passes ``session_end + gap``; in update/complete mode partial
    sessions are visible early and refined.
    """
    ts = F.col(ts_col).cast("timestamp")  # NTZ parquet → naive-as-UTC
    gap = f"{gap_ms + 1} milliseconds"
    agg = (
        stream.withColumn("_ts", ts)
        .withWatermark("_ts", watermark)
        .groupBy(F.session_window(F.col("_ts"), gap).alias("sw"), user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
        )
    )
    start_ms = F.unix_millis(F.col("sw.start"))
    # session_window end = last event ts + gap; undo the pad to get the
    # batch duration (max ts - min ts)
    dur = F.unix_millis(F.col("sw.end")) - F.lit(gap_ms + 1) - start_ms
    return agg.select(
        user_col,
        start_ms.alias("start_ms"),
        dur.alias("duration_ms"),
        F.col("n_events").cast("long").alias("n_events"),
        "n_types",
    )
