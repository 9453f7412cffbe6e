"""Sessionization: gap-based session assignment over a timestamped
event stream — the canonical window-function pass of a transcript/event
pipeline (the input_hint's (conv_id, turn_idx, ts) shape: turns group
into sessions exactly like user events do).

A session breaks when the gap to the previous event of the same user
exceeds ``gap_ms``. Everything is integer epoch-millisecond arithmetic
inside two window functions (lag + running sum) partitioned by user —
scales as an ordinary per-user sort, no global window, no Python — and
is exactly replicated in DuckDB (``session_stats_oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MS = 30 * 60 * 1000  # 30 minutes


def sessionize(
    events: DataFrame,
    gap_ms: int = DEFAULT_GAP_MS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Input rows + (ts_ms:long, session_idx:long). ``session_idx`` is
    0-based per user, ordered by (ts, event_id) — the id tie-break makes
    simultaneous events deterministic."""
    # parquet timestamps load as TIMESTAMP_NTZ; the session runs in UTC
    # (session.py), so the cast interprets the wall-clock as UTC — the
    # same naive-as-UTC convention DuckDB's epoch_ms uses
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ms.asc(), F.col(id_col).asc())
    prev = F.lag(ms).over(w)
    is_new = F.when(
        prev.isNull() | ((ms - prev) > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    return events.select(
        "*",
        ms.alias("ts_ms"),
        (F.sum(is_new).over(w) - F.lit(1)).cast("long").alias("session_idx"),
    )


def session_stats(
    events: DataFrame, gap_ms: int = DEFAULT_GAP_MS
) -> DataFrame:
    """Per-session aggregate: (user_id, session_idx, n_events,
    start_ms, duration_ms, n_types). All integers — order-independent,
    so the driver hash is exact."""
    s = sessionize(events, gap_ms=gap_ms)
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("start_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


def session_stats_oracle_sql(gap_ms: int = DEFAULT_GAP_MS) -> str:
    """DuckDB twin of ``session_stats`` over the ``events`` view."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
  FROM events
),
lagged AS (
  SELECT user_id, event_type, ts_ms,
         LAG(ts_ms) OVER (PARTITION BY user_id
                          ORDER BY ts_ms ASC, event_id ASC) AS prev_ms,
         event_id
  FROM e
),
flagged AS (
  SELECT user_id, event_type, ts_ms, event_id,
         CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > {gap_ms}
              THEN 1 ELSE 0 END AS is_new
  FROM lagged
),
sessions AS (
  SELECT user_id, event_type, ts_ms,
         SUM(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts_ms ASC, event_id ASC
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       MIN(ts_ms) AS start_ms,
       MAX(ts_ms) - MIN(ts_ms) AS duration_ms,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM sessions
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""".strip()
