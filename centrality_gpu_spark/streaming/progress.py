"""Stateful per-conversation progress via ``applyInPandasWithState``.

Every other incremental operator in this package keeps its state in a
driver-side accumulator folded by ``foreachBatch`` (see ``state.py``)
or in Spark's windowed-aggregation state (``sessions.py``). This module
uses the third Structured Streaming idiom — **per-key state in Spark's
own state store**, updated by Arrow-batched pandas groups — which is
the right shape when the state is (a) per-key, (b) too large / too
numerous for the driver, and (c) not expressible as a windowed
aggregate. The state lives with the shuffle partition that owns the
key, so it scales with executors, survives micro-batches without any
driver traffic, and rides the query checkpoint.

Operator: transcript turns (north-rule input table: ``conv_id,
turn_idx, role, text, tool, ts``) arrive in ANY order across
micro-batches — an append stream of transcript rows has no ordering
guarantee. Per ``conv_id`` the state tracks the **assembled prefix**
of the conversation under the input-hint's stable turn ordering:

- ``contiguous_upto`` — the largest ``k`` such that every turn_idx in
  ``[0, k]`` has been seen (−1 until turn 0 arrives);
- ``pending`` — out-of-order turn indexes beyond the frontier, kept
  sorted; bounded by the stream's out-of-orderness, NOT by
  conversation length (rows at/behind the frontier fold in and are
  dropped immediately — a fully in-order stream keeps this empty).
  **Caveat**: that bound assumes every turn is eventually delivered.
  A turn that is permanently LOST (e.g. turn 0 dropped at the
  producer) pins the frontier forever, so pending then grows with
  conversation length — and with ``timeout_ms=None`` that state never
  frees. Pass ``max_pending`` to bound the blast radius: a key whose
  pending set exceeds the cap is finalized (terminal ``final=true``
  row, state dropped) instead of growing without bound;
- ``pending_tool`` — has-tool bit per pending turn (parallel array,
  same out-of-orderness bound). Used to DETECT contract violations:
  a cross-batch re-delivery of a pending turn whose tool nullity
  disagrees with the first-accepted row increments ``n_conflicts``
  in the output instead of silently skewing ``n_tool_calls``.
  Conflicting replays of turns already folded into the contiguous
  frontier are not distinguishable from benign replays without O(n)
  per-turn state and stay undetected — documented residual;
- ``n_turns`` / ``n_tool_calls`` — distinct turns seen (replay-safe:
  a re-delivered turn_idx is recognized against the frontier+pending
  set and ignored);
- ``first_us`` / ``last_us`` — event-time extent in epoch-micros.

Each micro-batch emits one row per *touched* conversation (output mode
``update``) carrying the state snapshot and a monotone ``update_seq``
so a downstream consumer (or test) can pick each key's latest row
without relying on sink ordering. With a processing-time timeout
configured, a conversation idle past the horizon emits a terminal
``final=true`` row and its state is dropped — bounding the store to
conversations active within the horizon, the same retention contract
``session_window`` gets from its watermark.

Scale notes: state size is O(active conversations × out-of-orderness);
the only shuffle is the groupBy on ``conv_id`` (the stream's natural
key). The pandas handler is Arrow-batched per key group — no per-row
Python. Streaming ≡ batch: after the stream drains, each key's
latest row equals ``conversation_progress`` (the batch twin below) on
the union of all rows — tested in ``tests/test_streaming_progress.py``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("contiguous_upto", LongType()),
        StructField("pending", ArrayType(LongType())),
        StructField("pending_tool", ArrayType(LongType())),
        StructField("n_turns", LongType()),
        StructField("n_tool_calls", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("update_seq", LongType()),
        StructField("n_conflicts", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("contiguous_upto", LongType()),
        StructField("n_pending", LongType()),
        StructField("n_turns", LongType()),
        StructField("n_tool_calls", LongType()),
        StructField("duration_us", LongType()),
        StructField("update_seq", LongType()),
        StructField("final", BooleanType()),
        StructField("n_conflicts", LongType()),
    ]
)


def _advance_frontier(
    upto: int, pending: np.ndarray, new_idx: np.ndarray
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Fold ``new_idx`` (distinct turn indexes) into the frontier.

    Returns ``(new_upto, new_pending, accepted)`` where ``accepted`` is
    the subset of ``new_idx`` not already represented by the state
    (i.e. > upto and not in pending) — the indexes that count as newly
    seen turns. Pure numpy; unit-tested directly.
    """
    new_idx = np.unique(new_idx.astype(np.int64))
    fresh = new_idx[new_idx > upto]
    if pending.size:
        fresh = fresh[~np.isin(fresh, pending)]
    merged = np.union1d(pending, fresh) if fresh.size else pending
    # Longest consecutive run starting at upto+1: merged is sorted
    # unique, so position i holds upto+1+i exactly while the prefix is
    # contiguous.
    if merged.size:
        prefix = merged - (upto + 1) == np.arange(merged.size)
        n_run = merged.size if prefix.all() else int(np.argmin(prefix))
        if n_run:
            upto = int(merged[n_run - 1])
            merged = merged[n_run:]
    return upto, merged, fresh


def _fold_batch(
    state_row: Tuple, pdf: pd.DataFrame
) -> Tuple[Tuple, int, int]:
    """Fold one micro-batch group into a state tuple.

    ``state_row`` is ``(contiguous_upto, pending, pending_tool,
    n_turns, n_tool_calls, first_us, last_us, update_seq,
    n_conflicts)`` with ``pending``/``pending_tool`` parallel sorted
    lists. Returns the new state tuple plus the accepted-turn count
    and accepted-tool-call count (for observability). Replayed turn
    indexes are no-ops — except that a replay of a *still-pending*
    turn with a different tool nullity increments ``n_conflicts``
    (contract-violation observability; see module docstring).
    """
    (upto, pending, pending_tool, n_turns, n_tools, first_us, last_us,
     seq, n_conflicts) = state_row
    pending_arr = np.asarray(pending if pending is not None else [], dtype=np.int64)
    ptool_arr = np.asarray(
        pending_tool if pending_tool is not None else [], dtype=np.int64
    )
    # Malformed negative turn indexes are dropped for EVERY statistic
    # (frontier, counts, ts extent) — turns are 0-indexed per the input
    # hint; the stream wiring and the batch twin filter identically.
    pdf = pdf[pdf["turn_idx"] >= 0]
    # Dedupe the batch by turn_idx, preferring a tool-bearing row so an
    # in-batch duplicate with conflicting tool nullity resolves the
    # same way as the batch twin's any-row-has-tool rule. (Across
    # batches first-accepted wins: duplicate deliveries are assumed to
    # be byte-identical replays — a conflicting replay of a pending
    # turn is COUNTED in n_conflicts; one behind the frontier is not
    # distinguishable from a benign replay and stays undetected.)
    dd = pdf.sort_values("tool", na_position="last").drop_duplicates(
        subset=["turn_idx"]
    )
    idx = dd["turn_idx"].to_numpy(dtype=np.int64)
    delivered_tool = dd["tool"].notna().to_numpy()
    # conflict check: replays of turns still in pending, delivered with
    # the opposite tool nullity vs the first-accepted row
    if pending_arr.size and idx.size:
        pos = np.searchsorted(pending_arr, idx)
        safe = np.minimum(pos, pending_arr.size - 1)
        in_pending = pending_arr[safe] == idx
        if in_pending.any():
            stored = ptool_arr[safe[in_pending]]
            n_conflicts = int(n_conflicts) + int(
                (stored != delivered_tool[in_pending].astype(np.int64)).sum()
            )
    new_upto, new_pending, fresh = _advance_frontier(upto, pending_arr, idx)
    accepted = dd[dd["turn_idx"].isin(fresh)] if fresh.size else dd.iloc[0:0]
    n_new = int(len(accepted))
    n_new_tools = int(accepted["tool"].notna().sum())
    # has-tool bits for the surviving pending set: stored bits for old
    # pending turns, delivered bits for freshly-accepted ones (both
    # maps are bounded by the out-of-orderness window)
    bit_map = dict(zip(pending_arr.tolist(), ptool_arr.tolist()))
    bit_map.update(
        zip(
            accepted["turn_idx"].to_numpy(dtype=np.int64).tolist(),
            accepted["tool"].notna().astype(np.int64).tolist(),
        )
    )
    new_ptool = [int(bit_map[int(i)]) for i in new_pending]
    # normalize to epoch-micros regardless of the frame's native unit
    # (Arrow hands us datetime64[ns] or [us], tz-naive or UTC); dropna
    # first — NaT would otherwise become the int64 sentinel and corrupt
    # the extent (the batch twin's unix_micros skips nulls the same way)
    ts_us = (
        pd.to_datetime(pdf["ts"], utc=True)
        .dropna()
        .astype("datetime64[us, UTC]")
        .astype("int64")
    )
    lo = int(ts_us.min()) if len(ts_us) else None
    hi = int(ts_us.max()) if len(ts_us) else None
    first_us = lo if first_us is None else (min(first_us, lo) if lo is not None else first_us)
    last_us = hi if last_us is None else (max(last_us, hi) if hi is not None else last_us)
    new_state = (
        int(new_upto),
        [int(x) for x in new_pending],
        new_ptool,
        int(n_turns + n_new),
        int(n_tools + n_new_tools),
        first_us,
        last_us,
        int(seq + 1),
        int(n_conflicts),
    )
    return new_state, n_new, n_new_tools


_EMPTY_STATE = (-1, [], [], 0, 0, None, None, 0, 0)


def _emit_row(conv_id, st, final: bool, seq_bump: int = 0) -> pd.DataFrame:
    (upto, pending, _ptool, n_turns, n_tools, first_us, last_us, seq,
     n_conflicts) = st
    return pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "contiguous_upto": upto,
                "n_pending": len(pending or []),
                "n_turns": n_turns,
                "n_tool_calls": n_tools,
                "duration_us": (
                    last_us - first_us if first_us is not None else 0
                ),
                "update_seq": seq + seq_bump,
                "final": final,
                "n_conflicts": n_conflicts,
            }
        ]
    )


def _progress_fn(
    key, pdfs: Iterator[pd.DataFrame], state, timeout_ms=None,
    max_pending=None,
):
    """The ``applyInPandasWithState`` handler. Module-level so the
    timeout branch is unit-testable with a stub GroupState."""
    conv_id = key[0]
    if state.hasTimedOut:
        st = tuple(state.get)
        state.remove()
        yield _emit_row(conv_id, st, final=True, seq_bump=1)
        return
    cur = tuple(state.get) if state.exists else _EMPTY_STATE
    for pdf in pdfs:
        if len(pdf):
            cur, _, _ = _fold_batch(cur, pdf)
    # Lost-turn escape hatch: a permanently missing early turn pins the
    # frontier, so pending would otherwise grow with conversation
    # length. Past the cap the key is finalized — terminal row, state
    # dropped — instead of holding unbounded state forever.
    if max_pending is not None and len(cur[1]) > max_pending:
        state.remove()
        # seq_bump=1 mirrors the timeout path: the terminal row must
        # advance update_seq past the last non-final row's, so "latest
        # by seq" consumers order the final marker correctly
        yield _emit_row(conv_id, cur, final=True, seq_bump=1)
        return
    state.update(cur)
    if timeout_ms:
        state.setTimeoutDuration(timeout_ms)
    yield _emit_row(conv_id, cur, final=False)


def streaming_conversation_progress(
    stream: DataFrame,
    timeout_ms: int | None = None,
    max_pending: int | None = None,
) -> DataFrame:
    """Wire the handler onto a transcript stream.

    ``timeout_ms`` — processing-time idle horizon after which a
    conversation emits its terminal row and frees its state; ``None``
    keeps state until the query ends (fine for bounded replays/tests,
    wrong for an unbounded production stream — set it there).

    ``max_pending`` — cap on the out-of-order pending set per key. A
    key exceeding it (the permanently-lost-turn pathology: the
    frontier never advances, pending grows O(conversation length)) is
    finalized immediately with a terminal ``final=true`` diagnostic
    row and its state dropped. ``None`` (default) keeps the
    round-2-verified behavior; production streams that cannot
    guarantee eventual delivery should set it.

    Trigger compatibility (driven end-to-end, Spark 4.1): the timeout
    works under a continuous trigger (``processingTime=...``) — idle
    keys emit ``final=true`` and are dropped. Do NOT combine
    ``timeout_ms`` with ``trigger(availableNow=True)``: the post-drain
    timeout batch hits a Spark-internal planner NPE (the update rows
    all land first, but the query then terminates with an error);
    availableNow replays should leave ``timeout_ms=None``.

    Lifecycle note: ``final=true`` is terminal for that state. If the
    same conv_id produces rows AFTER its timeout — or after a
    ``max_pending`` finalization (same lost-row contract: the cap drops
    state, it cannot stop the source from sending more rows) — a fresh
    state starts from empty with reset counters and ``update_seq``
    restarting from 1, and a second ``final=true`` row may eventually
    follow. A consumer keying "latest row per conv" (or counting
    conversations) must scope to rows since the last ``final`` marker
    rather than treating conv_id as unique-per-final.
    """
    timeout = "ProcessingTimeTimeout" if timeout_ms else "NoTimeout"

    def fn(key, pdfs, state):
        return _progress_fn(
            key, pdfs, state, timeout_ms=timeout_ms, max_pending=max_pending
        )

    return (
        stream.select("conv_id", "turn_idx", "tool", "ts")
        # malformed rows never reach the state store, so a conversation
        # whose rows are ALL malformed produces no state and no output
        # row — exactly like the batch twin, which omits it
        .where(F.col("turn_idx") >= 0)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
        )
    )


def conversation_progress(transcripts: DataFrame) -> DataFrame:
    """Batch twin: the state each conversation converges to once every
    row has been delivered. ``contiguous_upto`` = largest k with turns
    0..k all present (−1 if turn 0 is missing); ``n_pending`` = distinct
    turns beyond that frontier (0 ⇔ the conversation is gap-free);
    turn counts are distinct-by-turn_idx, matching the streaming
    operator's replay-safe fold.
    """
    # negative turn_idx is malformed per the input hint (turns are
    # 0-indexed) — dropped from EVERY statistic on both the batch and
    # streaming side (the stream filters before the state store), so a
    # conversation with only malformed rows appears in neither output.
    valid = transcripts.where(F.col("turn_idx") >= 0)
    # collapse duplicate (conv, turn) rows first with the deterministic
    # any-row-has-tool rule — dropDuplicates would pick an arbitrary
    # row and flake the oracle hash when duplicates disagree on tool
    dd = valid.groupBy("conv_id", "turn_idx").agg(
        F.max(F.col("tool").isNotNull()).alias("has_tool")
    )
    # pos = rank among the conversation's distinct turn idxs (0-based);
    # a row sits on the contiguous prefix iff turn_idx == pos.
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ranked = dd.withColumn("pos", F.row_number().over(w) - F.lit(1))
    per_turn = ranked.groupBy("conv_id").agg(
        F.max(
            F.when(F.col("turn_idx") == F.col("pos"), F.col("turn_idx"))
        ).alias("upto_raw"),
        F.count("*").alias("n_turns"),
        F.sum(F.col("has_tool").cast("long")).alias("n_tool_calls"),
    )
    # all-null ts folds to 0, matching the streaming operator's "no
    # extent observed yet" emission
    extent = valid.groupBy("conv_id").agg(
        F.coalesce(
            F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")),
            F.lit(0).cast("long"),
        ).alias("duration_us")
    )
    return (
        per_turn.join(extent, "conv_id")
        .select(
            "conv_id",
            F.coalesce("upto_raw", F.lit(-1))
            .cast("long")
            .alias("contiguous_upto"),
            (
                F.col("n_turns") - (F.coalesce("upto_raw", F.lit(-1)) + 1)
            )
            .cast("long")
            .alias("n_pending"),
            F.col("n_turns").cast("long"),
            F.col("n_tool_calls").cast("long"),
            "duration_us",
        )
    )


def conversation_progress_oracle_sql(table: str = "transcripts") -> str:
    """DuckDB twin of :func:`conversation_progress` over ``table``."""
    return f"""
WITH dd AS (
  SELECT conv_id, turn_idx, MAX(tool IS NOT NULL) AS has_tool
  FROM {table} WHERE turn_idx >= 0 GROUP BY conv_id, turn_idx
),
ranked AS (
  SELECT conv_id, turn_idx, has_tool,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
           AS pos
  FROM dd
),
per_turn AS (
  SELECT conv_id,
         MAX(CASE WHEN turn_idx = pos THEN turn_idx END) AS upto_raw,
         CAST(COUNT(*) AS BIGINT) AS n_turns,
         CAST(SUM(CASE WHEN has_tool THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_calls
  FROM ranked GROUP BY conv_id
),
extent AS (
  SELECT conv_id,
         CAST(COALESCE(epoch_us(MAX(ts)) - epoch_us(MIN(ts)), 0) AS BIGINT)
           AS duration_us
  FROM {table} WHERE turn_idx >= 0 GROUP BY conv_id
)
SELECT p.conv_id,
       CAST(COALESCE(upto_raw, -1) AS BIGINT) AS contiguous_upto,
       CAST(n_turns - (COALESCE(upto_raw, -1) + 1) AS BIGINT) AS n_pending,
       n_turns, n_tool_calls, e.duration_us
FROM per_turn p JOIN extent e USING (conv_id)
ORDER BY p.conv_id
""".strip()
