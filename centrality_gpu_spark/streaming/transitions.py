"""Streaming tool-transition matrix via per-key state + delta
(retraction) emission — differential-dataflow-style exactness on an
append sink.

Batch semantics being mirrored (``sources/transcripts.py::
tool_transitions``): within each conversation, order the TOOL-BEARING
turns by ``turn_idx``; every consecutive pair in that filtered
sequence is one src→dst handoff. Out-of-order delivery is the hard
part: a tool turn arriving BETWEEN two turns that were already paired
must *split* their handoff — an append-only emission of final pairs
would be wrong, and holding rows back until order is proven would
stall on any gap.

The operator instead emits **deltas**: inserting turn ``t`` between
in-state neighbors ``p`` (predecessor) and ``s`` (successor) emits

- ``(tool(p), tool(s), -1)``  — retract the pair the insert splits
  (only when both neighbors exist),
- ``(tool(p), tool(t), +1)`` and ``(tool(t), tool(s), +1)`` — the two
  pairs it creates (each only when that neighbor exists).

Summing deltas per (conv_id, src_tool, dst_tool) therefore converges
to EXACTLY the batch pair multiset under ANY delivery order, with
replayed turn indexes as no-ops — and the sum is itself a streaming-
friendly aggregation (a downstream ``groupBy(...).sum('delta')``).

State per conversation: the sorted tool-turn index array plus the
parallel tool names — O(tool turns), bounded by conversation length
(finite for transcripts; pass ``timeout_ms`` to drop state for idle
conversations — deltas already emitted are never lost, but a turn
arriving AFTER its conversation's state was dropped starts a fresh
sequence and its handoffs to pre-drop turns are not recovered; same
lost-row contract as ``progress.py``).

Scale notes: the only shuffle is the groupBy on ``conv_id``; the
handler is Arrow-batched per key group, numpy inside. Streaming ≡
batch pinned in ``tests/test_streaming_transitions.py`` on permuted +
replayed delivery.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(LongType())),
        StructField("tools", ArrayType(StringType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("src_tool", StringType()),
        StructField("dst_tool", StringType()),
        StructField("delta", IntegerType()),
    ]
)


def _insert_deltas(
    idxs: List[int], tools: List[str], new: List[Tuple[int, str]]
) -> Tuple[List[int], List[str], List[Tuple[str, str, int]]]:
    """Fold ``new`` (turn_idx, tool) rows into the sorted state and
    return (new_idxs, new_tools, deltas). Replayed idxs are no-ops.
    Pure Python over per-conversation arrays; unit-tested directly."""
    deltas: List[Tuple[str, str, int]] = []
    for t_idx, tool in sorted(new):
        pos = int(np.searchsorted(idxs, t_idx))
        if pos < len(idxs) and idxs[pos] == t_idx:
            continue  # replay
        p = pos - 1  # predecessor slot
        s = pos      # successor slot (pre-insert indexing)
        if p >= 0 and s < len(idxs):
            deltas.append((tools[p], tools[s], -1))
        if p >= 0:
            deltas.append((tools[p], tool, 1))
        if s < len(idxs):
            deltas.append((tool, tools[s], 1))
        idxs.insert(pos, t_idx)
        tools.insert(pos, tool)
    return idxs, tools, deltas


def _transitions_fn(key, pdfs: Iterator[pd.DataFrame], state, timeout_ms=None):
    conv_id = key[0]
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        idxs, tools = list(state.get[0]), list(state.get[1])
    else:
        idxs, tools = [], []
    all_deltas: List[Tuple[str, str, int]] = []
    for pdf in pdfs:
        pdf = pdf[(pdf["turn_idx"] >= 0) & pdf["tool"].notna()]
        if not len(pdf):
            continue
        # in-batch dedup by turn_idx: first row wins (byte-identical
        # replays assumed, same contract as progress.py)
        dd = pdf.drop_duplicates(subset=["turn_idx"])
        new = list(
            zip(
                dd["turn_idx"].astype("int64").tolist(),
                dd["tool"].astype(str).tolist(),
            )
        )
        idxs, tools, deltas = _insert_deltas(idxs, tools, new)
        all_deltas.extend(deltas)
    state.update((idxs, tools))
    if timeout_ms:
        state.setTimeoutDuration(timeout_ms)
    if all_deltas:
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "src_tool": [d[0] for d in all_deltas],
                "dst_tool": [d[1] for d in all_deltas],
                "delta": [d[2] for d in all_deltas],
            }
        )


def streaming_tool_transitions(
    stream: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """Wire the delta emitter onto a transcript stream. Output is an
    append-style delta stream (conv_id, src_tool, dst_tool, delta);
    ``SUM(delta)`` per (src_tool, dst_tool) [optionally per conv]
    equals the batch ``tool_transitions`` counts once every row has
    been delivered."""
    timeout = "ProcessingTimeTimeout" if timeout_ms else "NoTimeout"

    def fn(key, pdfs, state):
        return _transitions_fn(key, pdfs, state, timeout_ms=timeout_ms)

    return (
        stream.select("conv_id", "turn_idx", "tool")
        .where(F.col("tool").isNotNull() & (F.col("turn_idx") >= 0))
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
        )
    )
