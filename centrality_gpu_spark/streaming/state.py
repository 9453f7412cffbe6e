"""Durable save/load for the incremental streaming accumulators.

Structured Streaming's foreachBatch checkpoint only persists SOURCE
OFFSETS — on restart the query resumes from the next unread batch, but
a Python-side accumulator rebuilt from ``__init__`` has lost its state,
so the resumed run silently undercounts. These helpers give every
accumulator in this package a durable twin of that offset checkpoint:
``acc.save(root)`` after (periodically, or at shutdown) and
``Cls.load(spark, root)`` before restarting the query.

Built on ``plans.checkpoint.CheckpointManager``'s verified durable
epochs (parquet + ``_META.json`` written last, per-partition row/hash
lineage re-verified on read — a torn write is skipped in favor of the
previous good epoch), so the streaming resume story is the SAME
machinery the batch iterative operators already use. Counters and
hyper-parameters ride in the epoch's ``extra`` dict.

Consistency contract: call ``save`` only between batches (foreachBatch
is serial per query, so from inside ``sink`` or after ``q.stop()``);
pair it with the query's own checkpointLocation so a restart replays
exactly the batches after the saved epoch. Replay-safety differs by
accumulator — components/temporal/dedup updates are idempotent
per-batch (re-folding an already-folded batch is a no-op), while
StreamingTriangles dedups re-sent EDGES, so its epoch must be saved
aligned with the offsets (save from ``sink`` every batch, or stop the
query before saving).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def save_frames(
    spark: SparkSession,
    root: str,
    frames: dict[str, DataFrame],
    epoch: int = 0,
    extra: dict[str, Any] | None = None,
) -> None:
    """Persist named state frames as one durable epoch under ``root``."""
    ckpt = CheckpointManager(spark, root=root)
    for name, df in frames.items():
        ckpt.save_epoch(df, name, epoch, extra=extra)


def _verify_epoch(
    spark: SparkSession, root: str, name: str, epoch: int
) -> tuple[DataFrame, dict[str, Any]] | None:
    import json
    import os

    from centrality_gpu_spark.plans.checkpoint import META_FILE, verify_epoch_frame

    d = os.path.join(root, name, f"epoch={epoch}")
    meta_path = os.path.join(d, META_FILE)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    df = spark.read.parquet(d)
    # row count + content hash vs the recorded per-partition lineage —
    # a corrupted-but-count-preserving epoch is rejected.
    if not verify_epoch_frame(df, meta):
        return None
    return df, meta


def load_frames(
    spark: SparkSession, root: str, names: list[str]
) -> tuple[dict[str, DataFrame], dict[str, Any]] | None:
    """The NEWEST epoch at which every named frame verifies, or None.
    All frames must come from one epoch — a save interrupted between
    frames must fall back to the previous complete epoch, never mix
    states."""
    import os

    base = os.path.join(root, names[0])
    if not os.path.isdir(base):
        return None
    epochs = sorted(
        (
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith("epoch=")
        ),
        reverse=True,
    )
    for ep in epochs:
        out: dict[str, DataFrame] = {}
        extra: dict[str, Any] = {}
        ok = True
        for name in names:
            got = _verify_epoch(spark, root, name, ep)
            if got is None:
                ok = False
                break
            out[name], meta = got
            extra = meta.get("extra", {}) or extra
        if ok:
            return out, extra
    return None
