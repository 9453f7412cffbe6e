"""Streaming earliest-arrival: incremental temporal reachability over
an append-only timestamped edge stream.

Earliest arrival is a monotone min-fixpoint, which makes it exactly the
kind of state a stream can maintain incrementally: arrivals only ever
decrease-or-appear, never retract. When edge batches arrive in
non-decreasing timestamp order (the natural order of an event stream —
enforce with a watermark upstream), every time-respecting path's edges
span batches in order, so running the relaxation to fixpoint on each
batch seeded with the accumulated state converges to exactly the batch
``earliest_arrival`` over the full edge set (tested).

State is one (id, arrival) row per reached vertex — O(V), lineage cut
per batch — and each batch costs the batch-sized relaxation only; the
historical edge set is never rescanned. This is the incremental shape
the batch operator's docstring promises at 100 TB: a day's new events
relax against yesterday's arrival vector, not against the archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.temporal import earliest_arrival

BATCH_ROUND_BUDGET = 64


class StreamingArrival:
    """foreachBatch accumulator for earliest arrival.

    ``update(batch_edges)`` folds one static batch into the state and
    returns the new state DataFrame; ``sink`` is the foreachBatch
    callable. Read the current state from ``.state`` at any time.
    """

    def __init__(
        self,
        spark: SparkSession,
        sources: DataFrame,
        start_ts: int = 0,
        round_budget: int = BATCH_ROUND_BUDGET,
    ):
        self.spark = spark
        self.round_budget = round_budget
        self.state: DataFrame = (
            sources.select(
                F.col("id").cast("long"),
                F.lit(int(start_ts)).cast("long").alias("arrival"),
            )
            .distinct()
            .localCheckpoint()
        )
        self._empty_sources = spark.createDataFrame([], "id long")

    def update(self, batch_edges: DataFrame) -> DataFrame:
        if not batch_edges.isEmpty():
            self.state = earliest_arrival(
                batch_edges,
                self._empty_sources,
                rounds=self.round_budget,
                to_fixpoint=True,
                initial=self.state,
            ).localCheckpoint()
        return self.state

    def sink(self, batch: DataFrame, batch_id: int) -> None:
        self.update(batch)

    def save(self, root: str, epoch: int = 0) -> None:
        """Durable epoch of the (id, arrival) state — see
        ``streaming.state`` for the resume contract (the min-fixpoint
        fold is idempotent under batch replay)."""
        from centrality_gpu_spark.streaming.state import save_frames

        save_frames(
            self.spark, root, {"state": self.state}, epoch,
            extra={"round_budget": self.round_budget},
        )

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "StreamingArrival":
        from centrality_gpu_spark.streaming.state import load_frames

        got = load_frames(spark, root, ["state"])
        if got is None:
            raise FileNotFoundError(f"no verifiable epoch under {root}")
        frames, extra = got
        acc = cls(
            spark,
            spark.createDataFrame([], "id long"),
            round_budget=int(extra.get("round_budget", BATCH_ROUND_BUDGET)),
        )
        acc.state = frames["state"].localCheckpoint()
        return acc


def run_arrival_stream(
    stream_edges: DataFrame,
    acc: StreamingArrival,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a streaming (src, dst, ts) edge DataFrame into the
    accumulator via foreachBatch. Returns the started query."""
    writer = stream_edges.writeStream.foreachBatch(acc.sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
