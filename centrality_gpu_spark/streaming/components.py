"""Streaming connected components: incremental hash-min labels over an
append-only edge stream, via label contraction.

Connected components is a union-find — monotone under edge insertion
(labels only merge downward, never split), and completely order-free:
unlike the temporal accumulator, batches may arrive in ANY order and
the fold still equals the batch answer over the union of all edges
(tested). Each batch folds in three steps:

1. **Contract**: relabel the batch's endpoints through the current
   label state (an endpoint not yet seen stands for itself). Every
   existing component collapses to its single label vertex, so the
   contracted graph has at most 2·|batch| vertices regardless of how
   much history the state encodes.
2. **Solve small**: run the batch hash-min ``connected_components`` on
   the contracted graph — cost scales with the batch, not the archive.
3. **Broadcast back**: the contracted result is a (old label → new
   label) table of at most 2·|batch| rows; broadcast-join it onto the
   O(V) state so the state update is map-side only, then append the
   batch's brand-new vertices.

Per batch: O(|batch|) join + CC work, one map-side O(V) state rewrite,
state = one (id, component) row per vertex with lineage cut per batch.
The historical edge set is never rescanned — a day's new transcript
edges fold against yesterday's labels, not against the archive. The
min-label invariant is preserved inductively: old labels are the minima
of their components, and the contracted CC takes minima over exactly
the set {old labels} ∪ {new vertex ids} of each merged component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.components import connected_components


class StreamingComponents:
    """foreachBatch accumulator for connected components.

    ``update(batch_edges)`` folds one static (src, dst) batch into the
    state and returns the new state DataFrame (id, component);
    ``sink`` is the foreachBatch callable. Read the current state from
    ``.state`` at any time (empty before the first non-empty batch).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.state: DataFrame = spark.createDataFrame(
            [], "id long, component long"
        ).localCheckpoint()

    def update(self, batch_edges: DataFrame) -> DataFrame:
        b = (
            batch_edges.select(
                F.col("src").cast("long"), F.col("dst").cast("long")
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        if b.isEmpty():
            return self.state
        st = self.state
        # 1. contract: endpoints -> current labels (unseen -> self)
        rel = (
            b.join(
                st.select(
                    F.col("id").alias("src"), F.col("component").alias("cs")
                ),
                "src",
                "left",
            )
            .join(
                st.select(
                    F.col("id").alias("dst"), F.col("component").alias("cd")
                ),
                "dst",
                "left",
            )
            .select(
                F.coalesce("cs", F.col("src")).alias("src"),
                F.coalesce("cd", F.col("dst")).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
        )
        batch_ids = (
            b.select(F.col("src").alias("id"))
            .unionByName(b.select(F.col("dst").alias("id")))
            .distinct()
        )
        fresh_ids = batch_ids.join(st.select("id"), "id", "left_anti")
        if rel.isEmpty():
            # every batch edge lies inside one existing component (an
            # edge touching a brand-new vertex always survives the
            # contraction, since an unseen id can never equal an
            # existing label). State is already correct.
            return self.state
        # 2. solve the contracted graph (<= 2|batch| vertices)
        nl = connected_components(Graph.from_undirected_edges(rel))
        # 3a. rewrite old labels map-side (nl is batch-sized)
        upd = nl.select(
            F.col("id").alias("component"), F.col("component").alias("nc")
        )
        merged = st.join(F.broadcast(upd), "component", "left").select(
            "id", F.coalesce("nc", "component").alias("component")
        )
        # 3b. brand-new vertices stand for themselves in the contracted
        # graph (an unseen id never equals an existing label, so every
        # edge incident to one survives contraction), so each appears
        # in nl — inner-join their labels directly
        fresh_labeled = fresh_ids.join(F.broadcast(nl), "id").select(
            "id", "component"
        )
        self.state = merged.unionByName(fresh_labeled).localCheckpoint()
        return self.state

    def sink(self, batch: DataFrame, batch_id: int) -> None:
        self.update(batch)

    def save(self, root: str, epoch: int = 0) -> None:
        """Durable epoch of the (id, component) state — see
        ``streaming.state`` for the resume contract (updates here are
        idempotent: re-folding a replayed batch is a no-op)."""
        from centrality_gpu_spark.streaming.state import save_frames

        save_frames(self.spark, root, {"state": self.state}, epoch)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "StreamingComponents":
        from centrality_gpu_spark.streaming.state import load_frames

        got = load_frames(spark, root, ["state"])
        if got is None:
            raise FileNotFoundError(f"no verifiable epoch under {root}")
        acc = cls(spark)
        acc.state = got[0]["state"].localCheckpoint()
        return acc


def run_components_stream(
    stream_edges: DataFrame,
    acc: StreamingComponents,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a streaming (src, dst) edge DataFrame into the accumulator
    via foreachBatch. Returns the started query."""
    writer = stream_edges.writeStream.foreachBatch(acc.sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
