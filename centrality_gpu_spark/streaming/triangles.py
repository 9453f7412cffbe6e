"""Streaming exact triangle counting over an append-only edge stream.

Every triangle is counted exactly once — in the batch where its LAST
edge arrives. For a batch B (deduped against the accumulated edge set
H), classify each new triangle by how many of its edges are new:

- ``per_edge = Σ_{e∈B} |N_{H∪B}(u) ∩ N_{H∪B}(v)|`` counts a j-new-edge
  triangle j times (j ∈ {1,2,3});
- ``n1 = Σ_{e∈B} |N_H(u) ∩ N_H(v)|`` counts exactly the 1-new-edge
  triangles (the two other edges are old);
- ``th3 = Σ_{e∈B} |N_B(u) ∩ N_B(v)|`` = 3 × the all-new triangles.

So ``new = n1 + (per_edge − n1 − th3)/2 + th3/3``. All three sums are
one (batch ⋈ adjacency ⋈ adjacency) count each — integer-exact, cost
∝ Σ_{e∈B} (deg u + deg v), never a rescan of history. State is the
canonical undirected edge set H (the minimum any exact counter must
hold) plus a running total; duplicate and re-sent edges dedup against H
so replays are no-ops (tested).

This is the classic exact streaming-triangles shape (the batch
operator's compact-forward orientation is NOT usable here: degree
ranks shift as edges arrive, so an incremental counter anchors on
edge arrival time instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("u"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _sym(canon: DataFrame) -> DataFrame:
    return canon.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        canon.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )


def _common_count(batch: DataFrame, adj: DataFrame) -> int:
    """Σ over batch edges (u,v) of |{w : (u,w) ∈ adj and (v,w) ∈ adj}|."""
    j = (
        batch.join(
            adj.select(F.col("a").alias("u"), F.col("b").alias("w")), "u"
        )
        .join(adj.select(F.col("a").alias("v"), F.col("b").alias("w")), ["v", "w"])
    )
    return j.count()


class StreamingTriangles:
    """foreachBatch accumulator for the exact global triangle count.

    ``update(batch_edges)`` folds one static (src, dst) batch and
    returns the running total; read it any time from ``.total``.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.total = 0
        self.edges: DataFrame = spark.createDataFrame(
            [], "u long, v long"
        ).localCheckpoint()

    def update(self, batch_edges: DataFrame) -> int:
        b = _canon(batch_edges).join(self.edges, ["u", "v"], "left_anti")
        b = b.localCheckpoint()
        if b.isEmpty():
            return self.total
        union = self.edges.unionByName(b)
        per_edge = _common_count(b, _sym(union))
        n1 = _common_count(b, _sym(self.edges))
        th3 = _common_count(b, _sym(b))
        assert (per_edge - n1 - th3) % 2 == 0 and th3 % 3 == 0
        self.total += n1 + (per_edge - n1 - th3) // 2 + th3 // 3
        self.edges = union.localCheckpoint()
        return self.total

    def sink(self, batch: DataFrame, batch_id: int) -> None:
        self.update(batch)

    def save(self, root: str, epoch: int = 0) -> None:
        """Durable epoch of (edge set, running total) — see
        ``streaming.state`` for the resume contract."""
        from centrality_gpu_spark.streaming.state import save_frames

        save_frames(
            self.spark, root, {"edges": self.edges}, epoch,
            extra={"total": self.total},
        )

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "StreamingTriangles":
        from centrality_gpu_spark.streaming.state import load_frames

        got = load_frames(spark, root, ["edges"])
        if got is None:
            raise FileNotFoundError(f"no verifiable epoch under {root}")
        frames, extra = got
        acc = cls(spark)
        acc.edges = frames["edges"].localCheckpoint()
        acc.total = int(extra["total"])
        return acc


def run_triangles_stream(
    stream_edges: DataFrame,
    acc: StreamingTriangles,
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
