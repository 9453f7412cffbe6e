"""Streaming word-histogram accumulation over a document stream.

Maintains the (word, cnt) table ``operators.bpe.word_histogram``
computes in batch — the BPE-training input — incrementally: each
``update(batch_docs)`` folds one batch's histogram into the state with
a single outer-merge groupBy (cost ∝ batch vocabulary, history never
rescanned). Unlike the other accumulators, counts are NOT idempotent
under replay, so re-sent doc_ids are deduped against the seen-id set
(same first-writer-wins contract as the dedup accumulator); with that,
any batch split in any order folds to exactly the batch histogram
(tested). State = the histogram + seen doc_ids, both riding the
package's durable verified-epoch save/load.

The operational pattern: accumulate at ingestion, periodically
``bpe_train`` on ``.histogram`` (an O(vocab) job regardless of corpus
size) to refit the tokenizer as the corpus distribution drifts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.bpe import word_histogram


class StreamingWordHistogram:
    """foreachBatch accumulator for the corpus word-type histogram."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.histogram: DataFrame = spark.createDataFrame(
            [], "word string, cnt long"
        ).localCheckpoint()
        self.seen: DataFrame = spark.createDataFrame(
            [], "doc_id long"
        ).localCheckpoint()

    def update(self, batch_docs: DataFrame) -> DataFrame:
        b = (
            batch_docs.select("doc_id", "text")
            .dropDuplicates(["doc_id"])
            .join(self.seen, "doc_id", "left_anti")
            .localCheckpoint()
        )
        if b.isEmpty():
            return self.histogram
        bh = word_histogram(b)
        self.histogram = (
            self.histogram.unionByName(bh)
            .groupBy("word")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .localCheckpoint()
        )
        self.seen = self.seen.unionByName(
            b.select("doc_id")
        ).localCheckpoint()
        return self.histogram

    def sink(self, batch: DataFrame, batch_id: int) -> None:
        self.update(batch)

    def save(self, root: str, epoch: int = 0) -> None:
        from centrality_gpu_spark.streaming.state import save_frames

        save_frames(
            self.spark, root,
            {"histogram": self.histogram, "seen": self.seen}, epoch,
        )

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "StreamingWordHistogram":
        from centrality_gpu_spark.streaming.state import load_frames

        got = load_frames(spark, root, ["histogram", "seen"])
        if got is None:
            raise FileNotFoundError(f"no verifiable epoch under {root}")
        acc = cls(spark)
        acc.histogram = got[0]["histogram"].localCheckpoint()
        acc.seen = got[0]["seen"].localCheckpoint()
        return acc
