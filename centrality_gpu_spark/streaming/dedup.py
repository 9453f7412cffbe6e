"""Streaming near-duplicate detection at ingestion (incremental
MinHash-LSH dedup over an append-only document stream).

Each ``update(batch_docs)`` folds one batch and returns the verified
near-dup pairs DISCOVERED by that batch — pairs whose later document
arrives in it (earlier-doc × new via the persistent bucket index, plus
new × new within the batch). Because both LSH candidacy (sharing ≥1
band bucket) and the exact-Jaccard verify are properties of the PAIR
alone — independent of arrival order — the union of emitted pairs over
any batch split, in any order, equals the batch operator
``operators.dedup.minhash_dedup`` on the full corpus, and every pair
is emitted exactly once (tested).

State is exactly what the batch operator materializes anyway:

- the band-bucket index (doc_id, band, bucket) — the probe target;
  each batch joins its own buckets against it, so history is touched
  only through the bucket key (the standard LSH index lookup; at scale
  this table is bucketed/Z-ordered by (band, bucket) so the probe is
  a co-located join, never a scan);
- the shingle sets (doc_id, shingles) for the exact verify — fetched
  only for candidate partners. A signature-only verify (est_jaccard)
  would shrink state to O(num_hashes) per doc at the price of
  estimator error; this accumulator keeps the batch operator's exact
  semantics.

Re-sent doc_ids are no-ops (first writer wins), so at-least-once
delivery folds to exactly-once pair emission — same contract as the
other incremental accumulators in this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NGRAM,
    DEFAULT_NUM_HASHES,
    band_buckets,
    minhash_signatures,
    with_shingles,
)

_PAIR_SCHEMA = "doc_a long, doc_b long, jaccard double"


class StreamingMinHashDedup:
    """foreachBatch accumulator for incremental MinHash-LSH dedup.

    ``update(batch_docs)`` takes a static (doc_id, text) batch and
    returns the new verified pairs (doc_a < doc_b, jaccard ≥
    threshold); ``.pairs`` accumulates all pairs emitted so far.
    """

    def __init__(
        self,
        spark: SparkSession,
        threshold: float = 0.5,
        num_hashes: int = DEFAULT_NUM_HASHES,
        bands: int = DEFAULT_BANDS,
        n: int = DEFAULT_NGRAM,
        hash_mode: str = "md5",
    ):
        self.spark = spark
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.n = n
        self.hash_mode = hash_mode
        self.buckets: DataFrame = spark.createDataFrame(
            [], "doc_id long, band int, bucket string"
        ).localCheckpoint()
        self.shingles: DataFrame = spark.createDataFrame(
            [], "doc_id long, shingles array<string>"
        ).localCheckpoint()
        self.pairs: DataFrame = spark.createDataFrame(
            [], _PAIR_SCHEMA
        ).localCheckpoint()

    def _empty_pairs(self) -> DataFrame:
        return self.spark.createDataFrame([], _PAIR_SCHEMA)

    def update(self, batch_docs: DataFrame) -> DataFrame:
        # replays / within-batch dup ids are no-ops (first writer wins)
        b = (
            batch_docs.select("doc_id", "text")
            .dropDuplicates(["doc_id"])
            .join(self.shingles.select("doc_id"), "doc_id", "left_anti")
            .localCheckpoint()
        )
        if b.isEmpty():
            return self._empty_pairs()
        bsh = with_shingles(b, self.n).localCheckpoint()
        bbk = band_buckets(
            minhash_signatures(b, self.num_hashes, self.n, self.hash_mode),
            self.num_hashes,
            self.bands,
            self.hash_mode,
        ).localCheckpoint()

        # old × new through the persistent index (keyed probe, no scan)
        on = self.buckets.select(
            "band", "bucket", F.col("doc_id").alias("old_id")
        ).join(
            bbk.select("band", "bucket", F.col("doc_id").alias("new_id")),
            ["band", "bucket"],
        ).select(
            F.least("old_id", "new_id").alias("doc_a"),
            F.greatest("old_id", "new_id").alias("doc_b"),
        )
        # new × new within the batch
        nn = bbk.select("band", "bucket", F.col("doc_id").alias("doc_a")).join(
            bbk.select("band", "bucket", F.col("doc_id").alias("doc_b")),
            ["band", "bucket"],
        ).where(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
        cand = on.unionByName(nn).distinct()

        allsh = self.shingles.unionByName(bsh)
        new_pairs = (
            cand.join(
                allsh.select(
                    F.col("doc_id").alias("doc_a"), F.col("shingles").alias("shA")
                ),
                "doc_a",
            )
            .join(
                allsh.select(
                    F.col("doc_id").alias("doc_b"), F.col("shingles").alias("shB")
                ),
                "doc_b",
            )
            .select(
                "doc_a",
                "doc_b",
                (
                    F.size(F.array_intersect("shA", "shB"))
                    / F.size(F.array_union("shA", "shB"))
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= self.threshold)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
            .localCheckpoint()
        )

        self.buckets = self.buckets.unionByName(bbk).localCheckpoint()
        self.shingles = allsh.localCheckpoint()
        self.pairs = self.pairs.unionByName(new_pairs).localCheckpoint()
        return new_pairs

    def sink(self, batch: DataFrame, batch_id: int) -> None:
        self.update(batch)

    def save(self, root: str, epoch: int = 0) -> None:
        """Durable epoch of (bucket index, shingle sets, emitted pairs)
        — see ``streaming.state`` for the resume contract (doc replays
        are first-writer-wins no-ops, so re-folding is safe)."""
        from centrality_gpu_spark.streaming.state import save_frames

        save_frames(
            self.spark,
            root,
            {
                "buckets": self.buckets,
                "shingles": self.shingles,
                "pairs": self.pairs,
            },
            epoch,
            extra={
                "threshold": self.threshold,
                "num_hashes": self.num_hashes,
                "bands": self.bands,
                "n": self.n,
                "hash_mode": self.hash_mode,
            },
        )

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "StreamingMinHashDedup":
        from centrality_gpu_spark.streaming.state import load_frames

        got = load_frames(spark, root, ["buckets", "shingles", "pairs"])
        if got is None:
            raise FileNotFoundError(f"no verifiable epoch under {root}")
        frames, x = got
        acc = cls(
            spark,
            threshold=float(x["threshold"]),
            num_hashes=int(x["num_hashes"]),
            bands=int(x["bands"]),
            n=int(x["n"]),
            hash_mode=str(x["hash_mode"]),
        )
        acc.buckets = frames["buckets"].localCheckpoint()
        acc.shingles = frames["shingles"].localCheckpoint()
        acc.pairs = frames["pairs"].localCheckpoint()
        return acc


def run_dedup_stream(
    stream_docs: DataFrame,
    acc: StreamingMinHashDedup,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a streaming (doc_id, text) DataFrame into the accumulator
    via foreachBatch. Returns the started query."""
    writer = stream_docs.writeStream.foreachBatch(acc.sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
