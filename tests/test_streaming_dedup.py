"""Streaming MinHash-LSH dedup: the union of per-batch emitted pairs
must equal the batch minhash_dedup pair set on the full corpus, in any
batch order, with each pair emitted exactly once and replayed docs
deduped to no-ops."""

import shutil
import time

import numpy as np
import pytest

from centrality_gpu_spark.operators.dedup import minhash_dedup
from centrality_gpu_spark.streaming.dedup import (
    StreamingMinHashDedup,
    run_dedup_stream,
)

from tests.conftest import TESTDATA

SF_SMALL = f"{TESTDATA}/sf0.001"
DOCS = 160  # enough for a few dozen verified pairs, fast enough for CI


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where(f"doc_id < {DOCS}")
        .select("doc_id", "text")
    )


def _pairs(df):
    return sorted(
        (r.doc_a, r.doc_b, r.jaccard) for r in df.collect()
    )


@pytest.mark.parametrize("perm_seed", [None, 23])
def test_chunked_pairs_equal_batch(spark, perm_seed):
    docs = _docs(spark)
    exp = _pairs(minhash_dedup(docs, threshold=0.5))
    assert len(exp) > 0  # the fixture must actually exercise pairs
    rows = docs.collect()
    if perm_seed is not None:
        rng = np.random.default_rng(perm_seed)
        rows = [rows[i] for i in rng.permutation(len(rows))]
    acc = StreamingMinHashDedup(spark, threshold=0.5)
    emitted = []
    for chunk in np.array_split(np.arange(len(rows)), 4):
        out = acc.update(
            spark.createDataFrame(
                [(rows[i].doc_id, rows[i].text) for i in chunk],
                "doc_id long, text string",
            )
        )
        emitted.extend(_pairs(out))
    # union equals batch AND no pair was emitted twice
    assert len(emitted) == len(set((a, b) for a, b, _ in emitted))
    assert sorted(emitted) == exp
    assert _pairs(acc.pairs) == exp


def test_replayed_docs_are_noops(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    acc = StreamingMinHashDedup(spark, threshold=0.5)
    first = acc.update(spark.createDataFrame(rows, "doc_id long, text string"))
    assert first.count() == 1
    # replay both docs (one with mutated text: first writer wins)
    replay = [(1, rows[0][1]), (2, "completely different text now")]
    again = acc.update(
        spark.createDataFrame(replay, "doc_id long, text string")
    )
    assert again.count() == 0
    assert acc.pairs.count() == 1
    assert acc.shingles.count() == 2


def test_real_stream_equals_batch(spark, tmp_path):
    docs = _docs(spark).where("doc_id < 80")
    exp = _pairs(minhash_dedup(docs, threshold=0.5))
    in_dir = str(tmp_path / "docs_in")
    rows = docs.collect()
    half = len(rows) // 2
    for part in (rows[:half], rows[half:]):
        spark.createDataFrame(
            [(r.doc_id, r.text) for r in part], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(in_dir)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    acc = StreamingMinHashDedup(spark, threshold=0.5)
    q = run_dedup_stream(stream, acc, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert _pairs(acc.pairs) == exp
    shutil.rmtree(tmp_path, ignore_errors=True)
