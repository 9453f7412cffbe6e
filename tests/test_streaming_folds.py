"""The registry's streaming-fold rows (VERDICT r04 item #3): folding
the parquet through an incremental accumulator in deterministic md5
chunks must equal the one-shot batch operator — the same contract the
streaming suite pins, here exercised through the exact callables the
driver gate runs."""

import __spark_entry__ as entry
from tests.conftest import SF_SMALL


def test_components_fold_equals_batch(spark):
    from centrality_gpu_spark.operators.components import (
        connected_components,
    )
    from centrality_gpu_spark.sources.testdata_graphs import events_graph

    got = {
        r.id: r.component
        for r in entry._q_streaming_components_fold_events(
            spark, SF_SMALL
        ).collect()
    }
    exp = {
        r.id: r.component
        for r in connected_components(events_graph(spark, SF_SMALL)).collect()
    }
    assert got == exp and len(got) > 0


def test_triangles_fold_equals_batch(spark):
    from centrality_gpu_spark.operators.triangles import triangle_count
    from centrality_gpu_spark.sources.testdata_graphs import copurchase_graph

    got = entry._q_streaming_triangles_fold_copurchase(
        spark, SF_SMALL
    ).collect()[0].n_triangles
    exp = triangle_count(copurchase_graph(spark, SF_SMALL)).collect()[0][
        "n_triangles"
    ]
    assert got == exp and got > 0


def test_vocab_fold_equals_batch(spark):
    from centrality_gpu_spark.operators.bpe import word_histogram

    got = {
        (r.word, r.cnt)
        for r in entry._q_streaming_vocab_fold(spark, SF_SMALL).collect()
    }
    exp = {
        (r.word, r.cnt)
        for r in word_histogram(entry._docs(spark, SF_SMALL)).collect()
    }
    assert got == exp and len(got) > 0


def test_dedup_fold_equals_batch(spark):
    from centrality_gpu_spark.operators.dedup import minhash_dedup

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in entry._q_streaming_dedup_fold(spark, SF_SMALL).collect()
    }
    exp = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_dedup(
            entry._docs(spark, SF_SMALL), threshold=0.5
        ).collect()
    }
    assert got == exp and len(got) > 0
