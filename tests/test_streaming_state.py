"""Durable save/load for the streaming accumulators: fold half the
stream, save, load into a FRESH accumulator, fold the rest — the result
must equal the never-restarted run (and the batch operator). Plus the
torn-save fallback: a partial newer epoch must fall back to the last
complete one, never mix states."""

import networkx as nx
import pytest

from centrality_gpu_spark.streaming.components import StreamingComponents
from centrality_gpu_spark.streaming.dedup import StreamingMinHashDedup
from centrality_gpu_spark.streaming.state import load_frames, save_frames
from centrality_gpu_spark.streaming.triangles import StreamingTriangles

from tests.conftest import TESTDATA

SF_SMALL = f"{TESTDATA}/sf0.001"


def _edges(seed=5, n=30, m=110):
    g = nx.gnm_random_graph(n, m, seed=seed)
    return [(int(u), int(v)) for u, v in g.edges()]


def test_triangles_save_load_resume(spark, tmp_path):
    edges = _edges()
    cold = StreamingTriangles(spark)
    half = len(edges) // 2
    cold.update(spark.createDataFrame(edges[:half], "src long, dst long"))
    cold.save(str(tmp_path / "tri"))

    warm = StreamingTriangles.load(spark, str(tmp_path / "tri"))
    assert warm.total == cold.total
    warm.update(spark.createDataFrame(edges[half:], "src long, dst long"))

    full = StreamingTriangles(spark)
    for chunk in (edges[:half], edges[half:]):
        full.update(spark.createDataFrame(chunk, "src long, dst long"))
    assert warm.total == full.total
    assert warm.edges.count() == full.edges.count()


def test_components_save_load_resume(spark, tmp_path):
    edges = _edges(seed=9)
    cold = StreamingComponents(spark)
    half = len(edges) // 2
    cold.update(spark.createDataFrame(edges[:half], "src long, dst long"))
    cold.save(str(tmp_path / "cc"))

    warm = StreamingComponents.load(spark, str(tmp_path / "cc"))
    warm.update(spark.createDataFrame(edges[half:], "src long, dst long"))

    g = nx.Graph(edges)
    want = {}
    for comp in nx.connected_components(g):
        lbl = min(comp)
        for v in comp:
            want[v] = lbl
    got = {r.id: r.component for r in warm.state.collect()}
    assert got == want


def test_dedup_save_load_resume(spark, tmp_path):
    from centrality_gpu_spark.operators.dedup import minhash_dedup

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where("doc_id < 120")
        .select("doc_id", "text")
    )
    exp = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_dedup(docs, threshold=0.5).collect()
    )
    rows = docs.collect()
    half = len(rows) // 2
    cold = StreamingMinHashDedup(spark, threshold=0.5)
    cold.update(
        spark.createDataFrame(
            [(r.doc_id, r.text) for r in rows[:half]], "doc_id long, text string"
        )
    )
    cold.save(str(tmp_path / "dd"))

    warm = StreamingMinHashDedup.load(spark, str(tmp_path / "dd"))
    assert warm.threshold == 0.5
    warm.update(
        spark.createDataFrame(
            [(r.doc_id, r.text) for r in rows[half:]], "doc_id long, text string"
        )
    )
    got = sorted((r.doc_a, r.doc_b, r.jaccard) for r in warm.pairs.collect())
    assert got == exp


def test_torn_save_falls_back_to_complete_epoch(spark, tmp_path):
    root = str(tmp_path / "torn")
    a0 = spark.createDataFrame([(1,)], "x long")
    b0 = spark.createDataFrame([(10,)], "y long")
    save_frames(spark, root, {"a": a0, "b": b0}, epoch=0)
    # epoch 1 crashed after writing only frame "a"
    a1 = spark.createDataFrame([(2,)], "x long")
    save_frames(spark, root, {"a": a1}, epoch=1)

    got = load_frames(spark, root, ["a", "b"])
    assert got is not None
    frames, _ = got
    assert [r.x for r in frames["a"].collect()] == [1]  # epoch 0, not 1
    assert [r.y for r in frames["b"].collect()] == [10]


def test_load_missing_root_returns_none(spark, tmp_path):
    assert load_frames(spark, str(tmp_path / "nope"), ["a"]) is None
    with pytest.raises(FileNotFoundError):
        StreamingTriangles.load(spark, str(tmp_path / "nope"))


def test_arrival_save_load_resume(spark, tmp_path):
    from centrality_gpu_spark.operators.temporal import earliest_arrival
    from centrality_gpu_spark.streaming.temporal import StreamingArrival

    # a ts-ordered handoff chain with a shortcut arriving later
    edges = [
        (0, 1, 10), (1, 2, 20), (0, 3, 25),
        (2, 4, 30), (3, 4, 35), (4, 5, 50),
    ]
    schema = "src long, dst long, ts long"
    srcs = spark.createDataFrame([(0,)], "id long")
    want = {
        r.id: r.arrival
        for r in earliest_arrival(
            spark.createDataFrame(edges, schema), srcs, rounds=16,
            to_fixpoint=True,
        ).collect()
    }

    cold = StreamingArrival(spark, srcs)
    cold.update(spark.createDataFrame(edges[:3], schema))
    cold.save(str(tmp_path / "ta"))
    warm = StreamingArrival.load(spark, str(tmp_path / "ta"))
    warm.update(spark.createDataFrame(edges[3:], schema))
    got = {r.id: r.arrival for r in warm.state.collect()}
    assert got == want


def test_word_histogram_chunked_equals_batch(spark, tmp_path):
    import numpy as np

    from centrality_gpu_spark.operators.bpe import word_histogram
    from centrality_gpu_spark.streaming.vocab import StreamingWordHistogram

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where("doc_id < 150")
        .select("doc_id", "text")
    )
    exp = sorted((r.word, r.cnt) for r in word_histogram(docs).collect())
    rows = docs.collect()
    rng = np.random.default_rng(31)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    acc = StreamingWordHistogram(spark)
    third = len(rows) // 3
    acc.update(spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows[:third]], "doc_id long, text string"))
    # replay the first chunk inside the second: must be a no-op
    acc.update(spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows[: 2 * third]],
        "doc_id long, text string"))
    acc.save(str(tmp_path / "wh"))
    warm = StreamingWordHistogram.load(spark, str(tmp_path / "wh"))
    warm.update(spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows[2 * third:]],
        "doc_id long, text string"))
    got = sorted((r.word, r.cnt) for r in warm.histogram.collect())
    assert got == exp
