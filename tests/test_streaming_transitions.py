"""Streaming tool transitions (delta/retraction emission): summed
deltas must equal the batch tool_transitions pair counts under ANY
delivery order, with replays as no-ops."""

import numpy as np
import pandas as pd
import pytest

from centrality_gpu_spark.datagen import generate_transcripts
from centrality_gpu_spark.sources.transcripts import tool_transitions
from centrality_gpu_spark.streaming.transitions import (
    _insert_deltas,
    streaming_tool_transitions,
)


# ---------------------------------------------------------------- unit


def test_insert_in_order_emits_successive_pairs():
    idxs, tools, deltas = [], [], []
    for i, t in enumerate(["a", "b", "c"]):
        idxs, tools, d = _insert_deltas(idxs, tools, [(i, t)])
        deltas += d
    assert deltas == [("a", "b", 1), ("b", "c", 1)]


def test_out_of_order_insert_retracts_split_pair():
    idxs, tools, d1 = _insert_deltas([], [], [(0, "a"), (4, "c")])
    assert d1 == [("a", "c", 1)]
    # turn 2 lands between them: retract (a,c), add (a,b) and (b,c)
    idxs, tools, d2 = _insert_deltas(idxs, tools, [(2, "b")])
    assert d2 == [("a", "c", -1), ("a", "b", 1), ("b", "c", 1)]
    assert idxs == [0, 2, 4] and tools == ["a", "b", "c"]


def test_replay_is_noop():
    idxs, tools, _ = _insert_deltas([], [], [(0, "a"), (1, "b")])
    idxs2, tools2, d = _insert_deltas(idxs, tools, [(1, "b"), (0, "a")])
    assert d == [] and idxs2 == [0, 1] and tools2 == ["a", "b"]


def test_delta_sum_equals_pairs_any_order():
    """Random permutations: summed deltas == the in-order pair
    multiset."""
    rng = np.random.default_rng(3)
    turns = [(i, f"t{int(rng.integers(4))}") for i in range(30)]
    want = {}
    ordered = [t for _, t in sorted(turns)]
    for a, b in zip(ordered, ordered[1:]):
        want[(a, b)] = want.get((a, b), 0) + 1
    for _ in range(5):
        perm = [turns[i] for i in rng.permutation(len(turns))]
        idxs, tools, acc = [], [], {}
        for chunk_start in range(0, len(perm), 7):
            idxs, tools, d = _insert_deltas(
                idxs, tools, perm[chunk_start:chunk_start + 7]
            )
            for a, b, dl in d:
                acc[(a, b)] = acc.get((a, b), 0) + dl
        assert {k: v for k, v in acc.items() if v} == want


# ------------------------------------------------- streaming ≡ batch


def test_stream_deltas_converge_to_batch(spark, tmp_path):
    tr = generate_transcripts(
        spark, n_conversations=25, seed=9, embed_samples=False
    )
    rows = tr.collect()
    rng = np.random.default_rng(4)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    # replay ~10% in a later chunk: must be no-ops
    replay = [rows[i] for i in rng.choice(len(rows), len(rows) // 10)]
    chunks = [rows[: len(rows) // 2], rows[len(rows) // 2:], replay]
    in_dir = str(tmp_path / "in")
    for part in chunks:
        spark.createDataFrame(part, tr.schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    stream = spark.readStream.schema(tr.schema).parquet(in_dir)
    out = streaming_tool_transitions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("trans_deltas")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("trans_deltas")
        .groupBy("src_tool", "dst_tool")
        .agg({"delta": "sum"})
        .withColumnRenamed("sum(delta)", "n")
        .where("n != 0")
        .toPandas()
        .set_index(["src_tool", "dst_tool"])["n"]
        .to_dict()
    )
    exp = (
        tool_transitions(tr)
        .toPandas()
        .set_index(["src_tool", "dst_tool"])["n"]
        .to_dict()
    )
    assert got == exp
