"""Streaming earliest-arrival: batch-chunked accumulation must equal
the one-shot batch fixpoint when chunks arrive in ts order."""

import shutil
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.temporal import earliest_arrival
from centrality_gpu_spark.streaming.temporal import (
    StreamingArrival,
    run_arrival_stream,
)


def _random_temporal(seed, n=30, m=200, tmax=1000):
    rng = np.random.default_rng(seed)
    edges = [
        (int(rng.integers(n)), int(rng.integers(n)), int(rng.integers(1, tmax)))
        for _ in range(m)
    ]
    return [(u, v, t) for u, v, t in edges if u != v]


def _batch_fixpoint(spark, edges, sources):
    e = spark.createDataFrame(edges, "src long, dst long, ts long")
    s = spark.createDataFrame([(x,) for x in sources], "id long")
    return {
        r.id: r.arrival
        for r in earliest_arrival(e, s, rounds=128, to_fixpoint=True).collect()
    }


@pytest.mark.parametrize("seed", [5, 9])
def test_chunked_accumulation_equals_batch(spark, seed):
    edges = sorted(_random_temporal(seed), key=lambda e: e[2])
    sources = [0, 1]
    exp = _batch_fixpoint(spark, edges, sources)
    acc = StreamingArrival(
        spark, spark.createDataFrame([(x,) for x in sources], "id long")
    )
    # split at ts boundaries into 4 ordered chunks
    for chunk in np.array_split(np.arange(len(edges)), 4):
        batch = [edges[i] for i in chunk]
        acc.update(spark.createDataFrame(batch, "src long, dst long, ts long"))
    got = {r.id: r.arrival for r in acc.state.collect()}
    assert got == exp


def test_empty_batch_is_noop(spark):
    acc = StreamingArrival(spark, spark.createDataFrame([(0,)], "id long"))
    before = {r.id: r.arrival for r in acc.state.collect()}
    acc.update(spark.createDataFrame([], "src long, dst long, ts long"))
    assert {r.id: r.arrival for r in acc.state.collect()} == before


def test_real_stream_equals_batch(spark, tmp_path):
    """Drive an actual file-source stream (availableNow) through
    foreachBatch and compare against the batch fixpoint."""
    edges = sorted(_random_temporal(11, n=20, m=120), key=lambda e: e[2])
    sources = [0]
    exp = _batch_fixpoint(spark, edges, sources)

    in_dir = str(tmp_path / "edges_in")
    # two ts-ordered parquet files = two micro-batches (maxFilesPerTrigger)
    half = len(edges) // 2
    for i, part in enumerate((edges[:half], edges[half:])):
        spark.createDataFrame(part, "src long, dst long, ts long").coalesce(
            1
        ).write.mode("append").parquet(in_dir)
        time.sleep(1.1)  # distinct mtimes: the file source reads oldest-first
    stream = (
        spark.readStream.schema("src long, dst long, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    acc = StreamingArrival(
        spark, spark.createDataFrame([(x,) for x in sources], "id long")
    )
    q = run_arrival_stream(stream, acc, str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = {r.id: r.arrival for r in acc.state.collect()}
    assert got == exp
    shutil.rmtree(tmp_path, ignore_errors=True)
