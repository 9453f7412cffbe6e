"""Checkpoint / resume with per-partition lineage + per-iteration metrics.

The north rule requires every iterative algorithm to (a) truncate plan
lineage each superstep (else the Catalyst plan grows unboundedly — the
classic iterative-Spark failure), and (b) persist rank/frontier vectors
with enough metadata to resume mid-algorithm after executor loss.

Reference analog: the debug sinks + per-stage timing prints
(``modified_apsp.cpp:41-75``, ``main.cpp:45-50``) become structured
per-iteration metrics JSON; the memoized endpoint rows
(``kernels_active.cu:544-552``) become persisted epoch DataFrames.

Layout on disk::

    {root}/{name}/epoch={k}/part-*.parquet   (the vector)
    {root}/{name}/epoch={k}/_META.json       (iteration metrics + lineage)

``_META.json`` carries per-partition row counts and a per-partition
content hash (xxhash64 xor-aggregated), so a resumed run can verify the
epoch it loads and a monitoring job can diff lineage across epochs.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_FILE = "_META.json"


@contextmanager
def iterative_conf(spark: SparkSession):
    """Session conf scoped to an iterative superstep loop.

    AQE partition coalescing is great for one-shot relational queries
    but pathological for superstep loops: the per-iteration value
    vector is only a few MB, so the coalescer collapses the shuffle to
    1-2 partitions and serializes the per-block kernels (measured 4.5×
    slowdown and erratic 2s→20s iterations at 76M edges). Scope it off
    for the loop, restore after.
    """
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


# below this many *undirected* edges, per-superstep shuffles are tiny
# and AQE coalescing is a win (fewer near-empty tasks); above it the
# coalescer serializes real work and must be off
ITERATIVE_CONF_MIN_EDGES = 100_000


def with_iterative_conf(fn):
    """Decorator: run an operator whose body is a superstep loop under
    ``iterative_conf`` — but only for graphs big enough that the
    coalescer hurts (see ITERATIVE_CONF_MIN_EDGES; for tiny graphs
    coalescing the near-empty shuffles is strictly better). The
    operator's first argument must be a Graph. The loop's jobs all
    execute inside the function (truncate/count per iteration), so
    scoping the conf to the call covers the hot path."""
    import functools

    @functools.wraps(fn)
    def wrapper(graph, *args, **kwargs):
        if graph.num_edges() >= ITERATIVE_CONF_MIN_EDGES:
            with iterative_conf(graph.spark):
                return fn(graph, *args, **kwargs)
        return fn(graph, *args, **kwargs)

    return wrapper


def partition_lineage(df: DataFrame) -> list[dict[str, int]]:
    """Per-partition (row_count, content_hash). One extra job per call —
    only invoked on epochs actually written to disk."""
    hashed = df.select(
        F.spark_partition_id().alias("pid"),
        F.xxhash64(*df.columns).alias("h"),
    )
    rows = (
        hashed.groupBy("pid")
        # bit_xor, not sum: xxhash64 sums overflow long under ANSI mode
        .agg(F.count("*").alias("rows"), F.bit_xor("h").alias("hash"))
        .collect()
    )
    return [
        {"pid": r["pid"], "rows": r["rows"], "hash": int(r["hash"] or 0)}
        for r in sorted(rows, key=lambda r: r["pid"])
    ]


def verify_epoch_frame(df: DataFrame, meta: dict[str, Any]) -> bool:
    """True iff ``df`` matches the lineage recorded in ``meta``: total
    row count AND total content hash. The global bit_xor of per-row
    xxhash64 equals the xor of the recorded per-partition hashes, so the
    check is insensitive to how the re-read repartitions the files while
    still catching corrupted-but-count-preserving epochs."""
    got = df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.count("*").alias("rows"), F.bit_xor("h").alias("hash")
    ).collect()[0]
    exp_rows = sum(p["rows"] for p in meta["partitions"])
    exp_hash = 0
    for p in meta["partitions"]:
        exp_hash ^= p["hash"]
    return got["rows"] == exp_rows and int(got["hash"] or 0) == exp_hash


@dataclass
class CheckpointManager:
    """Manages epoch persistence for one run.

    ``root=None`` → lineage truncation only (localCheckpoint), nothing
    written to disk. ``every=k`` → durable epoch every k iterations.
    """

    spark: SparkSession
    root: str | None = None
    every: int = 5
    metrics: list[dict[str, Any]] = field(default_factory=list)

    # -- lineage truncation (every iteration) --------------------------

    def truncate(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """Cut Catalyst lineage. localCheckpoint is executor-local —
        cheap, survives within the app; durable epochs handle restarts.

        ``eager=False`` defers materialization to the caller's next
        action — use it when the loop immediately counts the result, so
        each superstep runs ONE job instead of two."""
        return df.localCheckpoint(eager=eager)

    # -- metrics --------------------------------------------------------

    def record(self, **kv: Any) -> dict[str, Any]:
        kv.setdefault("wall_ts", time.time())
        self.metrics.append(kv)
        return kv

    # -- durable epochs --------------------------------------------------

    def _epoch_dir(self, name: str, epoch: int) -> str:
        assert self.root is not None
        return os.path.join(self.root, name, f"epoch={epoch}")

    def should_save(self, epoch: int) -> bool:
        return self.root is not None and epoch % self.every == 0

    def save_epoch(self, df: DataFrame, name: str, epoch: int,
                   extra: dict[str, Any] | None = None) -> None:
        d = self._epoch_dir(name, epoch)
        df.write.mode("overwrite").parquet(d)
        meta = {
            "name": name,
            "epoch": epoch,
            "schema": df.schema.jsonValue(),
            "partitions": partition_lineage(self.spark.read.parquet(d)),
            "metrics": self.metrics[-1] if self.metrics else {},
            "extra": extra or {},
            "written_ts": time.time(),
        }
        with open(os.path.join(d, META_FILE), "w") as f:
            json.dump(meta, f)

    def latest_epoch(self, name: str) -> tuple[int, DataFrame, dict[str, Any]] | None:
        """Most recent epoch whose _META.json verifies (row count and
        content hash both match the recorded per-partition lineage)."""
        if self.root is None:
            return None
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return None
        epochs = sorted(
            (int(d.split("=", 1)[1]) for d in os.listdir(base) if d.startswith("epoch=")),
            reverse=True,
        )
        for ep in epochs:
            d = self._epoch_dir(name, ep)
            meta_path = os.path.join(d, META_FILE)
            if not os.path.exists(meta_path):
                continue
            with open(meta_path) as f:
                meta = json.load(f)
            df = self.spark.read.parquet(d)
            if verify_epoch_frame(df, meta):
                return ep, df, meta
        return None
