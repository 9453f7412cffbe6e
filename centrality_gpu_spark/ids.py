"""Distributed deterministic id assignment utilities.

``dense_rank_ids`` replaces the classic ``row_number().over(
Window.orderBy(...))`` global-rank idiom — a single-partition window
that funnels the whole input through one task — with a two-phase
prefix sum that yields bit-identical ranks fully in parallel. Shared
by the transcript vertex relabeler (P3, ``modified_apsp.cpp:336-358``)
and any operator needing a deterministic global rank (e.g. the
partitioner's community packing).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_rank_ids(names: DataFrame, order_cols: tuple[str, ...]) -> DataFrame:
    """0..n−1 ids in ``order_cols`` sort order, with no global window.

    The r3-flagged shape was ``row_number().over(Window.orderBy(...))``
    — a single-partition window that funnels the entire vertex set
    through one task (Spark itself warns ``WindowExec: No Partition
    Defined``). This is the same two-phase prefix-sum pattern as
    ``corpus.pack_sequences``: range-repartition on the sort key +
    local sort (a normal parallel sort shuffle), one tiny
    per-partition-count job, broadcast cumulative offsets, then
    partition-local ranks in an Arrow-batched ``mapInPandas``. Ids are
    bit-identical to the old window's (same total order), so the
    DuckDB twins stay hash-green; cost is one extra O(P)-row job
    instead of an O(n) single-task sort.

    ``order_cols`` must be a unique key of ``names`` (ties would make
    the rank nondeterministic — same contract the window had). The
    input must not already carry an ``id`` or ``pid`` column — ``id``
    is the output rank and ``pid`` the internal partition stamp.
    """
    reserved = {"id", "pid"} & set(names.columns)
    if reserved:
        raise ValueError(
            f"dense_rank_ids: input columns {sorted(reserved)} are "
            "reserved (id = output rank, pid = internal partition "
            "stamp); rename them first"
        )
    cols = list(order_cols)
    n_part = int(
        names.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # localCheckpoint pins the sampled range boundaries: the counts job
    # and the rank job below MUST see identical partitioning, and a
    # re-executed repartitionByRange may re-sample.
    stamped = (
        names.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r.pid: r.c
        for r in stamped.groupBy("pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    payload_cols = [c for c, _ in names.dtypes]
    out_schema = ", ".join(
        ["id long"] + [f"{c} {t}" for c, t in names.dtypes]
    )

    def assign(batches):
        import pandas as pd

        seen = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["pid"].iloc[0])
            start = offsets[pid] + seen.get(pid, 0)
            seen[pid] = seen.get(pid, 0) + len(pdf)
            data = {"id": np.arange(start, start + len(pdf), dtype="int64")}
            for c in payload_cols:
                data[c] = pdf[c].to_numpy()
            yield pd.DataFrame(data)

    return stamped.mapInPandas(assign, out_schema)
