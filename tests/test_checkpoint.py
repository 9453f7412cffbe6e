"""Checkpoint / resume: kill-and-resume equivalence (north rule: runs
resume mid-algorithm after executor loss) and lineage metadata."""

import json
import os

import numpy as np
import pytest

from centrality_gpu_spark.operators.pagerank import pagerank
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, partition_lineage
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR


def ranks_of(df):
    return {r.id: r["rank"] for r in df.collect()}


def test_kill_and_resume_equivalence(spark, tmp_path):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test2.txt")
    # uninterrupted: 8 fixed iterations
    full = ranks_of(pagerank(g, fixed_iterations=8, mode="sql"))

    # "crashed" run: durable epoch every 2 iterations, stopped after 5
    ck1 = CheckpointManager(spark, root=str(tmp_path), every=2)
    pagerank(g, fixed_iterations=5, mode="sql", checkpoint=ck1)

    # fresh manager (new driver) resumes from the latest valid epoch
    ck2 = CheckpointManager(spark, root=str(tmp_path), every=2)
    ep = ck2.latest_epoch("pagerank")
    assert ep is not None and ep[0] == 4
    resumed = ranks_of(
        pagerank(g, fixed_iterations=8, mode="sql", checkpoint=ck2)
    )
    assert set(full) == set(resumed)
    for k in full:
        assert resumed[k] == pytest.approx(full[k], abs=1e-12)


def test_corrupt_epoch_is_skipped(spark, tmp_path):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    ck = CheckpointManager(spark, root=str(tmp_path), every=1)
    pagerank(g, fixed_iterations=3, mode="sql", checkpoint=ck)
    # corrupt the newest epoch's meta (row count mismatch)
    newest = os.path.join(str(tmp_path), "pagerank", "epoch=2", "_META.json")
    meta = json.load(open(newest))
    meta["partitions"] = [{"pid": 0, "rows": 999999, "hash": 0}]
    json.dump(meta, open(newest, "w"))
    ep = CheckpointManager(spark, root=str(tmp_path)).latest_epoch("pagerank")
    assert ep is not None and ep[0] == 1  # falls back to previous epoch


def test_partition_lineage_shape(spark):
    df = spark.range(1000).selectExpr("id", "id * 2 as v").repartition(4)
    lin = partition_lineage(df)
    assert sum(p["rows"] for p in lin) == 1000
    assert all("hash" in p for p in lin)


def test_metrics_recorded(spark):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/test1.txt")
    ck = CheckpointManager(spark)
    pagerank(g, fixed_iterations=3, mode="sql", checkpoint=ck)
    its = [m for m in ck.metrics if m.get("op") == "pagerank"]
    assert [m["iteration"] for m in its] == [0, 1, 2]
    assert all("secs" in m and "wall_ts" in m for m in its)

def test_cli_iceberg_preflight_error(spark, tmp_path):
    """This sandbox has no iceberg runtime jar: the cli must fail with
    an actionable message (spark-submit --packages/catalog conf) rather
    than a raw ClassNotFound stack."""
    import sys

    import pytest as _pytest

    from centrality_gpu_spark import cli

    argv = [
        "pagerank", "--input", str(tmp_path), "--input-format", "transcripts",
        "--table-format", "iceberg", "--output", str(tmp_path / "out"),
    ]
    with _pytest.raises(SystemExit, match="iceberg-spark-runtime"):
        cli.main(argv)
