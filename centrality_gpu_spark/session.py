"""SparkSession construction with the engine's standard configuration.

Local-mode defaults are tuned for the sandbox (single JVM, 32 threads,
128 GiB); on a real cluster the same builder is used with ``master`` and
memory knobs supplied by spark-submit. AQE is always on — it supplies
runtime skew-join splitting and partition coalescing, which together
with explicit hub salting (operators/superstep.py block_edges) is our
answer to power-law hub-vertex skew.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "centrality_gpu_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``cores=None`` → ``local[*]``. ``shuffle_partitions`` defaults to
    the core count (local mode): the guide's "200 is wrong for both
    tiny and huge" rule. On a cluster, pass ~2-3× total executor cores.
    """
    cores_str = "*" if cores is None else str(cores)
    if shuffle_partitions is not None:
        n_shuffle = shuffle_partitions
    elif cores is not None:
        n_shuffle = cores
    else:
        n_shuffle = os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_MASTER", f"local[{cores_str}]")
        )
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
