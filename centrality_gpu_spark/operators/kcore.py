"""k-core decomposition — the generalization of pendant peeling (G1).

``k_core(graph, k)``: iteratively remove vertices with degree < k until
none remain (the reference's pendant peel is exactly the k=2 loop with
a round cap, ``pendant_graph.cpp:9-58``). Each round is one degree
aggregation + two anti-joins; rounds are O(peeling depth).

``core_numbers``: per-vertex core number by running the peel at
increasing k — O(k_max · depth) supersteps; fine for the power-law
graphs this engine targets (k_max is small relative to V, and each
round shrinks the edge set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf


@with_iterative_conf
def k_core(
    graph: Graph,
    k: int,
    max_rounds: int = 100,
    checkpoint: CheckpointManager | None = None,
) -> Graph:
    """The maximal subgraph where every vertex has degree ≥ k."""
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = ckpt.truncate(graph.edges.select("src", "dst", "weight"))
    for rnd in range(max_rounds):
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
        weak = deg.where(F.col("degree") < k).select("id")
        n_weak = weak.count()
        ckpt.record(op="k_core", k=k, round=rnd, removed=n_weak)
        if n_weak == 0:
            break
        edges = ckpt.truncate(
            edges.join(weak, edges.src == weak.id, "left_anti")
            .join(weak, edges.dst == weak.id, "left_anti")
        )
    return Graph.from_symmetric_edges(edges)


def core_numbers(graph: Graph, max_k: int | None = None) -> DataFrame:
    """(id, core) — largest k such that the vertex survives the k-core."""
    spark = graph.spark
    result = graph.vertices().select("id", F.lit(0).alias("core"))
    current = graph
    k = 1
    while True:
        if max_k is not None and k > max_k:
            break
        current = k_core(current, k)
        survivors = current.vertices()
        if survivors.count() == 0:
            break
        result = (
            result.join(survivors.withColumn("c", F.lit(k)), "id", "left")
            .select("id", F.coalesce("c", "core").alias("core"))
        )
        result = result.localCheckpoint(eager=True)
        k += 1
    return result
