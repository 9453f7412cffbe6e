"""Pendant-vertex peeling (G1, ``pendant_graph.cpp:9-58``).

Iteratively removes vertices with degree ≤ 1, recording the removal
round and the parent (the single neighbor at removal time) — the
reference caps at 5 rounds (``pendant_graph.cpp:34``) and we default
the same. Disabled in the reference's main (``main.cpp:65``); here a
standalone graph-shrink operator: each round is one degree aggregation
+ two anti-joins, a k-core-style DataFrame loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def pendant_peel(
    graph: Graph,
    max_rounds: int = 5,
    checkpoint: CheckpointManager | None = None,
) -> tuple[Graph, DataFrame]:
    """Returns (remaining graph, peeled DF (id, round, parent)).

    ``parent`` is the vertex's single remaining neighbor when removed
    (null for isolated vertices peeled after their neighbor went).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = ckpt.truncate(graph.edges.select("src", "dst", "weight"))
    peeled_parts: list[DataFrame] = []

    for rnd in range(max_rounds):
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
        pend = deg.where(F.col("degree") <= 1).select("id")
        n_pend = pend.count()
        ckpt.record(op="pendant_peel", round=rnd, removed=n_pend)
        if n_pend == 0:
            break
        # parent = the one neighbor of each degree-1 vertex
        parents = (
            edges.join(pend, edges.src == pend.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("dst").alias("parent"))
        )
        peeled_parts.append(
            pend.join(parents, "id", "left").select(
                "id", F.lit(rnd).alias("round"), "parent"
            )
        )
        edges = ckpt.truncate(
            edges.join(pend, edges.src == pend.id, "left_anti")
            .join(pend, edges.dst == pend.id, "left_anti")
        )

    from centrality_gpu_spark.graph import union_all

    if peeled_parts:
        peeled = union_all(peeled_parts)
    else:
        peeled = graph.spark.createDataFrame([], "id long, round int, parent long")
    return Graph.from_symmetric_edges(edges), peeled
