"""k-core decomposition — the generalization of pendant peeling (G1).

``k_core(graph, k)``: iteratively remove vertices with degree < k until
none remain (the reference's pendant peel is exactly the k=2 loop with
a round cap, ``pendant_graph.cpp:9-58``). Each round is one degree
aggregation + two anti-joins; rounds are O(peeling depth). Unlike the
reference's fixed 5-round cap, the loop runs to an actual fixpoint —
a capped loop would silently return a subgraph that is *not* a k-core
(e.g. a long path under k=2 peels one vertex per round from each end).

``core_numbers``: SINGLE peeling pass with a running k (Batagelj-
Zaversnik style, distributed): peel all degree<k vertices assigning
``core = k-1`` on removal; when a round removes nothing, jump k to
(min remaining degree)+1. Total rounds = peel depth summed over
k-phases — one sequential pass over the degeneracy ordering, NOT
O(k_max) independent k-core reruns (each round shrinks the edge set,
and no work is repeated across k values).
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
    max_rounds: int | None = None,
    checkpoint: CheckpointManager | None = None,
) -> Graph:
    """The maximal subgraph where every vertex has degree ≥ k.

    Runs to fixpoint. ``max_rounds`` is a safety valve only: if set and
    exceeded, raises RuntimeError rather than returning a subgraph that
    is not a k-core.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = ckpt.truncate(graph.edges.select("src", "dst", "weight"))
    rnd = 0
    while True:
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
        rnd += 1
        if max_rounds is not None and rnd >= max_rounds:
            raise RuntimeError(
                f"k_core(k={k}) did not converge within max_rounds={max_rounds}"
            )
    return Graph.from_symmetric_edges(edges)


@with_iterative_conf
def core_numbers(
    graph: Graph,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, core) — largest k such that the vertex survives the k-core.

    Single distributed peel: vertices removed while processing level k
    have core number k-1; k jumps to (min remaining degree)+1 whenever a
    round is quiescent, so levels with no removals cost one aggregation,
    not a full re-peel. Vertices stranded with zero remaining edges are
    caught by the left-join (degree NULL → 0 < k).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    spark = graph.spark
    edges = ckpt.truncate(graph.edges.select("src", "dst"))
    remaining = ckpt.truncate(graph.vertices())
    peeled: list[DataFrame] = []
    rnd = 0
    # first k: nothing peels below the min degree, start there
    row = edges.groupBy("src").agg(F.count("*").alias("d")).agg(F.min("d")).collect()
    if row[0][0] is None:
        return spark.createDataFrame([], "id long, core int")
    k = int(row[0][0]) + 1
    while True:
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
        cur = remaining.join(deg, "id", "left").select(
            "id", F.coalesce("degree", F.lit(0)).alias("degree")
        )
        weak = cur.where(F.col("degree") < k).select("id")
        weak = ckpt.truncate(weak)
        n_weak = weak.count()
        ckpt.record(op="core_numbers", k=k, round=rnd, removed=n_weak)
        rnd += 1
        if n_weak == 0:
            nxt = cur.agg(F.min("degree")).collect()[0][0]
            if nxt is None:  # remaining is empty — done
                break
            k = int(nxt) + 1
            continue
        peeled.append(weak.select("id", F.lit(k - 1).cast("int").alias("core")))
        remaining = ckpt.truncate(remaining.join(weak, "id", "left_anti"))
        if remaining.isEmpty():
            break
        edges = ckpt.truncate(
            edges.join(weak, edges.src == weak.id, "left_anti")
            .join(weak, edges.dst == weak.id, "left_anti")
        )
    from centrality_gpu_spark.graph import union_all

    if not peeled:
        return spark.createDataFrame([], "id long, core int")
    return union_all(peeled)
