"""Batched multi-source BFS as frontier-join supersteps (G13 semantics).

The reference runs one BFS per GPU thread-block with a persistent
kernel and an atomic source queue (``kernels_free.cu:154-473``); here a
*batch* of sources advances together as one frontier DataFrame
``(source, vertex, dist, sigma)`` — B sources per wave amortize each
superstep's shuffle, the DataFrame analog of filling SMs
(``arrangelevels.cpp:56-146`` level batching).

Per superstep (all JVM-side):
- expand:  frontier ⋈ edges on vertex=src        (J1, the SpMV gather)
- dedup:   anti-join against the visited set      (U2, ≅ atomicCAS claim A2)
- combine: groupBy(source, vertex) sum(sigma)     (A1, σ path counting)

σ is float64: the reference's ull σ (``kernels.cuh:57``) only ever
enters results as the ratio σw/σv in float math
(``kernels_free.cu:391``), so float64 meets the 1e-6 bar without
overflow on big graphs.

The per-level frontier DataFrames are retained (reference keeps the
stack S + level endpoints, ``kernels_free.cu:274-283``) — they are the
reverse-order schedule for Brandes dependency accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf

FRONTIER_COLS = ("source", "vertex", "dist", "sigma")


@dataclass
class BFSResult:
    """visited: (source, vertex, dist, sigma) for every reached pair;
    levels[d]: the frontier at distance d (same schema)."""

    visited: DataFrame
    levels: list[DataFrame]


@with_iterative_conf
def multi_source_bfs(
    graph: Graph,
    sources: DataFrame,
    max_depth: int | None = None,
    checkpoint: CheckpointManager | None = None,
) -> BFSResult:
    """Level-synchronous BFS from every vertex in ``sources`` (col
    ``source``) simultaneously. Unit edge weights (reference semantics:
    all sample weights are 1, ``ReadMe:6-13``)."""
    spark = graph.spark
    ckpt = checkpoint or CheckpointManager(spark)
    edges = graph.edges_by_src()  # src-partitioned: only frontier shuffles per step
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def keyed(df: DataFrame) -> DataFrame:
        # co-partition on the anti-join key so the (growing) visited
        # side is never re-exchanged: the candidate aggregate comes out
        # of its groupBy already hash-partitioned on the same key
        return df.repartition(npart, "source", "vertex")

    frontier = sources.select(
        F.col("source").cast("long").alias("source"),
        F.col("source").cast("long").alias("vertex"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    )
    frontier = ckpt.truncate(keyed(frontier))
    visited = frontier
    visited.persist()
    levels = [frontier]
    retired: list[DataFrame] = []
    depth = 0
    while max_depth is None or depth < max_depth:
        depth += 1
        cand = frontier.join(edges, frontier.vertex == edges.src).select(
            "source", F.col("dst").alias("vertex"), "sigma"
        )
        # aggregate BEFORE the visited anti-join: contributions to a
        # newly discovered vertex all come from frontier vertices, and
        # rows for already-visited vertices are dropped whole — so
        # dedup first shrinks the anti-join input from Σdeg(frontier)
        # to |distinct candidates| with identical results (A1+A2, then U2)
        agg = cand.groupBy("source", "vertex").agg(F.sum("sigma").alias("sigma"))
        new_frontier = (
            agg.join(visited.select("source", "vertex"), ["source", "vertex"], "left_anti")
            .select("source", "vertex", F.lit(depth).alias("dist"), "sigma")
        )
        # lazy checkpoint: the count() below is the single action that
        # both materializes the truncated frontier and sizes it — one
        # job per superstep, not two
        new_frontier = ckpt.truncate(new_frontier, eager=False)
        n_new = new_frontier.count()
        ckpt.record(op="bfs", depth=depth, frontier=n_new)
        if n_new == 0:
            break
        new_visited = keyed(visited.unionByName(new_frontier.select(*FRONTIER_COLS)))
        if depth % 4 == 0:
            new_visited = ckpt.truncate(new_visited)  # bound plan lineage
        # persist lazily: the cache materializes inside the NEXT
        # superstep's anti-join (no extra per-level pass over the
        # growing set); retired copies are unpersisted at the end
        new_visited.persist()
        retired.append(visited)
        visited = new_visited
        frontier = new_frontier
        levels.append(new_frontier)
    for df in retired:
        df.unpersist()
    return BFSResult(visited, levels)


def multi_source_bfs_broadcast(graph: Graph, sources: DataFrame) -> DataFrame:
    """Broadcast-CSR fast path for batched BFS: same (source, vertex,
    dist, sigma) rows as ``multi_source_bfs(...).visited``, but each
    Spark task runs the direction-optimizing numpy forward kernel over
    a slice of sources against the broadcast CSR — no per-superstep
    shuffles at all. The right plan whenever the graph fits the
    broadcast limit (csrkernels.DEFAULT_BROADCAST_MAX_EDGES); the BSP
    superstep path is the fallback above it (see ``bfs_visited``).
    """
    import numpy as np
    import pandas as pd

    from centrality_gpu_spark.operators.csrkernels import (
        bfs_forward,
        csr_components,
        graph_to_csr,
    )

    spark = graph.spark
    ids, indptr, indices = graph_to_csr(graph)
    n = len(ids)
    # component labels ride the broadcast: one O(V+E) sweep on the
    # driver keeps every task's bottom-up levels component-local
    comp = csr_components(indptr, indices, n)
    bcast = spark.sparkContext.broadcast((ids, indptr, indices, comp))
    num_tasks = int(spark.conf.get("spark.sql.shuffle.partitions"))
    src_df = sources.select(F.col("source").cast("long")).repartition(num_tasks)

    def run_batch(batches):
        ids_, indptr_, indices_, comp_ = bcast.value
        n_ = len(ids_)
        for pdf in batches:
            for s in pdf["source"].to_numpy():
                pos = int(np.searchsorted(ids_, s))
                if pos >= n_ or ids_[pos] != s:
                    raise ValueError(f"unknown BFS source vertex id {s}")
                dist, sigma, _levels = bfs_forward(
                    indptr_, indices_, pos, n_, comp=comp_
                )
                reached = dist >= 0
                yield pd.DataFrame(
                    {
                        "source": np.full(int(reached.sum()), s, dtype=np.int64),
                        "vertex": ids_[reached],
                        "dist": dist[reached].astype(np.int32),
                        "sigma": sigma[reached],
                    }
                )

    return src_df.mapInPandas(
        run_batch, "source long, vertex long, dist int, sigma double"
    )


def bfs_visited(
    graph: Graph,
    sources: DataFrame,
    strategy: str = "auto",
    max_broadcast_edges: int | None = None,
) -> DataFrame:
    """(source, vertex, dist, sigma) for every reached pair — regime
    dispatcher: broadcast-CSR kernel under the size guard, BSP
    frontier-join supersteps above it."""
    from centrality_gpu_spark.operators.csrkernels import DEFAULT_BROADCAST_MAX_EDGES

    limit = max_broadcast_edges or DEFAULT_BROADCAST_MAX_EDGES
    if strategy == "auto":
        strategy = "broadcast" if graph.num_edges() * 2 <= limit else "bsp"
    if strategy == "broadcast":
        return multi_source_bfs_broadcast(graph, sources)
    if strategy == "bsp":
        return multi_source_bfs(graph, sources).visited
    raise ValueError(f"unknown strategy {strategy!r}")


def sssp_distances(graph: Graph, source: int) -> DataFrame:
    """Single-source unit-weight shortest-path distances: (vertex, dist)."""
    src_df = graph.spark.createDataFrame([(int(source),)], "source long")
    res = multi_source_bfs(graph, src_df)
    return res.visited.select("vertex", "dist")


@with_iterative_conf
def weighted_sssp(
    graph: Graph,
    source: int,
    max_iterations: int = 200,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Weighted single-source shortest paths: (vertex, dist).

    The reference's weighted path is a per-source binary-heap Dijkstra
    (☠ G19, ``apsp_graph.cpp:94-172``) — inherently sequential. The
    Spark-native equivalent is Bellman-Ford-style min-plus relaxation:
    each superstep relaxes all edges out of vertices improved last
    round (delta-stepping without buckets); converges in O(shortest-
    path-hop-diameter) supersteps. Non-negative weights assumed.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = graph.edges_by_src()
    dist = graph.spark.createDataFrame(
        [(int(source), 0.0)], "vertex long, dist double"
    )
    dist = ckpt.truncate(dist)
    frontier = dist  # vertices improved in the last round
    n_impr = 0
    for it in range(max_iterations):
        cand = (
            frontier.join(edges, frontier.vertex == edges.src)
            .select(F.col("dst").alias("vertex"),
                    (F.col("dist") + F.col("weight")).alias("nd"))
            .groupBy("vertex")
            .agg(F.min("nd").alias("nd"))
        )
        joined = cand.join(dist, "vertex", "left")
        improved = joined.where(
            F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
        ).select("vertex", F.col("nd").alias("dist"))
        improved = ckpt.truncate(improved)
        n_impr = improved.count()
        ckpt.record(op="weighted_sssp", iteration=it, improved=n_impr)
        if n_impr == 0:
            break
        dist = ckpt.truncate(
            dist.join(improved.select("vertex"), "vertex", "left_anti")
            .unionByName(improved)
        )
        frontier = improved
    else:
        if n_impr > 0:
            # the last round still improved distances: the result is not
            # a fixpoint — error out rather than return wrong distances
            raise RuntimeError(
                f"weighted_sssp did not converge within {max_iterations} "
                f"iterations ({n_impr} vertices still improving); raise "
                "max_iterations (hop diameter exceeds the cap)"
            )
    return dist


def diameter_estimate(graph: Graph, n_samples: int = 512, seed: int = 42) -> float:
    """Median BFS eccentricity over sampled sources (G14/O4,
    ``kernels_free.cu:447-470``): the reference samples 512 depths,
    bitonic-sorts, and takes the median to gate its edge-parallel mode.
    Here: one batched BFS wave + ``percentile_approx`` — the same
    small-diameter signal for strategy switching."""
    from pyspark.sql import functions as F

    samples = (
        graph.vertices()
        .orderBy(F.xxhash64(F.col("id") + F.lit(seed)))
        .limit(n_samples)
        .select(F.col("id").alias("source"))
    )
    res = multi_source_bfs(graph, samples)
    ecc = res.visited.groupBy("source").agg(F.max("dist").alias("ecc"))
    row = ecc.agg(F.percentile_approx("ecc", 0.5).alias("med")).collect()[0]
    return float(row["med"]) if row["med"] is not None else 0.0


def ego_network(
    graph: Graph, center: int, radius: int = 1
) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges) of the radius-hop ego network around
    ``center``: vertices = (id, dist) with dist ≤ radius (the center at
    0), edges = the INDUCED symmetric edge set (both endpoints inside —
    ``nx.ego_graph`` semantics, so radius-ring fringe edges between two
    ring vertices are kept, edges leaving the ball are not).

    One multi-source BFS (the shared regime dispatcher) + two
    membership semi-joins of the ball against the edge table — the
    standard neighborhood-extraction query of a link-graph store.
    """
    src = graph.spark.createDataFrame([(int(center),)], "source long")
    ball = (
        bfs_visited(graph, src)
        .where(F.col("dist") <= radius)
        .select(F.col("vertex").alias("id"), F.col("dist").cast("long"))
    )
    ids = ball.select("id")
    edges = (
        graph.edges.select("src", "dst")
        .join(ids.withColumnRenamed("id", "src"), "src")
        .join(ids.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst")
    )
    return ball, edges


def ego_network_oracle_sql(
    edges_cte: str,
    center: int | None = None,
    radius: int = 1,
    part: str = "vertices",
) -> str:
    """DuckDB twin of ``ego_network`` (``part`` = 'vertices' |
    'edges'); BFS distances via iterative frontier CTEs unrolled to
    ``radius`` (exact for any radius — the ball is defined by ≤ radius
    anyway). ``center=None`` picks the min-(degree, id) vertex — the
    same deterministic rule as ``Graph.min_degree_vertex``, so both
    engines choose the same center on any input."""
    center_sql = (
        str(center)
        if center is not None
        else (
            "(SELECT src FROM (SELECT src, COUNT(*) AS degree FROM edges "
            "GROUP BY src) ORDER BY degree, src LIMIT 1)"
        )
    )
    parts = [edges_cte, f"d0 AS (SELECT {center_sql} AS id, 0 AS dist)"]
    for r in range(radius):
        parts.append(
            f"""d{r + 1} AS (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM d{r}
    UNION ALL
    SELECT e.dst AS id, {r + 1} AS dist
    FROM edges e JOIN d{r} v ON e.src = v.id WHERE v.dist = {r}
  ) GROUP BY id
)"""
        )
    ball = f"d{radius}"
    if part == "vertices":
        final = (
            f"SELECT id, CAST(dist AS BIGINT) AS dist FROM {ball} "
            "ORDER BY id"
        )
    else:
        final = (
            f"SELECT e.src, e.dst FROM edges e\n"
            f"JOIN {ball} a ON e.src = a.id\n"
            f"JOIN {ball} b ON e.dst = b.id\n"
            "ORDER BY e.src, e.dst"
        )
    return "WITH " + ",\n".join(parts) + "\n" + final
