"""Eccentricity, radius, diameter, center, periphery.

Same per-source BFS machinery as closeness (SURVEY.md §2.10, A8-style
per-source aggregate; the reference samples exactly this quantity for
its diameter heuristic, ``kernels_free.cu:447-470`` — here it is the
exact, exhaustive version of that sample). Eccentricity of u is the
max BFS distance over the vertices reachable from u (0 for isolated
vertices), so disconnected graphs are handled per component instead of
aborting like the reference (``graph_ear_decompos.h:141-149``).

Two physical strategies, dispatched by the same size guard as
closeness/betweenness:

- broadcast: CSR broadcast once, one numpy BFS-forward per source,
  sources fanned out with ``mapInPandas`` (no per-row Python);
- bsp: distributed frontier-join waves for graphs whose CSR does not
  fit the driver/executor broadcast budget.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph, union_all
from centrality_gpu_spark.operators.bfs import multi_source_bfs
from centrality_gpu_spark.operators.csrkernels import (
    DEFAULT_BROADCAST_MAX_EDGES,
    graph_to_csr,
)
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf


def eccentricity_broadcast(graph: Graph, num_tasks: int | None = None) -> DataFrame:
    """(id, ecc) — broadcast-CSR fast path (ecc over the reachable set)."""
    from centrality_gpu_spark.operators.csrkernels import csr_components

    spark = graph.spark
    ids, indptr, indices = graph_to_csr(graph)
    n = len(ids)
    comp = csr_components(indptr, indices, n)
    bcast = spark.sparkContext.broadcast((ids, indptr, indices, comp))
    if num_tasks is None:
        num_tasks = min(int(spark.conf.get("spark.sql.shuffle.partitions")), max(1, n))
    src_df = spark.createDataFrame(
        [(int(i),) for i in range(n)], "sid long"
    ).repartition(num_tasks)

    def run_batch(batches):
        from centrality_gpu_spark.operators.csrkernels import (
            msbfs_distance_stats_grouped,
        )

        ids_, indptr_, indices_, comp_ = bcast.value
        n_ = len(ids_)
        for pdf in batches:
            sids = pdf["sid"].to_numpy()
            _f, _r, _h, ecc = msbfs_distance_stats_grouped(
                indptr_, indices_, sids, n_, comp_
            )
            yield pd.DataFrame(
                {"id": ids_[sids], "ecc": ecc.astype(np.int64)}
            )

    return src_df.mapInPandas(run_batch, "id long, ecc long")


@with_iterative_conf
def eccentricity_bsp(
    graph: Graph,
    batch_size: int = 2048,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, ecc) via the distributed frontier-join BFS waves."""
    from centrality_gpu_spark.operators.betweenness import _source_waves

    ckpt = checkpoint or CheckpointManager(graph.spark)
    parts: list[DataFrame] = []
    for src_df in _source_waves(graph, None, batch_size, ckpt):
        bfs = multi_source_bfs(graph, src_df, checkpoint=ckpt)
        ecc = bfs.visited.groupBy("source").agg(F.max("dist").alias("ecc"))
        parts.append(ckpt.truncate(ecc))
    return union_all(parts).select(
        F.col("source").alias("id"), F.col("ecc").cast("long").alias("ecc")
    )


def eccentricity(
    graph: Graph,
    strategy: str = "auto",
    max_broadcast_edges: int = DEFAULT_BROADCAST_MAX_EDGES,
    **kwargs,
) -> DataFrame:
    """(id, ecc) — regime-dispatching front door."""
    if strategy == "auto":
        strategy = (
            "broadcast" if graph.num_edges() * 2 <= max_broadcast_edges else "bsp"
        )
    if strategy == "broadcast":
        return eccentricity_broadcast(graph, **kwargs)
    if strategy == "bsp":
        return eccentricity_bsp(graph, **kwargs)
    raise ValueError(f"unknown strategy {strategy!r}")


def graph_extent(graph: Graph, strategy: str = "auto", **kwargs) -> DataFrame:
    """One-row summary (radius, diameter, n_center, n_periphery):
    radius/diameter = min/max eccentricity; center/periphery = vertex
    counts attaining them (per-component semantics on disconnected
    graphs, like the per-vertex eccentricities they derive from)."""
    ecc = eccentricity(graph, strategy=strategy, **kwargs)
    ext = ecc.agg(
        F.min("ecc").alias("radius"), F.max("ecc").alias("diameter")
    )
    return (
        ecc.crossJoin(F.broadcast(ext))
        .agg(
            F.first("radius").alias("radius"),
            F.first("diameter").alias("diameter"),
            F.sum(
                F.when(F.col("ecc") == F.col("radius"), 1).otherwise(0)
            ).alias("n_center"),
            F.sum(
                F.when(F.col("ecc") == F.col("diameter"), 1).otherwise(0)
            ).alias("n_periphery"),
        )
        .select(
            F.col("radius").cast("long").alias("radius"),
            F.col("diameter").cast("long").alias("diameter"),
            F.col("n_center").cast("long").alias("n_center"),
            F.col("n_periphery").cast("long").alias("n_periphery"),
        )
    )


def eccentricity_weighted(graph: Graph, num_tasks: int | None = None) -> DataFrame:
    """(id, ecc) — weighted eccentricity: max Dijkstra distance over the
    reachable set (double; per-component semantics like the unweighted
    twin). Broadcast regime behind the weighted-CSR size guard."""
    from centrality_gpu_spark.operators.csrkernels import (
        dijkstra_forward,
        graph_to_csr_weighted,
    )

    spark = graph.spark
    ids, indptr, indices, weights = graph_to_csr_weighted(graph)
    n = len(ids)
    bcast = spark.sparkContext.broadcast((ids, indptr, indices, weights))
    if num_tasks is None:
        num_tasks = min(
            int(spark.conf.get("spark.sql.shuffle.partitions")), max(1, n)
        )
    src_df = spark.createDataFrame(
        [(int(i),) for i in range(n)], "sid long"
    ).repartition(num_tasks)

    def run_batch(batches):
        ids_, indptr_, indices_, weights_ = bcast.value
        nn = len(ids_)
        for pdf in batches:
            out = []
            for s_ in pdf["sid"].to_numpy():
                dist, _ = dijkstra_forward(indptr_, indices_, weights_, int(s_), nn)
                fin = np.isfinite(dist)
                out.append((int(ids_[int(s_)]), float(dist[fin].max())))
            yield pd.DataFrame(out, columns=["id", "ecc"])

    return src_df.mapInPandas(run_batch, "id long, ecc double")


def eccentricity_weighted_oracle_sql(edges_cte: str, hops: int = 8) -> str:
    """DuckDB oracle for ``eccentricity_weighted`` over the unrolled
    Bellman–Ford weighted-APSP CTE. Output (id, ecc) rounded to 6."""
    from centrality_gpu_spark.operators.betweenness import (
        weighted_apsp_oracle_cte,
    )

    return f"""WITH {weighted_apsp_oracle_cte(edges_cte, hops)}
SELECT s AS id, ROUND(MAX(d), 6) AS ecc
FROM dist GROUP BY s ORDER BY id"""


def eccentricity_apsp_oracle_sql(edges_cte: str, max_depth: int = 8) -> str:
    """DuckDB oracle for ``eccentricity`` (diameter <= max_depth),
    from the shared APSP CTE. Output: (id, ecc) ordered by id."""
    from centrality_gpu_spark.operators.betweenness import apsp_oracle_cte

    return f"""WITH {apsp_oracle_cte(edges_cte, max_depth)}
SELECT s AS id, CAST(MAX(d) AS BIGINT) AS ecc
FROM dist GROUP BY s ORDER BY id"""


def extent_apsp_oracle_sql(edges_cte: str, max_depth: int = 8) -> str:
    """DuckDB oracle for ``graph_extent``: one row
    (radius, diameter, n_center, n_periphery)."""
    from centrality_gpu_spark.operators.betweenness import apsp_oracle_cte

    return f"""WITH {apsp_oracle_cte(edges_cte, max_depth)},
ecc AS (SELECT s AS id, MAX(d) AS ecc FROM dist GROUP BY s),
ext AS (SELECT MIN(ecc) AS radius, MAX(ecc) AS diameter FROM ecc)
SELECT CAST(ext.radius AS BIGINT) AS radius,
       CAST(ext.diameter AS BIGINT) AS diameter,
       CAST(SUM(CASE WHEN e.ecc = ext.radius THEN 1 ELSE 0 END) AS BIGINT)
           AS n_center,
       CAST(SUM(CASE WHEN e.ecc = ext.diameter THEN 1 ELSE 0 END) AS BIGINT)
           AS n_periphery
FROM ecc e CROSS JOIN ext
GROUP BY ext.radius, ext.diameter"""
