"""Closeness centrality from the same batched multi-source BFS as
betweenness (SURVEY.md §2.10: "closeness via the same multi-source BFS
machinery" — aggregate Σd per source instead of Brandes deltas).

Output matches ``networkx.closeness_centrality`` (wf_improved=True):

    C(u) = (r-1)/Σd · (r-1)/(n-1)

where r = vertices reachable from u (incl. u). Also exposes raw
farness Σd — the reference's A8-style per-source aggregate.

Broadcast fast path reuses the BFS forward phase of the Brandes numpy
kernel over the broadcast CSR.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.csrkernels import (
    DEFAULT_BROADCAST_MAX_EDGES,
    graph_to_csr,
)
from centrality_gpu_spark.operators.bfs import multi_source_bfs
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf


def _closeness_from_farness(farness: DataFrame, n: int) -> DataFrame:
    """(source, farness, reachable) → (id, closeness)."""
    r1 = F.col("reachable") - F.lit(1)
    c = F.when(
        (F.col("farness") > 0) & (r1 > 0),
        (r1 / F.col("farness")) * (r1 / F.lit(float(max(n - 1, 1)))),
    ).otherwise(F.lit(0.0))
    return farness.select(F.col("source").alias("id"), c.alias("closeness"))


@with_iterative_conf
def closeness_bsp(
    graph: Graph,
    batch_size: int = 2048,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, closeness) via distributed frontier-join BFS waves; wave
    schedule is hash-bucketed distributedly (no O(V) driver collect)."""
    from centrality_gpu_spark.operators.betweenness import _source_waves

    ckpt = checkpoint or CheckpointManager(graph.spark)
    n = graph.num_vertices()
    parts: list[DataFrame] = []
    for src_df in _source_waves(graph, None, batch_size, ckpt):
        bfs = multi_source_bfs(graph, src_df, checkpoint=ckpt)
        far = bfs.visited.groupBy("source").agg(
            F.sum("dist").alias("farness"), F.count("*").alias("reachable")
        )
        parts.append(ckpt.truncate(far))
    from centrality_gpu_spark.graph import union_all

    return _closeness_from_farness(union_all(parts), n)


def closeness_broadcast(graph: Graph, num_tasks: int | None = None) -> DataFrame:
    """(id, closeness) — broadcast-CSR fast path: bit-parallel MS-BFS
    (64 sources per uint64-lane pass, ``msbfs_distance_stats``) — the
    per-source loop of the reference regime collapsed 64-fold."""
    from centrality_gpu_spark.operators.csrkernels import csr_components

    spark = graph.spark
    ids, indptr, indices = graph_to_csr(graph)
    n = len(ids)
    # component labels ride the broadcast: each task's 64-lane passes
    # then sweep the SOURCE'S component's sub-CSR, not the whole graph
    # (msbfs_distance_stats_grouped — the multi-component scale fix)
    comp = csr_components(indptr, indices, n)
    bcast = spark.sparkContext.broadcast((ids, indptr, indices, comp))
    if num_tasks is None:
        num_tasks = min(int(spark.conf.get("spark.sql.shuffle.partitions")), max(1, n))
    src_df = spark.createDataFrame([(int(i),) for i in range(n)], "sid long").repartition(
        num_tasks
    )

    def run_batch(batches):
        from centrality_gpu_spark.operators.csrkernels import (
            msbfs_distance_stats_grouped,
        )

        ids_, indptr_, indices_, comp_ = bcast.value
        n_ = len(ids_)
        for pdf in batches:
            sids = pdf["sid"].to_numpy()
            far, reach, _h, _e = msbfs_distance_stats_grouped(
                indptr_, indices_, sids, n_, comp_
            )
            yield pd.DataFrame(
                {
                    "source": ids_[sids],
                    "farness": far.astype(np.int64),
                    "reachable": reach.astype(np.int64),
                }
            )

    far = src_df.mapInPandas(run_batch, "source long, farness long, reachable long")
    return _closeness_from_farness(far, n)


def closeness(
    graph: Graph,
    strategy: str = "auto",
    max_broadcast_edges: int = DEFAULT_BROADCAST_MAX_EDGES,
    **kwargs,
) -> DataFrame:
    """(id, closeness) — regime-dispatching front door (same size guard
    as ``betweenness``: broadcast CSR under the limit, BSP above)."""
    if strategy == "auto":
        strategy = (
            "broadcast" if graph.num_edges() * 2 <= max_broadcast_edges else "bsp"
        )
    if strategy == "broadcast":
        return closeness_broadcast(graph, **kwargs)
    if strategy == "bsp":
        return closeness_bsp(graph, **kwargs)
    raise ValueError(f"unknown strategy {strategy!r}")


@with_iterative_conf
def farness(graph: Graph, batch_size: int = 2048) -> DataFrame:
    """(id, farness, reachable) — the raw per-source Σdist aggregate."""
    from centrality_gpu_spark.operators.betweenness import _source_waves

    ckpt = CheckpointManager(graph.spark)
    parts = []
    for src_df in _source_waves(graph, None, batch_size, ckpt):
        bfs = multi_source_bfs(graph, src_df, checkpoint=ckpt)
        parts.append(
            ckpt.truncate(
                bfs.visited.groupBy("source").agg(
                    F.sum("dist").alias("farness"), F.count("*").alias("reachable")
                )
            )
        )
    from centrality_gpu_spark.graph import union_all

    return union_all(parts).select(
        F.col("source").alias("id"), "farness", "reachable"
    )


def closeness_apsp_oracle_sql(edges_cte: str, max_depth: int = 8) -> str:
    """DuckDB oracle for ``closeness`` on any graph of diameter <=
    max_depth, from the same APSP CTE as ``brandes_apsp_oracle_sql``;
    mirrors ``_closeness_from_farness``'s wf_improved expression shape
    term-for-term so ROUND(..., 6) agrees bitwise with the engine.
    Output: (id, closeness) rounded to 6 decimals, ordered by id.
    """
    from centrality_gpu_spark.operators.betweenness import apsp_oracle_cte

    return f"""WITH {apsp_oracle_cte(edges_cte, max_depth)},
far AS (SELECT s, SUM(d) AS farness, COUNT(*) AS r FROM dist GROUP BY s),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)
SELECT s AS id,
       ROUND(CASE WHEN farness > 0 AND r > 1
             THEN (CAST(r - 1 AS DOUBLE) / farness)
                  * (CAST(r - 1 AS DOUBLE) / ((SELECT n FROM nn) - 1))
             ELSE 0.0 END, 6) AS closeness
FROM far ORDER BY id"""


def closeness_weighted(graph: Graph, num_tasks: int | None = None) -> DataFrame:
    """(id, closeness) — weighted closeness, wf_improved convention
    with farness = Σ weighted shortest distances (same formula shape as
    ``closeness``, distances from Dijkstra instead of BFS). Broadcast
    regime, size-guarded by ``graph_to_csr_weighted``."""
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
        [(int(x),) for x in range(n)], "sid long"
    ).repartition(num_tasks)

    def run_batch(batches):
        ids_, indptr_, indices_, weights_ = bcast.value
        nn = len(ids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for s_ in pdf["sid"].to_numpy():
                dist, _ = dijkstra_forward(indptr_, indices_, weights_, int(s_), nn)
                fin = np.isfinite(dist)
                out.append(
                    (int(ids_[int(s_)]), float(dist[fin].sum()), int(fin.sum()))
                )
            yield pd.DataFrame(out, columns=["source", "farness", "reachable"])

    far = src_df.mapInPandas(
        run_batch, "source long, farness double, reachable long"
    )
    return _closeness_from_farness(far, n)


def closeness_weighted_oracle_sql(edges_cte: str, hops: int = 8) -> str:
    """DuckDB oracle for ``closeness_weighted`` — wf_improved over the
    weighted-APSP distances. Output (id, closeness) rounded to 6."""
    from centrality_gpu_spark.operators.betweenness import (
        weighted_apsp_oracle_cte,
    )

    return f"""WITH {weighted_apsp_oracle_cte(edges_cte, hops)},
far AS (SELECT s, SUM(d) AS farness, COUNT(*) AS r FROM dist GROUP BY s),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)
SELECT s AS id,
       ROUND(CASE WHEN farness > 0 AND r > 1
             THEN (CAST(r - 1 AS DOUBLE) / farness)
                  * (CAST(r - 1 AS DOUBLE) / ((SELECT n FROM nn) - 1))
             ELSE 0.0 END, 6) AS closeness
FROM far ORDER BY id"""


def harmonic_weighted(graph: Graph, num_tasks: int | None = None) -> DataFrame:
    """(id, harmonic) — H(u) = Σ_{v≠u} 1/d_w(u, v) over *weighted*
    shortest distances (networkx ``harmonic_centrality(distance=
    'weight')`` convention). Broadcast regime over the weighted CSR,
    Dijkstra per source — the weighted twin of ``harmonic_broadcast``,
    behind the same size guard."""
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
        [(int(x),) for x in range(n)], "sid long"
    ).repartition(num_tasks)

    def run_batch(batches):
        ids_, indptr_, indices_, weights_ = bcast.value
        nn = len(ids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for s_ in pdf["sid"].to_numpy():
                dist, _ = dijkstra_forward(indptr_, indices_, weights_, int(s_), nn)
                fin = np.isfinite(dist) & (dist > 0)
                out.append((int(ids_[int(s_)]), float((1.0 / dist[fin]).sum())))
            yield pd.DataFrame(out, columns=["id", "harmonic"])

    return src_df.mapInPandas(run_batch, "id long, harmonic double")


def harmonic_weighted_oracle_sql(edges_cte: str, hops: int = 8) -> str:
    """DuckDB oracle for ``harmonic_weighted`` over the unrolled
    Bellman–Ford weighted-APSP CTE. Output (id, harmonic) rounded 6."""
    from centrality_gpu_spark.operators.betweenness import (
        weighted_apsp_oracle_cte,
    )

    return f"""WITH {weighted_apsp_oracle_cte(edges_cte, hops)},
h AS (SELECT s, SUM(1.0 / d) AS harmonic FROM dist WHERE d > 0 GROUP BY s)
SELECT v.id, ROUND(COALESCE(h.harmonic, 0.0), 6) AS harmonic
FROM verts v LEFT JOIN h ON v.id = h.s ORDER BY v.id"""


def closeness_sampled(
    graph: Graph,
    n_samples: int,
    seed: str = "cls",
    num_tasks: int | None = None,
) -> DataFrame:
    """(id, closeness) — landmark-estimated closeness (Eppstein & Wang
    2001 pivot sampling): s deterministic landmarks, one MS-BFS sweep
    each, per-target accumulation.

    ĉ(v) = tcnt(v)·(n-1) / (n·tsum(v)) with tsum(v) = Σ_{l ∈ S} d(l, v)
    and tcnt(v) = |landmarks reaching v| (self counts, d = 0): at
    s = n on a connected graph this degenerates to exact (n-1)/farness.
    O(s·E) work total — THE scale path when all-source closeness is
    unaffordable. The landmark set is md5-ordered (same scheme as
    ``betweenness_sampled``) so the DuckDB oracle replays it exactly.

    Multi-component note: the per-TARGET lane kernel here is not
    component-grouped (unlike the all-source paths, which ride
    ``msbfs_distance_stats_grouped``) — with s ≪ V landmarks the waste
    is bounded by ceil(s/64) full-CSR passes, already the operator's
    declared cost, so grouping would only re-partition the same O(s·E).
    """
    from centrality_gpu_spark.operators.csrkernels import msbfs_target_sums

    spark = graph.spark
    ids, indptr, indices = graph_to_csr(graph)
    n = len(ids)
    verts = graph.vertices()
    hkey = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col("id"))), 1, 15),
        16, 10,
    ).cast("long")
    s_cnt = min(n_samples, n)
    sample = [r.id for r in verts.orderBy(hkey, "id").limit(s_cnt).collect()]
    dense = np.searchsorted(ids, np.asarray(sample))
    bcast = spark.sparkContext.broadcast((ids, indptr, indices))
    chunks = [dense[c : c + 64] for c in range(0, len(dense), 64)]
    if num_tasks is None:
        num_tasks = min(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            max(1, len(chunks)),
        )
    chunk_df = spark.createDataFrame(
        [(i, [int(x) for x in ch]) for i, ch in enumerate(chunks)],
        "cid long, srcs array<long>",
    ).repartition(num_tasks)

    def run_batch(batches):
        ids_, indptr_, indices_ = bcast.value
        nn = len(ids_)
        for pdf in batches:
            for srcs_ in pdf["srcs"]:
                tsum, tcnt = msbfs_target_sums(
                    indptr_, indices_, np.asarray(srcs_), nn
                )
                nz = np.nonzero(tcnt)[0]
                yield pd.DataFrame(
                    {"id": ids_[nz], "tsum": tsum[nz], "tcnt": tcnt[nz]}
                )

    parts = chunk_df.mapInPandas(run_batch, "id long, tsum double, tcnt double")
    agg = parts.groupBy("id").agg(
        F.sum("tsum").alias("tsum"), F.sum("tcnt").alias("tcnt")
    )
    c = F.when(
        F.col("tsum") > 0,
        F.col("tcnt") * F.lit(float(n - 1)) / (F.lit(float(n)) * F.col("tsum")),
    ).otherwise(F.lit(0.0))
    return (
        verts.join(agg, "id", "left")
        .select("id", F.coalesce(c, F.lit(0.0)).alias("closeness"))
    )


def closeness_sampled_oracle_sql(
    edges_cte: str, n_samples: int, seed: str = "cls", max_depth: int = 8
) -> str:
    """DuckDB twin of ``closeness_sampled``: identical md5-ordered
    landmark set over the unrolled-APSP distances. Output
    (id, closeness) rounded to 6, ordered by id."""
    from centrality_gpu_spark.operators.betweenness import apsp_oracle_cte

    return f"""WITH {apsp_oracle_cte(edges_cte, max_depth)},
samp AS (
  SELECT id FROM verts
  ORDER BY CAST(('0x' || substr(md5(concat('{seed}', ':', id)), 1, 15))
                AS BIGINT), id
  LIMIT {n_samples}
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
t AS (
  SELECT di.v AS id, SUM(CAST(di.d AS DOUBLE)) AS tsum,
         CAST(COUNT(*) AS DOUBLE) AS tcnt
  FROM dist di JOIN samp ON di.s = samp.id
  GROUP BY di.v
)
SELECT v.id,
       ROUND(CASE WHEN COALESCE(t.tsum, 0) > 0
             THEN t.tcnt * ((SELECT n FROM nn) - 1)
                  / ((SELECT n FROM nn) * t.tsum)
             ELSE 0.0 END, 6) AS closeness
FROM verts v LEFT JOIN t ON t.id = v.id ORDER BY v.id"""


# ------------------------------------------------------ harmonic centrality

def harmonic_broadcast(graph: Graph, num_tasks: int | None = None) -> DataFrame:
    """(id, harmonic) — H(u) = Σ_{v≠u} 1/d(u,v) (unreachable terms 0;
    networkx ``harmonic_centrality`` convention, unnormalized).

    Same broadcast-CSR source-parallel plan as ``closeness_broadcast``
    (bit-parallel MS-BFS batches, reference regime
    ``kernels_free.cu:43-79``); only the per-source aggregate differs:
    Σ1/d instead of Σd — harmonic handles disconnected graphs without
    the wf correction factor.
    """
    from centrality_gpu_spark.operators.csrkernels import csr_components

    spark = graph.spark
    ids, indptr, indices = graph_to_csr(graph)
    n = len(ids)
    comp = csr_components(indptr, indices, n)
    bcast = spark.sparkContext.broadcast((ids, indptr, indices, comp))
    if num_tasks is None:
        num_tasks = min(int(spark.conf.get("spark.sql.shuffle.partitions")), max(1, n))
    src_df = spark.createDataFrame([(int(i),) for i in range(n)], "sid long").repartition(
        num_tasks
    )

    def run_batch(batches):
        from centrality_gpu_spark.operators.csrkernels import (
            msbfs_distance_stats_grouped,
        )

        ids_, indptr_, indices_, comp_ = bcast.value
        n_ = len(ids_)
        for pdf in batches:
            sids = pdf["sid"].to_numpy()
            _f, _r, harm, _e = msbfs_distance_stats_grouped(
                indptr_, indices_, sids, n_, comp_
            )
            yield pd.DataFrame({"id": ids_[sids], "harmonic": harm})

    return src_df.mapInPandas(run_batch, "id long, harmonic double")


@with_iterative_conf
def harmonic_bsp(
    graph: Graph,
    batch_size: int = 2048,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, harmonic) via the distributed frontier-join BFS waves."""
    from centrality_gpu_spark.operators.betweenness import _source_waves
    from centrality_gpu_spark.graph import union_all

    ckpt = checkpoint or CheckpointManager(graph.spark)
    parts: list[DataFrame] = []
    for src_df in _source_waves(graph, None, batch_size, ckpt):
        bfs = multi_source_bfs(graph, src_df, checkpoint=ckpt)
        h = (
            bfs.visited.where(F.col("dist") > 0)
            .groupBy("source")
            .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"))
        )
        parts.append(ckpt.truncate(h))
    res = union_all(parts).select(F.col("source").alias("id"), "harmonic")
    # isolated / all-unreachable sources: harmonic = 0
    return (
        graph.vertices()
        .join(res, "id", "left")
        .select("id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"))
    )


def harmonic(
    graph: Graph,
    strategy: str = "auto",
    max_broadcast_edges: int = DEFAULT_BROADCAST_MAX_EDGES,
    **kwargs,
) -> DataFrame:
    """(id, harmonic) — regime-dispatching front door (same size guard
    as ``closeness``)."""
    if strategy == "auto":
        strategy = (
            "broadcast" if graph.num_edges() * 2 <= max_broadcast_edges else "bsp"
        )
    if strategy == "broadcast":
        return harmonic_broadcast(graph, **kwargs)
    if strategy == "bsp":
        return harmonic_bsp(graph, **kwargs)
    raise ValueError(f"unknown strategy {strategy!r}")


def harmonic_apsp_oracle_sql(edges_cte: str, max_depth: int = 8) -> str:
    """DuckDB oracle for ``harmonic`` (graphs of diameter <= max_depth),
    from the same APSP CTE. Output: (id, harmonic) rounded to 6."""
    from centrality_gpu_spark.operators.betweenness import apsp_oracle_cte

    return f"""WITH {apsp_oracle_cte(edges_cte, max_depth)},
h AS (
  SELECT s, SUM(1.0 / d) AS harmonic FROM dist WHERE d > 0 GROUP BY s
)
SELECT v.id, ROUND(COALESCE(h.harmonic, 0.0), 6) AS harmonic
FROM verts v LEFT JOIN h ON v.id = h.s ORDER BY v.id"""
