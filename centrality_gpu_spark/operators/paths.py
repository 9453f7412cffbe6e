"""Shortest-path extraction: one canonical source→target path.

Distance operators (``bfs.py``, ``csrkernels.py``) report *how far*;
this reports *which way* — the operator a user reaches for after any
centrality/reachability query. The canonical path is made deterministic
(and therefore oracle-checkable) by the min-id predecessor rule: walking
back from the target, each step moves to the smallest-id neighbor one
BFS level closer to the source. That is a real shortest path, and both
engines agree on it exactly.

Two strategies behind the shared broadcast size guard:

- ``broadcast``: the CSR kernel computes the distance array and the
  backwalk runs in numpy (path length <= diameter — trivially small).
- ``bsp``: distances from the frontier-join superstep path
  (``bfs_visited``), parents from ONE edges×dist self-join
  (parent(v) = min-id neighbor at dist-1 — a single shuffle computing
  every parent at once), then an O(diameter) chain of tiny joins
  follows parents back. Edges shuffle once, never per step — the 100 TB
  shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph


def shortest_path(
    graph: Graph,
    source: int,
    target: int,
    strategy: str = "auto",
    max_broadcast_edges: int | None = None,
) -> DataFrame:
    """(pos, id) — the canonical shortest path from ``source`` to
    ``target``: pos = 0 at the source up to pos = d(source, target) at
    the target, min-id predecessor tie-break. Empty result when the
    target is unreachable (per-component semantics, no error)."""
    from centrality_gpu_spark.operators.csrkernels import DEFAULT_BROADCAST_MAX_EDGES

    limit = max_broadcast_edges or DEFAULT_BROADCAST_MAX_EDGES
    if strategy == "auto":
        strategy = "broadcast" if graph.num_edges() * 2 <= limit else "bsp"
    if strategy == "broadcast":
        return _shortest_path_broadcast(graph, source, target)
    if strategy == "bsp":
        return _shortest_path_bsp(graph, source, target)
    raise ValueError(f"unknown strategy {strategy!r}")


def _shortest_path_broadcast(graph: Graph, source: int, target: int) -> DataFrame:
    import numpy as np

    from centrality_gpu_spark.operators.csrkernels import bfs_forward, graph_to_csr

    spark = graph.spark
    ids, indptr, indices = graph_to_csr(graph)
    n = len(ids)
    schema = "pos int, id long"
    spos = int(np.searchsorted(ids, source))
    tpos = int(np.searchsorted(ids, target))
    if (
        spos >= n or ids[spos] != source
        or tpos >= n or ids[tpos] != target
    ):
        return spark.createDataFrame([], schema)
    dist, _sigma, _levels = bfs_forward(indptr, indices, spos, n)
    if dist[tpos] < 0:
        return spark.createDataFrame([], schema)
    path = [tpos]
    cur = tpos
    for d in range(int(dist[tpos]) - 1, -1, -1):
        nbrs = indices[indptr[cur]:indptr[cur + 1]]
        cand = nbrs[dist[nbrs] == d]
        cur = int(cand.min())  # CSR positions order like sorted ids
        path.append(cur)
    rows = [(pos, int(ids[p])) for pos, p in enumerate(reversed(path))]
    return spark.createDataFrame(rows, schema)


def _shortest_path_bsp(graph: Graph, source: int, target: int) -> DataFrame:
    from centrality_gpu_spark.operators.bfs import bfs_visited

    spark = graph.spark
    src_df = spark.createDataFrame([(int(source),)], "source long")
    dist = (
        bfs_visited(graph, src_df, strategy="bsp")
        .select("vertex", "dist")
        .persist()
    )
    t = dist.where(F.col("vertex") == int(target)).collect()
    if not t:
        dist.unpersist()
        return spark.createDataFrame([], "pos int, id long")
    depth = int(t[0].dist)
    edges = graph.edges_by_src()
    # every parent in one shuffle: min-id neighbor one level closer
    parents = (
        edges.join(dist.withColumnRenamed("vertex", "src"), "src")
        .join(
            dist.select(
                F.col("vertex").alias("dst"), F.col("dist").alias("pdist")
            ),
            "dst",
        )
        .where(F.col("pdist") == F.col("dist") - 1)
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("par"))
        .persist()
    )
    # backwalk by O(depth) tiny joins: each step joins the single
    # current path row to the parents table (1-row side broadcasts),
    # so the driver never materializes an O(V) parent map — only the
    # O(path) rows of the answer itself ever reach it.
    step = spark.createDataFrame([(depth, int(target))], "pos int, id long")
    segments = [step]
    for _ in range(depth):
        step = (
            step.join(parents, "id")
            .select(
                (F.col("pos") - 1).alias("pos"), F.col("par").alias("id")
            )
            # 1 row; truncate lineage so the plan depth stays O(1)
            .localCheckpoint()
        )
        segments.append(step)
    out = segments[0]
    for seg in segments[1:]:
        out = out.unionByName(seg)
    out = out.orderBy("pos").localCheckpoint()
    dist.unpersist()
    parents.unpersist()
    return out


def shortest_path_oracle_sql(
    edges_cte: str, source: int, target: int, max_depth: int = 12
) -> str:
    """DuckDB twin of ``shortest_path`` (graphs of diameter <=
    max_depth): recursive BFS distances from the source, parent = min-id
    neighbor one level closer, recursive backwalk from the target.
    Output (pos, id) ordered by pos."""
    return f"""WITH RECURSIVE {edges_cte},
walk(v, d) AS (
  SELECT CAST({source} AS BIGINT), 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.d < {max_depth}
),
sdist AS (SELECT v AS id, MIN(d) AS d FROM walk GROUP BY v),
parent AS (
  SELECT ds.id, MIN(e.dst) AS par
  FROM sdist ds JOIN edges e ON e.src = ds.id
  JOIN sdist dp ON dp.id = e.dst AND dp.d = ds.d - 1
  GROUP BY ds.id
),
path(pos, id) AS (
  SELECT d, CAST({target} AS BIGINT) FROM sdist WHERE id = {target}
  UNION ALL
  SELECT w.pos - 1, p.par FROM path w JOIN parent p ON p.id = w.id
  WHERE w.pos > 0
)
SELECT CAST(pos AS INTEGER) AS pos, id FROM path ORDER BY pos"""
