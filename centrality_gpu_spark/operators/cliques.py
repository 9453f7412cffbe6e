"""4-clique counting via degree-ordered orientation (compact-forward).

Extends the triangle operator one level: under the total (degree, id)
vertex order, every 4-clique {w<x<y<z} contains exactly one oriented
triangle (w,x,y) plus the three oriented closing edges w→z, x→z, y→z —
so 4-cliques are the oriented triangles extended by one join against
the oriented edge set, each clique counted exactly once.

Scale design: the extension joins anchor on the triangle's HIGHEST-rank
vertex ``c`` first (its oriented out-degree is bounded by ~√m, the
compact-forward hub control that keeps the candidate blow-up at
O(#triangles · √m) instead of O(#triangles · hub-degree)), then two
membership semi-joins (the J6 idiom) verify a→d and b→d. All joins are
equi-joins on the oriented edge set Catalyst can shuffle or broadcast
freely; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.triangles import (
    TRIANGLE_COUNT_SQL,
    oriented_edges,
    triangles,
)


def four_cliques(graph: Graph) -> DataFrame:
    """All 4-cliques as (a, b, c, d) in orientation order (each exactly
    once)."""
    oe = oriented_edges(graph)
    t = triangles(graph)
    return (
        t.join(oe.select(F.col("src").alias("c"), F.col("dst").alias("d")), "c")
        .join(oe.select(F.col("src").alias("b"), F.col("dst").alias("d")), ["b", "d"])
        .join(oe.select(F.col("src").alias("a"), F.col("dst").alias("d")), ["a", "d"])
        .select("a", "b", "c", "d")
    )


def four_clique_count(graph: Graph) -> DataFrame:
    """Single row (n_4cliques:long)."""
    return four_cliques(graph).agg(F.count("*").alias("n_4cliques"))


def four_cliques_per_vertex(graph: Graph) -> DataFrame:
    """(id, n_4clique) — 4-cliques incident to each vertex; vertices in
    none included with 0."""
    q = four_cliques(graph)
    roles = (
        q.select(F.col("a").alias("id"))
        .unionAll(q.select(F.col("b").alias("id")))
        .unionAll(q.select(F.col("c").alias("id")))
        .unionAll(q.select(F.col("d").alias("id")))
    )
    cnt = roles.groupBy("id").agg(F.count("*").alias("n_4clique"))
    return (
        graph.vertices()
        .join(cnt, "id", "left")
        .select("id", F.coalesce("n_4clique", F.lit(0)).alias("n_4clique"))
    )


# DuckDB fragment: triangle CTEs + the one-level extension, over a CTE
# named `edges(src,dst,weight)` with both directions present.
FOUR_CLIQUE_SQL = (
    TRIANGLE_COUNT_SQL
    + """,
quad AS (
  SELECT t.a, t.b, t.c, e4.dst AS d
  FROM tri t
  JOIN oe e4 ON e4.src = t.c
  JOIN oe e5 ON e5.src = t.b AND e5.dst = e4.dst
  JOIN oe e6 ON e6.src = t.a AND e6.dst = e4.dst
)"""
)


def four_cliques_per_vertex_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of ``four_cliques_per_vertex``. Output (id,
    n_4clique) ordered by id."""
    return f"""WITH {edges_cte},
{FOUR_CLIQUE_SQL},
roles AS (
  SELECT a AS id FROM quad UNION ALL SELECT b FROM quad
  UNION ALL SELECT c FROM quad UNION ALL SELECT d FROM quad
)
SELECT v.id, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_4clique
FROM (SELECT DISTINCT src AS id FROM edges) v
LEFT JOIN (SELECT id, COUNT(*) AS n FROM roles GROUP BY id) cnt
  ON cnt.id = v.id
ORDER BY v.id"""
