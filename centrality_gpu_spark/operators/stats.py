"""Whole-graph summary statistics.

Single-row descriptive metrics a link-graph user runs before anything
else. All are one-pass Catalyst aggregations over the (symmetric) edge
table — no UDFs, no iteration — and each has an exact DuckDB twin.

- ``degree_assortativity``: Pearson correlation of (deg(u), deg(v))
  over the directed edge list — Newman's r. The symmetric edge table
  already enumerates each undirected edge in both directions, which is
  exactly the "remaining degree at both ends of every edge stub"
  population the statistic is defined over (``nx
  .degree_assortativity_coefficient`` semantics for undirected graphs
  — nx uses degree, not remaining degree, in this function).
- ``graph_summary``: |V|, |E|, density, min/max/mean degree in one agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph


def degree_assortativity(graph: Graph) -> DataFrame:
    """Single row (assortativity:double): Pearson r of the degrees at
    the two endpoints of each directed edge. NaN-free: returns NULL on
    degree-regular graphs (zero variance), like ``corr`` does."""
    deg = graph.degrees()
    e = (
        graph.edges.select("src", "dst")
        .join(deg.select(F.col("id").alias("src"), F.col("degree").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dd")), "dst")
    )
    return e.agg(
        F.round(F.corr(F.col("ds").cast("double"), F.col("dd").cast("double")), 8)
        .alias("assortativity")
    )


def assortativity_oracle_sql(edges_cte: str, round_digits: int = 8) -> str:
    """DuckDB twin of ``degree_assortativity`` over an ``edges(src,
    dst, weight)`` CTE holding both directions."""
    return f"""WITH {edges_cte},
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)
SELECT ROUND(CORR(CAST(a.degree AS DOUBLE), CAST(b.degree AS DOUBLE)),
             {round_digits}) AS assortativity
FROM edges e
JOIN deg a ON e.src = a.id
JOIN deg b ON e.dst = b.id"""


def graph_summary(graph: Graph) -> DataFrame:
    """Single row (n_vertices, n_edges, density, min_degree,
    max_degree, avg_degree) — undirected counts."""
    deg = graph.degrees()
    return deg.agg(
        F.count("*").alias("n_vertices"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
        F.round(
            F.sum("degree") / (F.count("*") * (F.count("*") - F.lit(1))), 8
        ).alias("density"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
        F.round(F.avg("degree"), 8).alias("avg_degree"),
    )


def graph_summary_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of ``graph_summary``."""
    return f"""WITH {edges_cte},
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)
SELECT COUNT(*) AS n_vertices,
       CAST(SUM(degree) / 2 AS BIGINT) AS n_edges,
       ROUND(SUM(degree) / (COUNT(*) * (COUNT(*) - 1.0)), 8) AS density,
       MIN(degree) AS min_degree,
       MAX(degree) AS max_degree,
       ROUND(AVG(degree), 8) AS avg_degree
FROM deg"""
