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


def rich_club(graph: Graph) -> DataFrame:
    """(k, n_nodes, n_edges, rc) — the (unnormalized) rich-club
    coefficient for every degree threshold k (Colizza et al. 2006;
    ``nx.rich_club_coefficient(normalized=False)`` semantics):
    restrict to vertices with degree > k, then
    rc(k) = 2·E_k / (N_k·(N_k − 1)). Rows for every k from 0 to
    max_degree − 1 with N_k ≥ 2.

    Plan shape: everything happens on the DEGREE HISTOGRAMS, never the
    graph — one degrees pass, one per-edge min-endpoint-degree groupBy,
    then a k-range × histogram join whose both sides are
    (distinct-degree)-sized, i.e. trivially broadcastable at any graph
    scale.
    """
    deg = graph.degrees()
    # vertex histogram: n vertices per degree
    vh = deg.groupBy("degree").agg(F.count("*").alias("nv"))
    # edge histogram: per canonical edge, min endpoint degree
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") < F.col("dst"))
        .join(deg.select(F.col("id").alias("src"), F.col("degree").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dd")), "dst")
        .select(F.least("ds", "dd").alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("ne"))
    )
    max_deg = deg.agg(F.max("degree").alias("mx")).collect()[0].mx or 0
    ks = graph.spark.range(0, max(int(max_deg), 1)).select(
        F.col("id").cast("long").alias("k")
    )
    nk = (
        ks.join(vh, vh.degree > ks.k)
        .groupBy("k")
        .agg(F.sum("nv").alias("n_nodes"))
    )
    ek = (
        ks.join(e, e.m > ks.k)
        .groupBy("k")
        .agg(F.sum("ne").alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            "k",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.round(
                2.0 * F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                8,
            ).alias("rc"),
        )
        .where(F.col("n_nodes") >= 2)
    )


def rich_club_oracle_sql(edges_cte: str, round_digits: int = 8) -> str:
    """DuckDB twin of ``rich_club``."""
    return f"""WITH {edges_cte},
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src),
vh AS (SELECT degree, COUNT(*) AS nv FROM deg GROUP BY degree),
eh AS (
  SELECT LEAST(a.degree, b.degree) AS m, COUNT(*) AS ne
  FROM edges e
  JOIN deg a ON e.src = a.id
  JOIN deg b ON e.dst = b.id
  WHERE e.src < e.dst
  GROUP BY 1
),
ks AS (
  SELECT unnest(generate_series(0, (SELECT MAX(degree) - 1 FROM deg)))
    AS k
),
nk AS (
  SELECT k, SUM(nv) AS n_nodes FROM ks JOIN vh ON vh.degree > ks.k
  GROUP BY k
),
ek AS (
  SELECT k, SUM(ne) AS n_edges FROM ks JOIN eh ON eh.m > ks.k GROUP BY k
)
SELECT nk.k,
       CAST(nk.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
       ROUND(2.0 * COALESCE(ek.n_edges, 0)
             / (nk.n_nodes * (nk.n_nodes - 1)), {round_digits}) AS rc
FROM nk LEFT JOIN ek USING (k)
WHERE nk.n_nodes >= 2
ORDER BY nk.k""".strip()
