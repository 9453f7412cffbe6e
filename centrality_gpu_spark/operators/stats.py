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


def degree_skew(graph: Graph, round_digits: int = 6) -> DataFrame:
    """One-row skew profile of the degree distribution — the signal the
    engine's hub-salting threshold and AQE skew planning act on (north
    rule: power-law degree distributions / hub-vertex skew):

    (n_vertices, max_degree, p50_degree, p99_degree, gini,
    powerlaw_slope)

    - p50/p99: degree at ascending rank ceil(q·n) (exact, rank-based —
      no engine-specific percentile interpolation).
    - gini: (2·Σᵢ i·dᵢ − (n+1)·Σd) / (n·Σd) over ascending-sorted
      degrees — computed blockwise from the histogram via cumulative
      counts (rank sums of equal-degree blocks are closed-form), so
      every term is integer arithmetic, exact in doubles.
    - powerlaw_slope: OLS slope of ln(cnt) on ln(degree) over the
      degree histogram — ≈ −γ for p(d) ∝ d^−γ.

    Scale shape: everything derives from ``degree_histogram()`` (one
    groupBy of a groupBy); the histogram has at most max-degree rows, so
    the window/sort below runs on a broadcast-sized frame no matter how
    large the graph is. The DuckDB twin (``degree_skew_oracle_sql``)
    replays the identical arithmetic.
    """
    from pyspark.sql import Window

    # (degree, cnt) — tiny; cached because three actions below (agg +
    # two percentile probes) would otherwise each re-run the O(E)
    # degree groupBy lineage
    hist = graph.degree_histogram().cache()
    w = Window.orderBy("degree").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    h = hist.select(
        "degree",
        "cnt",
        F.sum("cnt").over(w).alias("chi"),  # cumulative count incl. row
    ).select(
        "degree",
        "cnt",
        "chi",
        (F.col("chi") - F.col("cnt")).alias("clo"),  # cumulative before
    )
    # Σ i·dᵢ for the block of ranks (clo, chi]:
    #   degree · (chi(chi+1) − clo(clo+1)) / 2
    ranksum = (
        F.col("degree")
        * (
            F.col("chi") * (F.col("chi") + 1)
            - F.col("clo") * (F.col("clo") + 1)
        )
        / F.lit(2.0)
    )
    lx = F.log(F.col("degree").cast("double"))
    ly = F.log(F.col("cnt").cast("double"))
    agg = h.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.max("degree").cast("long").alias("max_degree"),
        F.sum(F.col("degree") * F.col("cnt")).cast("long").alias("dsum"),
        F.sum(ranksum).alias("irank"),
        F.count("*").cast("long").alias("nb"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    q = agg.collect()[0]
    if q.n is None:  # empty graph → empty profile, not a TypeError
        hist.unpersist()
        return graph.spark.createDataFrame(
            [],
            "n_vertices long, max_degree long, p50_degree long, "
            "p99_degree long, gini double, powerlaw_slope double",
        )
    n, dsum = int(q.n), int(q.dsum)
    gini = (2.0 * float(q.irank) - (n + 1) * dsum) / (n * dsum)
    slope = (
        (q.sxy - q.sx * q.sy / q.nb) / (q.sxx - q.sx * q.sx / q.nb)
        if q.nb > 1
        else 0.0
    )
    import math

    r50 = math.ceil(0.50 * n)
    r99 = math.ceil(0.99 * n)
    pct = h.where(F.col("chi") >= r50).agg(
        F.min("degree").alias("p50")
    ).collect()[0]
    pct99 = h.where(F.col("chi") >= r99).agg(
        F.min("degree").alias("p99")
    ).collect()[0]
    hist.unpersist()
    row = (
        n,
        int(q.max_degree),
        int(pct.p50),
        int(pct99.p99),
        round(float(gini), round_digits),
        round(float(slope), round_digits),
    )
    return graph.spark.createDataFrame(
        [row],
        "n_vertices long, max_degree long, p50_degree long, "
        "p99_degree long, gini double, powerlaw_slope double",
    )


def degree_skew_oracle_sql(edges_cte: str, round_digits: int = 6) -> str:
    """DuckDB twin of ``degree_skew`` — identical histogram-blockwise
    arithmetic (ROUND applied to the same double expressions)."""
    return f"""WITH {edges_cte},
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src),
hist AS (SELECT degree, COUNT(*) AS cnt FROM deg GROUP BY degree),
cum AS (
  SELECT degree, cnt,
         SUM(cnt) OVER (ORDER BY degree) AS chi,
         SUM(cnt) OVER (ORDER BY degree) - cnt AS clo
  FROM hist
),
agg AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(MAX(degree) AS BIGINT) AS max_degree,
         CAST(SUM(degree * cnt) AS BIGINT) AS dsum,
         SUM(degree * (chi * (chi + 1) - clo * (clo + 1)) / 2.0) AS irank,
         COUNT(*) AS nb,
         SUM(LN(degree)) AS sx,
         SUM(LN(cnt)) AS sy,
         SUM(LN(degree) * LN(cnt)) AS sxy,
         SUM(LN(degree) * LN(degree)) AS sxx
  FROM cum
)
SELECT a.n AS n_vertices,
       a.max_degree,
       (SELECT CAST(MIN(degree) AS BIGINT) FROM cum
        WHERE chi >= CEIL(0.50 * a.n)) AS p50_degree,
       (SELECT CAST(MIN(degree) AS BIGINT) FROM cum
        WHERE chi >= CEIL(0.99 * a.n)) AS p99_degree,
       ROUND((2.0 * a.irank - (a.n + 1) * a.dsum)
             / (a.n * CAST(a.dsum AS DOUBLE)), {round_digits}) AS gini,
       ROUND(CASE WHEN a.nb > 1
                  THEN (a.sxy - a.sx * a.sy / a.nb)
                       / (a.sxx - a.sx * a.sx / a.nb)
                  ELSE 0.0 END, {round_digits}) AS powerlaw_slope
FROM agg a"""
