"""Butterfly (bipartite 4-cycle) counting.

The transcript model's conv↔tool edge set is bipartite, and the
4-cycle — two convs sharing two tools — is the bipartite analog of the
triangle (no triangles exist in a bipartite graph, so the reference's
clustering machinery says nothing there). Butterflies per vertex /
total are the standard cohesion metric for such graphs (Sanei-Mehri et
al., KDD'18 counting scheme, re-expressed as DataFrame joins).

Algorithm: pair the two endpoints of every *wedge* (u −t− v with
u < v), count shared neighbors c per pair, and sum C(c, 2). Pairing
can anchor on either side; wedge volume through the right side is
Σ_t C(deg(t), 2) and through the left Σ_u C(deg(u), 2) — both give the
same butterfly total, so the operator picks the CHEAPER side before
the self-join (the hub-skew decision: a hot tool vertex explodes the
right-anchored join but contributes only linear rows to the
left-anchored one). AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _wedge_volume(edges: DataFrame, key: str):
    """Σ C(deg, 2) over the ``key`` side — the row count the pair join
    on the *other* side would generate."""
    return (
        edges.groupBy(key)
        .agg(F.count("*").alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]["w"]
        or 0.0
    )


def butterfly_count(edges: DataFrame) -> DataFrame:
    """One row (n_butterflies, n_left_wedges, n_right_wedges) over a
    deduplicated bipartite edge table (src = left side, dst = right).

    ``n_left_wedges``/``n_right_wedges`` = Σ C(deg, 2) over left/right
    vertices (paths of length 2 centered there); n_butterflies =
    Σ_{pairs} C(shared, 2) counted over whichever anchoring is cheaper.
    """
    e = edges.select("src", "dst").distinct().persist()
    left_w = _wedge_volume(e, "src")  # wedges centered on left verts
    right_w = _wedge_volume(e, "dst")
    # pairing left endpoints joins on dst and emits right_w rows;
    # pairing right endpoints joins on src and emits left_w rows
    if right_w <= left_w:
        join_key, pair_col = "dst", "src"
    else:
        join_key, pair_col = "src", "dst"
    a = e.select(F.col(join_key).alias("k"), F.col(pair_col).alias("a"))
    b = e.select(F.col(join_key).alias("k"), F.col(pair_col).alias("b"))
    shared = (
        a.join(b, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    out = shared.agg(
        F.coalesce(
            F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("long")), F.lit(0)
        ).alias("n_butterflies")
    ).select(
        "n_butterflies",
        F.lit(int(left_w)).alias("n_left_wedges"),
        F.lit(int(right_w)).alias("n_right_wedges"),
    )
    return out


def butterflies_per_left_vertex(edges: DataFrame) -> DataFrame:
    """(id, butterflies) for every left-side vertex: the number of
    4-cycles it participates in = Σ over partners v of C(shared(u,v), 2)
    (each butterfly on pair {u, v} counts once for u and once for v)."""
    e = edges.select("src", "dst").distinct()
    a = e.select(F.col("dst").alias("k"), F.col("src").alias("a"))
    b = e.select(F.col("dst").alias("k"), F.col("src").alias("b"))
    shared = (
        a.join(b, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
    )
    per_pair = shared.select(
        "a", "b", (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("bf")
    )
    both = per_pair.select(F.col("a").alias("id"), "bf").unionByName(
        per_pair.select(F.col("b").alias("id"), "bf")
    )
    counts = both.groupBy("id").agg(F.sum("bf").alias("butterflies"))
    verts = e.select(F.col("src").alias("id")).distinct()
    return verts.join(counts, "id", "left").select(
        "id", F.coalesce("butterflies", F.lit(0)).alias("butterflies")
    )


def butterfly_oracle_sql(bipartite_edges_cte: str) -> str:
    """DuckDB twin of ``butterfly_count`` over a CTE exposing
    ``bedges(src, dst)`` (deduped bipartite). Side choice doesn't
    change the total, so the oracle always anchors left."""
    return f"""WITH {bipartite_edges_cte},
shared AS (
  SELECT a.src AS u, b.src AS v, COUNT(*) AS c
  FROM bedges a JOIN bedges b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
),
lw AS (SELECT COALESCE(SUM(d * (d - 1) / 2), 0) AS w FROM
       (SELECT COUNT(*) AS d FROM bedges GROUP BY src)),
rw AS (SELECT COALESCE(SUM(d * (d - 1) / 2), 0) AS w FROM
       (SELECT COUNT(*) AS d FROM bedges GROUP BY dst))
SELECT CAST(COALESCE(SUM(c * (c - 1) / 2), 0) AS BIGINT) AS n_butterflies,
       CAST((SELECT w FROM lw) AS BIGINT) AS n_left_wedges,
       CAST((SELECT w FROM rw) AS BIGINT) AS n_right_wedges
FROM shared"""


def butterflies_per_left_oracle_sql(bipartite_edges_cte: str) -> str:
    """DuckDB twin of ``butterflies_per_left_vertex``:
    (id, butterflies) ordered by id."""
    return f"""WITH {bipartite_edges_cte},
shared AS (
  SELECT a.src AS u, b.src AS v, COUNT(*) AS c
  FROM bedges a JOIN bedges b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
per_pair AS (SELECT u, v, CAST(c * (c - 1) / 2 AS BIGINT) AS bf FROM shared),
both_sides AS (
  SELECT u AS id, bf FROM per_pair
  UNION ALL SELECT v AS id, bf FROM per_pair
),
counts AS (SELECT id, SUM(bf) AS butterflies FROM both_sides GROUP BY id)
SELECT l.id, CAST(COALESCE(c.butterflies, 0) AS BIGINT) AS butterflies
FROM (SELECT DISTINCT src AS id FROM bedges) l
LEFT JOIN counts c ON c.id = l.id
ORDER BY l.id"""


def bipartite_project(
    edges: DataFrame,
    max_right_degree: int | None = 1000,
) -> DataFrame:
    """Left-side projection of a bipartite edge table: (src, dst, weight)
    with src < dst both left vertices and weight = number of shared
    right neighbors — the standalone form of the transcript model's
    co-invocation projection (``sources/transcripts.py``).

    ``max_right_degree`` drops right vertices above the cap BEFORE the
    pair join (the quadratic hub control: a right vertex of degree d
    emits C(d, 2) pairs, so one ubiquitous tool would otherwise emit
    billions). The cap is part of the operator's semantics — the DuckDB
    twin applies the identical cap, so capped results stay
    oracle-checkable. ``None`` disables it (exact projection).
    """
    e = edges.select("src", "dst").distinct()
    if max_right_degree is not None:
        keep = (
            e.groupBy("dst")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") <= max_right_degree)
            .select("dst")
        )
        e = e.join(keep, "dst")
    a = e.select(F.col("dst").alias("k"), F.col("src").alias("a"))
    b = e.select(F.col("dst").alias("k"), F.col("src").alias("b"))
    return (
        a.join(b, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
        .agg(F.count("*").cast("long").alias("weight"))
    )


def bipartite_project_oracle_sql(
    bipartite_edges_cte: str, max_right_degree: int | None = 1000
) -> str:
    """DuckDB twin of ``bipartite_project`` over a CTE exposing
    ``bedges(src, dst)``. Output (src, dst, weight) ordered."""
    cap = (
        f"""capped AS (
  SELECT e.src, e.dst FROM bedges e
  JOIN (SELECT dst FROM bedges GROUP BY dst
        HAVING COUNT(*) <= {max_right_degree}) k USING (dst)
)"""
        if max_right_degree is not None
        else "capped AS (SELECT src, dst FROM bedges)"
    )
    return f"""WITH {bipartite_edges_cte},
{cap}
SELECT a.src AS src, b.src AS dst, CAST(COUNT(*) AS BIGINT) AS weight
FROM capped a JOIN capped b ON a.dst = b.dst AND a.src < b.src
GROUP BY 1, 2
ORDER BY src, dst"""
