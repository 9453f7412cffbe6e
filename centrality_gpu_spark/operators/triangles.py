"""Triangle counting via degree-ordered orientation + wedge join.

The reference's membership-test primitive (J6: find slot of edge (v,u)
in CSR, ``bcc_bfs.cpp:391-415``) is the semi-join at the heart of
triangle counting; the algorithm itself is one the reference lacks but
the north rule requires.

Scale design: edges are oriented from the (degree, id)-smaller endpoint
to the larger ("compact-forward" order). This bounds the wedge
intermediate at O(m^{3/2}) regardless of hub degree — orienting by raw
id would explode wedges at power-law hubs (a degree-10⁶ hub would emit
10¹² wedges; degree-ordering caps its out-degree at ~√m). The closing
edge check is an equi-join against the oriented edge set, broadcast
when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph


def oriented_edges(graph: Graph) -> DataFrame:
    """Each undirected edge once, directed by (degree, id) order."""
    deg = graph.degrees()
    e = (
        graph.edges.select("src", "dst")
        .join(deg.select(F.col("id").alias("src"), F.col("degree").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dd")), "dst")
    )
    keep = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.where(keep).select("src", "dst")


def triangles(graph: Graph) -> DataFrame:
    """All triangles as (a, b, c) in orientation order (each exactly once)."""
    # lazy localCheckpoint: the oriented table feeds BOTH wedge sides
    # and the closing-edge probe — without it Catalyst re-derives the
    # degree join (and re-reads the source) once per reference, which
    # the plan audit showed as 24 identical scans on an unpersisted
    # graph. Lazy (eager=False) keeps the operator side-effect-free
    # until the caller's first action.
    oe = oriented_edges(graph).localCheckpoint(eager=False)
    e1 = oe.alias("e1")
    e2 = oe.alias("e2")
    e3 = oe.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
    )
    return wedges.join(
        e3, (F.col("a") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst"))
    ).select("a", "b", "c")


def triangle_count(graph: Graph) -> DataFrame:
    """Single row (n_triangles:long)."""
    return triangles(graph).agg(F.count("*").alias("n_triangles"))


def triangles_per_vertex(graph: Graph) -> DataFrame:
    """(id, n_tri) — triangles incident to each vertex; vertices in no
    triangle are included with 0 (matches ``nx.triangles``)."""
    t = triangles(graph)
    roles = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    cnt = roles.groupBy("id").agg(F.count("*").alias("n_tri"))
    return (
        graph.vertices()
        .join(cnt, "id", "left")
        .select("id", F.coalesce("n_tri", F.lit(0)).alias("n_tri"))
    )


def clustering_coefficient(graph: Graph) -> DataFrame:
    """(id, clustering) — local clustering coefficient
    2·tri(v) / (deg(v)·(deg(v)−1)), 0 for degree < 2 (nx semantics).
    Pure composition of triangles_per_vertex + degrees."""
    t = triangles_per_vertex(graph)
    d = graph.degrees()
    cc = F.when(
        F.col("degree") >= 2,
        2.0 * F.col("n_tri") / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    return t.join(d, "id").select("id", F.round(cc, 6).alias("clustering"))


# DuckDB oracle fragment: same orientation + wedge-close, over a CTE
# named `edges(src,dst,weight)` with both directions present.
TRIANGLE_COUNT_SQL = """
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src),
oe AS (
  SELECT e.src, e.dst
  FROM edges e
  JOIN deg ds ON e.src = ds.id
  JOIN deg dd ON e.dst = dd.id
  WHERE (ds.degree < dd.degree)
     OR (ds.degree = dd.degree AND e.src < e.dst)
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oe e1
  JOIN oe e2 ON e1.dst = e2.src
  JOIN oe e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
""".strip()


# ---------------------------------------------- DOULION sampled count

def _coin(u, v, seed: str):
    """Deterministic per-edge uniform in [0, 16^15) — md5 of the
    canonical endpoint pair, identical in DuckDB."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"tri:{seed}:"),
                    u.cast("string"),
                    F.lit(":"),
                    v.cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def triangle_count_sampled(
    graph: Graph, p: float = 0.25, seed: str = "doulion"
) -> DataFrame:
    """(n_sampled, est) — DOULION approximate triangle count
    (Tsourakakis, Kang, Miller, Faloutsos KDD'09): keep each undirected
    edge with probability ``p`` (a deterministic md5 coin per canonical
    edge — reproducible across runs and engines), count triangles
    EXACTLY on the sparsified graph, scale by 1/p³ (each triangle
    survives with probability p³ ⇒ unbiased).

    The trillion-edge scale path: the exact count's wedge join is
    O(m^1.5); sampling at p cuts it by ~p^1.5 on the same plan while
    the estimator's relative error stays O(1/√(p³·Δ)) on
    triangle-rich graphs (the paper's variance bound). p=1 degenerates
    to the exact count (tested).
    """
    thresh = int(p * 16**15)
    can = (
        graph.edges.select("src", "dst")
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )
    kept = can.where(_coin(F.col("src"), F.col("dst"), seed) < thresh)
    sub = Graph.from_undirected_edges(kept)
    return triangle_count(sub).select(
        F.col("n_triangles").alias("n_sampled"),
        F.round(F.col("n_triangles") / F.lit(float(p**3)), 6).alias("est"),
    )


def sampled_triangle_count_sql(
    edges_cte: str, p: float = 0.25, seed: str = "doulion"
) -> str:
    """DuckDB twin of ``triangle_count_sampled`` (``edges_cte`` defines
    ``edges(src, dst, weight)``, both directions)."""
    thresh = int(p * 16**15)
    return f"""WITH {edges_cte},
can AS (SELECT DISTINCT src, dst FROM edges WHERE src < dst),
kept AS (
  SELECT src, dst FROM can
  WHERE CAST(('0x' || substr(md5('tri:{seed}:' || CAST(src AS VARCHAR)
        || ':' || CAST(dst AS VARCHAR)), 1, 15)) AS BIGINT) < {thresh}
),
se AS (SELECT src, dst FROM kept UNION ALL SELECT dst, src FROM kept),
sdeg AS (SELECT src AS id, COUNT(*) AS degree FROM se GROUP BY src),
soe AS (
  SELECT e.src, e.dst
  FROM se e
  JOIN sdeg ds ON e.src = ds.id
  JOIN sdeg dd ON e.dst = dd.id
  WHERE (ds.degree < dd.degree)
     OR (ds.degree = dd.degree AND e.src < e.dst)
),
stri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM soe e1
  JOIN soe e2 ON e1.dst = e2.src
  JOIN soe e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
       ROUND(COUNT(*) / {float(p**3)}, 6) AS est
FROM stri""".strip()


def transitivity(graph: Graph) -> DataFrame:
    """Single row (transitivity:double) — the GLOBAL clustering
    coefficient 3·triangles / wedges, where wedges = Σ_v C(deg v, 2)
    (``nx.transitivity`` semantics; 0.0 on wedge-free graphs). One
    triangle count + one degree aggregation."""
    tri = triangle_count(graph).collect()[0].n_triangles
    deg = graph.degrees()
    return deg.agg(
        F.round(
            F.when(
                F.sum(F.col("degree") * (F.col("degree") - 1) / 2) > 0,
                3.0 * F.lit(int(tri))
                / F.sum(F.col("degree") * (F.col("degree") - 1) / 2),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("transitivity")
    )


def transitivity_oracle_sql(edges_cte: str, round_digits: int = 8) -> str:
    """DuckDB twin of ``transitivity``."""
    return f"""WITH {edges_cte},
{TRIANGLE_COUNT_SQL},
wedges AS (
  SELECT SUM(degree * (degree - 1) / 2.0) AS nw
  FROM (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
)
SELECT ROUND(CASE WHEN w.nw > 0
             THEN 3.0 * (SELECT COUNT(*) FROM tri) / w.nw
             ELSE 0.0 END, {round_digits}) AS transitivity
FROM wedges w""".strip()
