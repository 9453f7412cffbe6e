"""HITS (hubs & authorities) and link-prediction scores.

Two more link-analysis clients of the same physical idioms the engine
already runs everywhere:

- **HITS** (Kleinberg): the directed-graph twin of eigenvector
  centrality (``operators/eigenvector.py``) — an alternating power
  iteration, auth ← Aᵀ·hub, hub ← A·auth, each L2-normalized. On the
  transcript data model the directed edge is conv→tool (invocation),
  so hubs rank conversations by how many authoritative tools they
  touch and authorities rank tools by how many strong conversations
  invoke them. Per iteration: two SpMVs (one on A, one on Aᵀ) — at
  scale these reuse the blocked-store superstep with a src- and a
  dst-partitioned store of the SAME edge table (the transpose is a
  role swap, not a second dataset); here the per-iteration joins run
  against two pre-partitioned persisted copies so only the O(V) score
  vector shuffles each superstep.

- **Adamic–Adar link prediction**: for non-adjacent (u, v),
  score = Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg w) — the standard
  common-neighbor score. Physically a wedge join (the same two-hop
  self-join as triangle counting, J6/`operators/triangles.py`) with
  the per-wedge degree weight joined in; ``max_neighbor_degree`` caps
  the quadratic hub blow-up exactly like the transcript builder's
  ``max_tool_degree`` (a wedge through a degree-d hub contributes
  d² pairs, and ubiquitous hubs carry ~0 Adamic–Adar weight anyway —
  1/ln d — so the cap loses almost nothing and bounds the shuffle).

Both are fixed-budget deterministic and carry unrolled/static DuckDB
oracles (``hits_oracle_sql``, ``adamic_adar_oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def hits(
    edges: DataFrame,
    fixed_iterations: int = 10,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """HITS over a DIRECTED edge DF (src, dst). Returns
    (id:long, hub:double, auth:double), each vector L2-normalized.

    Classic unweighted semantics (edge multiplicity must already be
    collapsed by the caller — the builders' edge tables are deduped).
    Fixed iterations so the unrolled oracle replays it exactly; both
    score vectors cover every vertex (src or dst side), with 0 for a
    role the vertex never plays.
    """
    ckpt = checkpoint or CheckpointManager(edges.sparkSession)
    e = edges.select("src", "dst")
    # two pre-partitioned persisted copies: the forward superstep joins
    # on src, the transpose superstep on dst — neither re-shuffles the
    # edge table after this (only the O(V) score vector moves)
    e_src = e.repartition("src").persist()
    e_dst = e.repartition("dst").persist()
    e_src.count()
    verts = ckpt.truncate(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )

    hub = verts.select("id", F.lit(1.0).alias("s"))
    auth = None
    for _ in range(fixed_iterations):
        raw_a = (
            e_dst.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("s").alias("raw"))
        )
        auth = _l2_normalized(verts, raw_a, ckpt)
        raw_h = (
            e_src.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("s").alias("raw"))
        )
        hub = _l2_normalized(verts, raw_h, ckpt)

    out = (
        verts.join(hub.withColumnRenamed("s", "hub"), "id", "left")
        .join(auth.withColumnRenamed("s", "auth"), "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
    )
    e_src.unpersist()
    e_dst.unpersist()
    return out


def _l2_normalized(verts: DataFrame, raw: DataFrame, ckpt) -> DataFrame:
    # lazy truncate folded into the norm agg (one job), and the
    # normalized frame stays a projection over the checkpointed rows —
    # lineage depth is O(1) per call without a second checkpoint job
    full = ckpt.truncate(
        verts.join(raw, "id", "left").select(
            "id", F.coalesce("raw", F.lit(0.0)).alias("raw")
        ),
        eager=False,
    )
    norm = full.agg(
        F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("n")
    ).collect()[0]["n"]
    if not norm:
        return full.select("id", F.col("raw").alias("s"))
    return full.select("id", (F.col("raw") / F.lit(float(norm))).alias("s"))


def hits_oracle_sql(
    dedges_cte: str, iterations: int = 10, round_digits: int = 8
) -> str:
    """Unrolled DuckDB twin of ``hits`` (``dedges_cte`` must define a
    CTE ``dedges(src, dst)`` with the DIRECTED deduped edges)."""
    parts = [
        dedges_cte,
        "verts AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM dedges UNION SELECT dst FROM dedges))",
        "h0 AS (SELECT id, 1.0 AS s FROM verts)",
    ]
    for k in range(iterations):
        parts.append(
            f"""ar{k} AS MATERIALIZED (
  SELECT v.id, COALESCE(m.raw, 0.0) AS raw
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(h.s) AS raw
    FROM dedges e JOIN h{k} h ON e.src = h.id GROUP BY e.dst
  ) m ON v.id = m.id
)"""
        )
        parts.append(
            f"a{k + 1} AS MATERIALIZED (SELECT id, "
            f"raw / (SELECT SQRT(SUM(raw*raw)) FROM ar{k}) AS s FROM ar{k})"
        )
        parts.append(
            f"""hr{k} AS MATERIALIZED (
  SELECT v.id, COALESCE(m.raw, 0.0) AS raw
  FROM verts v LEFT JOIN (
    SELECT e.src AS id, SUM(a.s) AS raw
    FROM dedges e JOIN a{k + 1} a ON e.dst = a.id GROUP BY e.src
  ) m ON v.id = m.id
)"""
        )
        parts.append(
            f"h{k + 1} AS MATERIALIZED (SELECT id, "
            f"raw / (SELECT SQRT(SUM(raw*raw)) FROM hr{k}) AS s FROM hr{k})"
        )
    final = (
        f"SELECT h.id, ROUND(h.s, {round_digits}) AS hub, "
        f"ROUND(a.s, {round_digits}) AS auth "
        f"FROM h{iterations} h JOIN a{iterations} a ON h.id = a.id "
        "ORDER BY h.id"
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


# ----------------------------------------------------------- Adamic–Adar

def adamic_adar(
    graph: Graph,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Adamic–Adar scores for NON-adjacent pairs: returns
    (u:long, v:long, cn:long, score:double) with u < v,
    cn = |Γ(u)∩Γ(v)| ≥ ``min_common``, score = Σ_w 1/ln(deg w).

    ``max_neighbor_degree``: drop wedges through hubs above the cap
    (see module docstring — bounds the d² wedge blow-up; a capped hub's
    1/ln d contribution is near the floor anyway). None = exact.
    Common neighbors necessarily have degree ≥ 2, so ln(deg) > 0.
    """
    adj = graph.edges.select("src", "dst")
    degw = graph.degrees().select(
        F.col("id").alias("w"), F.col("degree").alias("deg_w")
    )
    if max_neighbor_degree is not None:
        degw = degw.where(F.col("deg_w") <= max_neighbor_degree)
    left = adj.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    right = adj.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (
        left.join(degw, "w")
        .join(right, "w")
        .where(F.col("u") < F.col("v"))
    )
    pairs = wedges.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.sum(1.0 / F.log(F.col("deg_w").cast("double"))).alias("score"),
    )
    non_adjacent = pairs.join(
        adj,
        (pairs.u == adj.src) & (pairs.v == adj.dst),
        "left_anti",
    )
    return non_adjacent.where(F.col("cn") >= min_common)


def adamic_adar_oracle_sql(
    edges_cte: str,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
    round_digits: int = 8,
) -> str:
    """DuckDB twin of ``adamic_adar`` (``edges_cte`` defines
    ``edges(src, dst, weight)``, both directions)."""
    cap = (
        f"AND d.deg_w <= {max_neighbor_degree}"
        if max_neighbor_degree is not None
        else ""
    )
    return f"""WITH {edges_cte},
deg AS (SELECT src AS w, COUNT(*) AS deg_w FROM edges GROUP BY src),
wedges AS (
  SELECT l.src AS u, r.dst AS v, d.deg_w
  FROM edges l
  JOIN deg d ON l.dst = d.w {cap}
  JOIN edges r ON r.src = l.dst
  WHERE l.src < r.dst
),
pairs AS (
  SELECT u, v, COUNT(*) AS cn, SUM(1.0 / LN(deg_w)) AS score
  FROM wedges GROUP BY u, v
)
SELECT p.u, p.v, p.cn, ROUND(p.score, {round_digits}) AS score
FROM pairs p
LEFT JOIN edges e ON p.u = e.src AND p.v = e.dst
WHERE e.src IS NULL AND p.cn >= {min_common}
ORDER BY p.u, p.v"""


# ------------------------------------------------------ Jaccard similarity

def jaccard_link_prediction(
    graph: Graph,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Jaccard link-prediction scores for NON-adjacent pairs: returns
    (u:long, v:long, cn:long, score:double) with u < v,
    score = |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)|.

    Same wedge join as ``adamic_adar`` (and the same optional hub cap
    on the SHARED neighbor w — the d² wedge bound); the union size
    comes from a broadcast-joined degree table:
    |Γ(u)∪Γ(v)| = deg(u) + deg(v) − cn. With a hub cap the cn in the
    numerator is the capped count while degrees stay exact — recall on
    hub-mediated pairs is traded for the shuffle bound, disclosed, same
    contract as ``adamic_adar``.
    """
    adj = graph.edges.select("src", "dst")
    degw = graph.degrees().select(
        F.col("id").alias("w"), F.col("degree").alias("deg_w")
    )
    if max_neighbor_degree is not None:
        degw = degw.where(F.col("deg_w") <= max_neighbor_degree)
    left = adj.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    right = adj.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (
        left.join(degw.select("w"), "w")
        .join(right, "w")
        .where(F.col("u") < F.col("v"))
    )
    pairs = wedges.groupBy("u", "v").agg(F.count("*").alias("cn"))
    deg = graph.degrees()
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("dv"))
    scored = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u", "v", "cn",
            (
                F.col("cn")
                / (F.col("du") + F.col("dv") - F.col("cn")).cast("double")
            ).alias("score"),
        )
    )
    non_adjacent = scored.join(
        adj,
        (scored.u == adj.src) & (scored.v == adj.dst),
        "left_anti",
    )
    return non_adjacent.where(F.col("cn") >= min_common).select(
        "u", "v", "cn", F.round("score", 8).alias("score")
    )


def jaccard_oracle_sql(
    edges_cte: str,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
    round_digits: int = 8,
) -> str:
    """DuckDB twin of ``jaccard_link_prediction`` (``edges_cte``
    defines ``edges(src, dst, weight)``, both directions)."""
    cap = (
        f"JOIN deg dc ON l.dst = dc.w AND dc.deg_w <= {max_neighbor_degree}"
        if max_neighbor_degree is not None
        else ""
    )
    return f"""WITH {edges_cte},
deg AS (SELECT src AS w, COUNT(*) AS deg_w FROM edges GROUP BY src),
wedges AS (
  SELECT l.src AS u, r.dst AS v
  FROM edges l
  {cap}
  JOIN edges r ON r.src = l.dst
  WHERE l.src < r.dst
),
pairs AS (SELECT u, v, COUNT(*) AS cn FROM wedges GROUP BY u, v)
SELECT p.u, p.v, p.cn,
       ROUND(CAST(p.cn AS DOUBLE) / (du.deg_w + dv.deg_w - p.cn),
             {round_digits}) AS score
FROM pairs p
JOIN deg du ON p.u = du.w
JOIN deg dv ON p.v = dv.w
LEFT JOIN edges e ON p.u = e.src AND p.v = e.dst
WHERE e.src IS NULL AND p.cn >= {min_common}
ORDER BY p.u, p.v"""


# ------------------------------------------- RA + PA link prediction

def resource_allocation(
    graph: Graph,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Resource-allocation index (Zhou, Lu, Zhang 2009) for
    NON-adjacent pairs: (u, v, cn, score) with u < v,
    score = Sum_w 1/deg(w) over common neighbors w.

    Same hub-capped wedge join as ``adamic_adar`` (RA is AA with 1/d in
    place of 1/ln d — it punishes hub-mediated similarity harder, which
    is why it wins on power-law graphs)."""
    adj = graph.edges.select("src", "dst")
    degw = graph.degrees().select(
        F.col("id").alias("w"), F.col("degree").alias("deg_w")
    )
    if max_neighbor_degree is not None:
        degw = degw.where(F.col("deg_w") <= max_neighbor_degree)
    left = adj.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    right = adj.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (
        left.join(degw, "w")
        .join(right, "w")
        .where(F.col("u") < F.col("v"))
    )
    pairs = wedges.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.sum(1.0 / F.col("deg_w").cast("double")).alias("score"),
    )
    non_adjacent = pairs.join(
        adj,
        (pairs.u == adj.src) & (pairs.v == adj.dst),
        "left_anti",
    )
    return non_adjacent.where(F.col("cn") >= min_common).select(
        "u", "v", "cn", F.round("score", 8).alias("score")
    )


def resource_allocation_oracle_sql(
    edges_cte: str,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
    round_digits: int = 8,
) -> str:
    """DuckDB twin of ``resource_allocation``."""
    cap = (
        f"AND d.deg_w <= {max_neighbor_degree}"
        if max_neighbor_degree is not None
        else ""
    )
    return f"""WITH {edges_cte},
deg AS (SELECT src AS w, COUNT(*) AS deg_w FROM edges GROUP BY src),
wedges AS (
  SELECT l.src AS u, r.dst AS v, d.deg_w
  FROM edges l
  JOIN deg d ON l.dst = d.w {cap}
  JOIN edges r ON r.src = l.dst
  WHERE l.src < r.dst
),
pairs AS (
  SELECT u, v, COUNT(*) AS cn, SUM(1.0 / deg_w) AS score
  FROM wedges GROUP BY u, v
)
SELECT p.u, p.v, p.cn, ROUND(p.score, {round_digits}) AS score
FROM pairs p
LEFT JOIN edges e ON p.u = e.src AND p.v = e.dst
WHERE e.src IS NULL AND p.cn >= {min_common}
ORDER BY p.u, p.v"""


def preferential_attachment(
    graph: Graph,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Preferential-attachment scores for NON-adjacent CANDIDATE pairs:
    (u, v, cn, score) with u < v, score = deg(u) * deg(v).

    PA over literally all non-adjacent pairs is O(V^2); like every
    linkpred op here, candidates are restricted to pairs with
    cn >= min_common common neighbors (the wedge candidate set), which
    is also where PA is actually consulted as a ranking baseline."""
    adj = graph.edges.select("src", "dst")
    degw = graph.degrees().select(
        F.col("id").alias("w"), F.col("degree").alias("deg_w")
    )
    if max_neighbor_degree is not None:
        degw = degw.where(F.col("deg_w") <= max_neighbor_degree)
    left = adj.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    right = adj.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (
        left.join(degw.select("w"), "w")
        .join(right, "w")
        .where(F.col("u") < F.col("v"))
    )
    pairs = wedges.groupBy("u", "v").agg(F.count("*").alias("cn"))
    deg = graph.degrees()
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("dv"))
    scored = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u", "v", "cn",
            (F.col("du") * F.col("dv")).cast("long").alias("score"),
        )
    )
    non_adjacent = scored.join(
        adj,
        (scored.u == adj.src) & (scored.v == adj.dst),
        "left_anti",
    )
    return non_adjacent.where(F.col("cn") >= min_common)


def preferential_attachment_oracle_sql(
    edges_cte: str,
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
) -> str:
    """DuckDB twin of ``preferential_attachment``."""
    cap = (
        f"JOIN deg dc ON l.dst = dc.w AND dc.deg_w <= {max_neighbor_degree}"
        if max_neighbor_degree is not None
        else ""
    )
    return f"""WITH {edges_cte},
deg AS (SELECT src AS w, COUNT(*) AS deg_w FROM edges GROUP BY src),
wedges AS (
  SELECT l.src AS u, r.dst AS v
  FROM edges l
  {cap}
  JOIN edges r ON r.src = l.dst
  WHERE l.src < r.dst
),
pairs AS (SELECT u, v, COUNT(*) AS cn FROM wedges GROUP BY u, v)
SELECT p.u, p.v, p.cn, CAST(du.deg_w * dv.deg_w AS BIGINT) AS score
FROM pairs p
JOIN deg du ON p.u = du.w
JOIN deg dv ON p.v = dv.w
LEFT JOIN edges e ON p.u = e.src AND p.v = e.dst
WHERE e.src IS NULL AND p.cn >= {min_common}
ORDER BY p.u, p.v"""


# ------------------------------------------------------------------ SALSA

def salsa(edges: DataFrame, round_digits: int = 8) -> DataFrame:
    """(id, hub, auth) — EXACT SALSA scores (Lempel & Moran 2001) via
    the closed form instead of a power iteration: on the authority
    Markov chain (authority → random in-edge hub → random hub
    out-edge), in-degree is exactly stationary
    (Σ_i in(i)·P[i,j] = in(j)), so within each connected component C
    of the hub–authority support graph

        auth(i) = (|C ∩ A| / |A|) · in(i) / Σ_{j ∈ C ∩ A} in(j)

    with components weighted by their share of authority vertices (the
    paper's uniform-start interpretation); hub(i) symmetric over
    out-degrees. Cost: one hash-min CC over the bipartite support
    (hub/authority roles namespaced onto disjoint node ids — no
    quadratic co-citation projection) plus degree aggregations. All
    arithmetic is one integer-ratio division per score, so the DuckDB
    twin is bit-identical before the final rounding.
    """
    from centrality_gpu_spark.graph import Graph as _G
    from centrality_gpu_spark.operators.components import (
        connected_components,
    )

    e = edges.select("src", "dst").distinct().persist()
    bip = e.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    )
    comp = connected_components(_G.from_undirected_edges(bip))
    # pmod, not %: Spark's % follows the dividend's sign (-3 % 2 == -1),
    # which would silently drop every negative-id vertex from the odd
    # (authority) side; pmod is non-negative for any id.
    auth_comp = comp.where(F.pmod(F.col("id"), F.lit(2)) == 1).select(
        ((F.col("id") - 1) / 2).cast("long").alias("id"), "component"
    )
    hub_comp = comp.where(F.pmod(F.col("id"), F.lit(2)) == 0).select(
        (F.col("id") / 2).cast("long").alias("id"), "component"
    )
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("d")
    )
    outdeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("d")
    )

    def _side(deg: DataFrame, side_comp: DataFrame, col: str) -> DataFrame:
        n_side = deg.count()
        a = deg.join(side_comp, "id")
        agg = a.groupBy("component").agg(
            F.count("*").alias("n_c"), F.sum("d").alias("s_c")
        )
        return a.join(agg, "component").select(
            "id",
            F.round(
                (F.col("n_c") * F.col("d")).cast("double")
                / (F.lit(n_side) * F.col("s_c")).cast("double"),
                round_digits,
            ).alias(col),
        )

    auth = _side(indeg, auth_comp, "auth")
    hub = _side(outdeg, hub_comp, "hub")
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return (
        verts.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
    )


def salsa_oracle_sql(dedges_cte: str, round_digits: int = 8) -> str:
    """DuckDB twin of ``salsa`` (``dedges_cte`` defines
    ``dedges(src, dst)``, directed, deduped). Output (id, hub, auth)
    ordered by id."""
    return f"""WITH RECURSIVE {dedges_cte},
bip AS (
  SELECT src * 2 AS a, dst * 2 + 1 AS b FROM dedges
),
bverts AS (
  SELECT DISTINCT id FROM (
    SELECT a AS id FROM bip UNION ALL SELECT b FROM bip
  )
),
reach(id, l) AS (
  SELECT id, id FROM bverts
  UNION
  SELECT n, r.l FROM reach r
  JOIN (SELECT a AS m, b AS n FROM bip UNION ALL SELECT b, a FROM bip) u
    ON u.m = r.id
),
comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
indeg AS (SELECT dst AS id, COUNT(*) AS d FROM dedges GROUP BY dst),
outdeg AS (SELECT src AS id, COUNT(*) AS d FROM dedges GROUP BY src),
acomp AS (
  SELECT (c.id - 1) // 2 AS id, c.component FROM comp c WHERE ((c.id % 2) + 2) % 2 = 1
),
hcomp AS (
  SELECT c.id // 2 AS id, c.component FROM comp c WHERE ((c.id % 2) + 2) % 2 = 0
),
a1 AS (
  SELECT i.id, i.d, ac.component FROM indeg i JOIN acomp ac ON ac.id = i.id
),
aagg AS (
  SELECT component, COUNT(*) AS n_c, SUM(d) AS s_c FROM a1 GROUP BY component
),
auth AS (
  SELECT a1.id,
         ROUND(CAST(ag.n_c * a1.d AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM indeg) * ag.s_c AS DOUBLE),
               {round_digits}) AS auth
  FROM a1 JOIN aagg ag ON ag.component = a1.component
),
h1 AS (
  SELECT o.id, o.d, hc.component FROM outdeg o JOIN hcomp hc ON hc.id = o.id
),
hagg AS (
  SELECT component, COUNT(*) AS n_c, SUM(d) AS s_c FROM h1 GROUP BY component
),
hub AS (
  SELECT h1.id,
         ROUND(CAST(hg.n_c * h1.d AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM outdeg) * hg.s_c AS DOUBLE),
               {round_digits}) AS hub
  FROM h1 JOIN hagg hg ON hg.component = h1.component
),
verts AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM dedges UNION ALL SELECT dst FROM dedges
  )
)
SELECT v.id, COALESCE(h.hub, 0.0) AS hub, COALESCE(a.auth, 0.0) AS auth
FROM verts v
LEFT JOIN hub h ON h.id = v.id
LEFT JOIN auth a ON a.id = v.id
ORDER BY v.id"""
