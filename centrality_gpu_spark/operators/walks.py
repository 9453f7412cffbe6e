"""Deterministic random-walk corpus generation (DeepWalk/node2vec-p1q1
style) — a training-data pipeline operator: walk sequences are the
pretraining corpus for graph embeddings, exactly like the dedup/ANN ops
feed text-model pipelines.

Determinism (the whole point, and what makes it oracle-checkable): the
walker at (start, walk, step) picks neighbor index

    H(start:walk:step) mod deg(vertex)

where H is the engine's md5→int64 idiom (first 15 hex chars of md5,
``operators/dedup.py`` MD5_SIMHASH_BITS) and the neighbor order is the
dst-sorted adjacency rank. Both sides — Spark and DuckDB — compute the
identical walk, so the driver hash-checks the full corpus. Seeding ≅
changing the hash prefix.

Scale shape: one ranked adjacency table (window partitioned BY SRC —
embarrassingly parallel), then ONE equi-join per step on
(vertex, choice) = (src, rank): the walker set never fans out (each
walker matches exactly one adjacency row), and each step shuffles only
the O(walkers) frontier, never the edges. Walk length is small and
fixed (8-80 in practice) — the step loop is the BFS superstep loop the
engine runs everywhere, with persist-per-step lineage truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def _h60(col):
    """Engine-standard md5→positive-int64 (15 hex chars = 60 bits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ranked_adjacency(graph: Graph) -> DataFrame:
    """(src, dst, rank, deg): dst-sorted neighbor rank per src (0-based)
    + the src degree. The window is partitioned by src, so it scales as
    an ordinary per-vertex sort."""
    w = Window.partitionBy("src").orderBy("dst")
    adj = graph.edges.select("src", "dst").withColumn(
        "rank", F.row_number().over(w) - 1
    )
    deg = adj.groupBy("src").agg(F.count("*").alias("deg"))
    return adj.join(deg, "src")


def random_walks(
    graph: Graph,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    starts: DataFrame | None = None,
    seed: str = "rw",
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Walk corpus as (start:long, walk:int, step:int, vertex:long),
    one row per walk position, steps 0..walk_length.

    ``starts``: optional (id) DataFrame of start vertices (default: all
    vertices — the DeepWalk corpus). ``seed`` changes every choice.
    Symmetric graphs have no dead ends (deg ≥ 1 everywhere), so every
    walk reaches full length.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    adj = ranked_adjacency(graph).persist()
    start_df = (starts or graph.vertices()).select(F.col("id").alias("start"))
    cur = start_df.select(
        "start",
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk"),
    ).select(
        "start", F.col("walk").cast("int").alias("walk"), F.col("start").alias("vertex")
    )
    out = cur.select("start", "walk", F.lit(0).cast("int").alias("step"), "vertex")
    for t in range(1, walk_length + 1):
        key = F.concat_ws(
            ":", F.lit(seed), F.col("start"), F.col("walk"), F.lit(t)
        )
        stepped = (
            cur.join(adj, cur.vertex == adj.src)
            .where(F.col("rank") == F.pmod(_h60(key), F.col("deg")))
            .select("start", "walk", F.col("dst").alias("vertex"))
        )
        cur = ckpt.truncate(stepped)
        out = out.unionByName(
            cur.select("start", "walk", F.lit(t).cast("int").alias("step"), "vertex")
        )
    return out


TWO60 = float(1 << 60)  # md5-60bit → uniform [0,1) divisor


def node2vec_walks(
    graph: Graph,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    starts: DataFrame | None = None,
    seed: str = "n2v",
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016):
    from current vertex v (arrived from t), candidate x is weighted
    1/p if x == t (return), 1 if x is adjacent to t (BFS-ish), else
    1/q (DFS-ish). Output (start, walk, step, vertex), like
    ``random_walks``.

    Determinism: the walker at (start, walk, step) draws u =
    H(seed:start:walk:step)/2^60 ∈ [0,1) (the engine's md5→int64
    idiom) and picks the first candidate, in dst-rank order, whose
    cumulative weight exceeds u·Σweights — inverse-CDF sampling with a
    deterministic uniform, so the DuckDB oracle
    (``node2vec_oracle_sql``) replays the identical corpus. Weights
    that are exact binary fractions (p, q ∈ {0.25, 0.5, 1, 2, 4})
    make the float cumsums bit-identical across engines.

    Scale shape: per step, one equi-join frontier⋈adjacency (Σdeg(cur)
    candidate rows), one LEFT equi-join marking distance-1 candidates
    against the edge set, and a window partitioned per walker — the
    same frontier-only shuffle discipline as ``random_walks``; the
    edge table itself never re-shuffles (adj is persisted once).
    Step 1 has no predecessor and is uniform (H mod deg).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    adj = ranked_adjacency(graph).persist()
    edge_set = adj.select(
        F.col("src").alias("nb_src"), F.col("dst").alias("nb_dst")
    )
    start_df = (starts or graph.vertices()).select(F.col("id").alias("start"))
    cur = start_df.select(
        "start",
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk"),
    ).select(
        "start", F.col("walk").cast("int").alias("walk"),
        F.col("start").alias("vertex"),
    )
    out = cur.select("start", "walk", F.lit(0).cast("int").alias("step"), "vertex")
    if walk_length == 0:
        return out

    def hkey(t):
        return F.concat_ws(":", F.lit(seed), F.col("start"), F.col("walk"), F.lit(t))

    # step 1: uniform (no predecessor) — H mod deg over the dst-rank order
    step1 = (
        cur.join(adj, cur.vertex == adj.src)
        .where(F.col("rank") == F.pmod(_h60(hkey(1)), F.col("deg")))
        .select(
            "start", "walk", F.col("dst").alias("vertex"),
            F.col("src").alias("prev"),
        )
    )
    cur = ckpt.truncate(step1)
    out = out.unionByName(
        cur.select("start", "walk", F.lit(1).cast("int").alias("step"), "vertex")
    )
    ret_w = 1.0 / p
    far_w = 1.0 / q
    for t in range(2, walk_length + 1):
        cand = (
            cur.join(adj, cur.vertex == adj.src)
            .join(
                edge_set,
                (F.col("prev") == F.col("nb_src")) & (F.col("dst") == F.col("nb_dst")),
                "left",
            )
            .select(
                "start", "walk", F.col("vertex").alias("cur"), "prev",
                "dst", "rank",
                F.when(F.col("dst") == F.col("prev"), F.lit(ret_w))
                .when(F.col("nb_src").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(far_w))
                .alias("wgt"),
            )
        )
        wk = Window.partitionBy("start", "walk")
        wcum = wk.orderBy("rank")
        u = (_h60(hkey(t)).cast("double") / F.lit(TWO60)) * F.sum("wgt").over(wk)
        picked = (
            cand.withColumn("cw", F.sum("wgt").over(wcum))
            .withColumn("uw", u)
            .where(
                (F.col("cw") - F.col("wgt") <= F.col("uw"))
                & (F.col("uw") < F.col("cw"))
            )
            .select(
                "start", "walk", F.col("dst").alias("vertex"),
                F.col("cur").alias("prev"),
            )
        )
        cur = ckpt.truncate(picked)
        out = out.unionByName(
            cur.select("start", "walk", F.lit(t).cast("int").alias("step"), "vertex")
        )
    return out


def node2vec_oracle_sql(
    edges_cte: str,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: str = "n2v",
) -> str:
    """DuckDB twin of ``node2vec_walks``: identical md5 uniforms,
    identical inverse-CDF pick over the dst-rank cumulative weights."""
    ret_w, far_w = repr(1.0 / p), repr(1.0 / q)
    parts = [
        edges_cte,
        "dedge AS (SELECT DISTINCT src, dst FROM edges)",
        "adjr AS (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk "
        "FROM dedge)",
        "wdeg AS (SELECT src AS id, COUNT(*) AS deg FROM dedge GROUP BY src)",
        "w0 AS (SELECT id AS start, CAST(walks.w AS INTEGER) AS walk, "
        "id AS vertex, CAST(NULL AS BIGINT) AS prev FROM wdeg CROSS JOIN "
        f"(SELECT UNNEST(RANGE({walks_per_vertex})) AS w) walks)",
    ]
    if walk_length >= 1:
        parts.append(
            f"""w1 AS MATERIALIZED (
  SELECT w.start, w.walk, a.dst AS vertex, w.vertex AS prev
  FROM w0 w
  JOIN wdeg d ON w.vertex = d.id
  JOIN adjr a ON a.src = w.vertex
   AND a.rnk = CAST(('0x' || substr(md5(
         concat('{seed}', ':', w.start, ':', w.walk, ':', 1)
       ), 1, 15)) AS BIGINT) % d.deg
)"""
        )
    for t in range(2, walk_length + 1):
        parts.append(
            f"""cand{t} AS (
  SELECT w.start, w.walk, w.vertex AS cur, w.prev, a.dst, a.rnk,
         CASE WHEN a.dst = w.prev THEN {ret_w}
              WHEN nb.src IS NOT NULL THEN 1.0
              ELSE {far_w} END AS wgt,
         CAST(('0x' || substr(md5(
           concat('{seed}', ':', w.start, ':', w.walk, ':', {t})
         ), 1, 15)) AS BIGINT) / {TWO60!r} AS u
  FROM w{t - 1} w
  JOIN adjr a ON a.src = w.vertex
  LEFT JOIN dedge nb ON nb.src = w.prev AND nb.dst = a.dst
)"""
        )
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT start, walk, dst AS vertex, cur AS prev FROM (
    SELECT *,
           SUM(wgt) OVER (PARTITION BY start, walk ORDER BY rnk) AS cw,
           SUM(wgt) OVER (PARTITION BY start, walk) AS tw
    FROM cand{t}
  ) WHERE cw - wgt <= u * tw AND u * tw < cw
)"""
        )
    selects = [
        f"SELECT start, walk, CAST({t} AS INTEGER) AS step, vertex FROM w{t}"
        for t in range(walk_length + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY start, walk, step"
    )


def random_walks_oracle_sql(
    edges_cte: str,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    seed: str = "rw",
) -> str:
    """DuckDB twin of ``random_walks`` over an ``edges(src, dst,
    weight)`` CTE (both directions): identical md5 choices, identical
    dst-rank adjacency, unrolled one CTE per step."""
    parts = [
        edges_cte,
        "dedge AS (SELECT DISTINCT src, dst FROM edges)",
        "adjr AS (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk "
        "FROM dedge)",
        "wdeg AS (SELECT src AS id, COUNT(*) AS deg FROM dedge GROUP BY src)",
        "w0 AS (SELECT id AS start, CAST(walks.w AS INTEGER) AS walk, "
        f"id AS vertex FROM wdeg CROSS JOIN "
        f"(SELECT UNNEST(RANGE({walks_per_vertex})) AS w) walks)",
    ]
    for t in range(1, walk_length + 1):
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT w.start, w.walk, a.dst AS vertex
  FROM w{t - 1} w
  JOIN wdeg d ON w.vertex = d.id
  JOIN adjr a ON a.src = w.vertex
   AND a.rnk = CAST(('0x' || substr(md5(
         concat('{seed}', ':', w.start, ':', w.walk, ':', {t})
       ), 1, 15)) AS BIGINT) % d.deg
)"""
        )
    selects = [
        f"SELECT start, walk, CAST({t} AS INTEGER) AS step, vertex FROM w{t}"
        for t in range(walk_length + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY start, walk, step"
    )
