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
