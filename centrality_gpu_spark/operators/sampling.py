"""Deterministic k-hop neighbor sampling (GraphSAGE mini-batch style) —
the graph-side training-data primitive: each seed vertex pulls a fixed
fan-out of neighbors per hop, producing the sampled computation-graph
edges a GNN layer stack trains on.

Determinism (same contract as operators/walks.py): at hop h, vertex v
keeps the ``fanout[h]`` neighbors with the smallest
``H(seed_str:h:v:dst)`` where H is the engine's md5→int64 idiom — a
reproducible uniform sample without replacement, replayed identically
by the DuckDB oracle (``sample_neighbors_oracle_sql``).

Scale shape: per hop, ONE equi-join frontier⋈adjacency (Σdeg(frontier)
rows) and one window partitioned by (seed, vertex) — per-vertex state
only, no global ordering anywhere. Frontiers are deduped per seed
between hops, so the row count per hop is bounded by
|seeds| · Π fanouts, not by repeated-path blowup. The adjacency is the
plain persisted edge table; it never re-shuffles across hops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.walks import _h60
from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def sample_neighbors(
    graph: Graph,
    fanouts: list[int],
    seeds: DataFrame | None = None,
    seed: str = "gs",
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Sampled computation-graph edges:
    (seed:long, hop:int, src:long, dst:long) — for each seed vertex,
    hop 1 samples ``fanouts[0]`` of its neighbors, hop 2 samples
    ``fanouts[1]`` neighbors of each hop-1 vertex, and so on. Vertices
    with degree < fanout keep all their neighbors (sampling is without
    replacement).

    ``seeds``: optional (id) DataFrame (default: every vertex — the
    full-graph epoch). Edges are sampled per (seed, vertex) pair, so
    two seeds meeting the same vertex at the same hop draw the same
    neighbor set only if the md5 key says so (the key includes the
    hop and the vertex, not the seed-path — matching the oracle).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    adj = graph.edges.select("src", "dst").persist()
    start = (seeds or graph.vertices()).select(F.col("id").alias("seed"))
    frontier = start.select("seed", F.col("seed").alias("vertex"))
    parts: list[DataFrame] = []
    for h, fan in enumerate(fanouts, start=1):
        cand = frontier.join(adj, frontier.vertex == adj.src)
        hkey = F.concat_ws(
            ":", F.lit(seed), F.lit(h), F.col("vertex"), F.col("dst")
        )
        w = Window.partitionBy("seed", "vertex").orderBy(_h60(hkey), "dst")
        pick = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= fan)
            .select(
                "seed",
                F.lit(h).cast("int").alias("hop"),
                F.col("vertex").alias("src"),
                "dst",
            )
        )
        pick = ckpt.truncate(pick)
        parts.append(pick)
        frontier = pick.select("seed", F.col("dst").alias("vertex")).distinct()
    from centrality_gpu_spark.graph import union_all

    return union_all(parts)


def sample_neighbors_oracle_sql(
    edges_cte: str, fanouts: list[int], seed: str = "gs"
) -> str:
    """DuckDB twin of ``sample_neighbors`` over an ``edges(src, dst,
    weight)`` CTE (both directions), seeds = all vertices: identical
    md5 neighbor ranking, one unrolled CTE pair per hop."""
    parts = [
        edges_cte,
        "dedge AS (SELECT DISTINCT src, dst FROM edges)",
        "f0 AS (SELECT DISTINCT src AS seed, src AS vertex FROM dedge)",
    ]
    for h, fan in enumerate(fanouts, start=1):
        parts.append(
            f"""p{h} AS MATERIALIZED (
  SELECT seed, CAST({h} AS INTEGER) AS hop, vertex AS src, dst FROM (
    SELECT f.seed, f.vertex, a.dst,
           ROW_NUMBER() OVER (
             PARTITION BY f.seed, f.vertex
             ORDER BY CAST(('0x' || substr(md5(
               concat('{seed}', ':', {h}, ':', f.vertex, ':', a.dst)
             ), 1, 15)) AS BIGINT), a.dst
           ) AS rn
    FROM f{h - 1} f JOIN dedge a ON a.src = f.vertex
  ) WHERE rn <= {fan}
)"""
        )
        parts.append(
            f"f{h} AS (SELECT DISTINCT seed, dst AS vertex FROM p{h})"
        )
    selects = [
        f"SELECT seed, hop, src, dst FROM p{h}"
        for h in range(1, len(fanouts) + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY seed, hop, src, dst"
    )
