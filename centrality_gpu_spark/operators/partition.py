"""Multilevel k-way graph partitioning (assignment + edge-cut metric).

The north rule demands partitioning handled *explicitly*; this operator
makes partition assignment itself a first-class, deterministic output:
the Karypis/Kumar multilevel scheme (coarsen by maximal matching →
assign the coarsest graph → project back), with the KL/FM refinement
pass intentionally omitted — matched pairs are always co-assigned, which
already captures the scheme's main cut saving, and a refinement sweep is
a local-move loop the Louvain operator (``community.py``) demonstrates.

Assignment at the coarsest level is the engine-standard md5→int64 hash
mod k: stateless, uniformly balanced in expectation, and identical in
DuckDB — no global window, no driver state, so the whole pipeline stays
oracle-checkable and scale-shaped (each level costs one matching run
plus one mapping join; the mapping is the only shuffled state).

Use cases at 100 TB: co-locating both endpoints of most edges before an
iterative job (`df.repartition(part)`), sizing bucketed writes, and
measuring how much shuffle a layout would save (``edge_cut_summary``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph

PARTITION_LEVELS = 1


def _md5_int(col):
    """Engine-standard md5→positive-int64 (walks.py idiom)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def partition_graph(
    graph: Graph, k: int, levels: int = PARTITION_LEVELS
) -> DataFrame:
    """(id, part) — a deterministic k-way assignment of every vertex,
    part ∈ [0, k). ``levels`` coarsening rounds roughly halve V each
    time before assignment; matched pairs land in the same part by
    construction (they share a coarse representative)."""
    from centrality_gpu_spark.operators.matching import (
        contract_matching,
        maximal_matching,
    )

    mappings: list[DataFrame] = []
    cur = graph
    for _ in range(levels):
        m = maximal_matching(cur)
        coarse, mapping = contract_matching(cur, m)
        mappings.append(mapping.localCheckpoint())
        cur = Graph.from_symmetric_edges(coarse)
    # fine id -> coarsest representative
    full = mappings[0]
    for mp in mappings[1:]:
        full = (
            full.join(
                mp.select(F.col("id").alias("rep"), F.col("rep").alias("rep2")),
                "rep",
            )
            .select("id", F.col("rep2").alias("rep"))
        )
    assign = (
        cur.vertices()
        .select(
            F.col("id").alias("rep"),
            F.pmod(
                _md5_int(F.concat(F.lit("part:"), F.col("id").cast("string"))),
                F.lit(k),
            ).cast("int").alias("part"),
        )
    )
    return full.join(assign, "rep").select("id", "part")


def edge_cut_summary(graph: Graph, parts: DataFrame) -> DataFrame:
    """One row (k_parts, cut_weight, total_weight, cut_fraction,
    min_part_size, max_part_size) for an assignment ``parts(id, part)``
    — the shuffle a layout would save, quantified."""
    e = graph.edges_by_src()
    j = (
        e.join(parts.select(F.col("id").alias("src"), F.col("part").alias("ps")), "src")
        .join(parts.select(F.col("id").alias("dst"), F.col("part").alias("pd")), "dst")
    )
    agg = j.agg(
        (F.sum(F.when(F.col("ps") != F.col("pd"), F.col("weight")).otherwise(0.0)) / 2)
        .alias("cut_weight"),
        (F.sum("weight") / 2).alias("total_weight"),
    )
    sizes = parts.groupBy("part").count()
    size_agg = sizes.agg(
        F.countDistinct("part").cast("long").alias("k_parts"),
        F.min("count").alias("min_part_size"),
        F.max("count").alias("max_part_size"),
    )
    return agg.crossJoin(size_agg).select(
        "k_parts",
        F.round("cut_weight", 6).alias("cut_weight"),
        F.round("total_weight", 6).alias("total_weight"),
        F.round(F.col("cut_weight") / F.col("total_weight"), 6).alias("cut_fraction"),
        "min_part_size",
        "max_part_size",
    )


_MD5_INT_SQL = (
    "CAST(('0x' || substr(md5('part:' || CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT)"
)


def _partition_ctes(edges_cte: str, k: int, rounds: int) -> str:
    """CTE chain ending in ``parts(id, part)`` for one coarsening level
    over the unrolled matching chain."""
    from centrality_gpu_spark.operators.matching import matching_oracle_sql

    base = matching_oracle_sql(edges_cte, rounds)
    prefix = base[len("WITH "): base.rindex("SELECT src, dst, round")].rstrip()
    h = _MD5_INT_SQL.format(col="r.rep")
    return f"""{prefix},
mapping AS (
  SELECT v.id, COALESCE(m.src, v.id) AS rep
  FROM (SELECT DISTINCT src AS id FROM edges) v
  LEFT JOIN m{rounds} m ON m.dst = v.id
),
assign AS (
  SELECT r.rep, CAST({h} % {k} AS INTEGER) AS part
  FROM (SELECT DISTINCT rep FROM mapping) r
),
parts AS (
  SELECT mp.id, a.part FROM mapping mp JOIN assign a ON a.rep = mp.rep
)"""


def partition_oracle_sql(edges_cte: str, k: int, rounds: int | None = None) -> str:
    """DuckDB twin of ``partition_graph(levels=1)``. Output (id, part)
    ordered by id."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(edges_cte, k, rounds or MATCHING_MAX_ROUNDS)
    return f"WITH {ctes}\nSELECT id, part FROM parts ORDER BY id"


def edge_cut_oracle_sql(edges_cte: str, k: int, rounds: int | None = None) -> str:
    """DuckDB twin of ``edge_cut_summary`` over the level-1 partition.
    One row."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(edges_cte, k, rounds or MATCHING_MAX_ROUNDS)
    return f"""WITH {ctes},
cut AS (
  SELECT SUM(CASE WHEN a.part <> b.part THEN e.weight ELSE 0 END) / 2 AS cut_weight,
         SUM(e.weight) / 2 AS total_weight
  FROM edges e
  JOIN parts a ON a.id = e.src
  JOIN parts b ON b.id = e.dst
),
sizes AS (SELECT part, COUNT(*) AS n FROM parts GROUP BY part)
SELECT CAST(COUNT(*) AS BIGINT) AS k_parts,
       ROUND((SELECT cut_weight FROM cut), 6) AS cut_weight,
       ROUND((SELECT total_weight FROM cut), 6) AS total_weight,
       ROUND((SELECT cut_weight / total_weight FROM cut), 6) AS cut_fraction,
       MIN(n) AS min_part_size,
       MAX(n) AS max_part_size
FROM sizes"""
