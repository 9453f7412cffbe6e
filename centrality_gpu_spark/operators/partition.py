"""Multilevel k-way graph partitioning (assignment, refinement, edge-cut).

The north rule demands partitioning handled *explicitly*; this operator
makes partition assignment itself a first-class, deterministic output:
the Karypis/Kumar multilevel scheme (coarsen by maximal matching →
assign the coarsest graph → project back), plus a balanced
label-propagation refinement sweep (``refine_partition``, the
Spinner/ParMETIS local-move idea re-expressed with the Louvain
operator's deterministic direction gate) that moves each vertex toward
its neighbor-majority part under a hard per-part capacity.

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import (
    CheckpointManager,
    with_iterative_conf,
)

PARTITION_LEVELS = 1
REFINE_ROUNDS = 8
REFINE_SLACK_PCT = 25


def _md5_int(col):
    """Engine-standard md5→positive-int64 (walks.py idiom)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def partition_graph(
    graph: Graph, k: int, levels: int = PARTITION_LEVELS,
    match_rounds: int | None = None,
) -> DataFrame:
    """(id, part) — a deterministic k-way assignment of every vertex,
    part ∈ [0, k). ``levels`` coarsening rounds roughly halve V each
    time before assignment; matched pairs land in the same part by
    construction (they share a coarse representative).

    ``match_rounds``: truncate each level's matching to this many
    local-min rounds (non-maximal, ``allow_partial``) — coarsening only
    needs *a* matching, and the early rounds claim most pairs, so a
    small budget buys nearly the same contraction at a fraction of the
    supersteps. None = run to maximality (the oracle-checked default).
    """
    from centrality_gpu_spark.operators.matching import (
        MATCHING_MAX_ROUNDS,
        contract_matching,
        maximal_matching,
    )

    mappings: list[DataFrame] = []
    cur = graph
    for _ in range(levels):
        m = maximal_matching(
            cur,
            max_rounds=match_rounds or MATCHING_MAX_ROUNDS,
            allow_partial=match_rounds is not None,
        )
        coarse, mapping = contract_matching(cur, m.localCheckpoint())
        mappings.append(mapping.localCheckpoint())
        # checkpoint the coarse edge table: the next level's matching,
        # num_edges gate, and the final assignment all re-read it —
        # without this the whole contraction lineage re-executes per
        # consumer
        cur = Graph.from_symmetric_edges(coarse.localCheckpoint())
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


@with_iterative_conf
def refine_partition(
    graph: Graph,
    parts: DataFrame,
    k: int,
    rounds: int = REFINE_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, part) — ``parts`` after up to ``rounds`` synchronous
    balanced label-propagation sweeps: each round every vertex scores
    each neighboring part by incident edge weight and moves to the
    heaviest one, subject to

    * **capacity**: a part never grows beyond
      ``cap = ceil(n·(100+slack_pct) / (100·k))`` — each round's movers
      into a part are ranked (gain desc, id asc) and only the first
      ``cap − load`` admitted (a part whose *initial* size already
      exceeds cap is never force-evicted; it only shrinks as members
      find gainful moves out). The per-(round, part) ranking window is
      one task per target part, bounded by that round's mover count
      (movers shrink geometrically);
    * **strict gain**: ``w(target) > w(current)``, ties stay put, then
      break to the smallest part id;
    * **direction gate**: part-id-decreasing moves on even rounds,
      increasing on odd — the Louvain operator's deterministic fix for
      the two-coloring oscillation of synchronous label updates.

    Stops early at a fixpoint (no gainful admissible move in either
    direction); extra rounds past the fixpoint are no-ops, which is
    what makes the fixed-``rounds`` DuckDB twin exact. Per round: one
    edges⋈assignment shuffle (the cached edges-by-src exchange is
    reused), one (vertex, part) aggregation, one k-row load table.
    Refinement is best-effort (synchronous moves can transiently raise
    the cut); measure with ``edge_cut_summary``.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    e = graph.edges_by_src()
    assign = ckpt.truncate(
        parts.select("id", F.col("part").cast("int").alias("part"))
    )
    n = assign.count()
    cap = (n * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    for rnd in range(rounds):
        loads = assign.groupBy("part").agg(F.count("*").alias("load"))
        nbrw = (
            e.join(
                assign.select(
                    F.col("id").alias("dst"), F.col("part").alias("c")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("weight").alias("w"))
        )
        cur = assign.select("id", F.col("part").alias("cur"))
        cand = (
            nbrw.unionByName(
                cur.select("id", F.col("cur").alias("c"), F.lit(0.0).alias("w"))
            )
            .groupBy("id", "c")
            .agg(F.max("w").alias("w"))
        )
        cand = (
            cand.join(cur, "id")
            .join(loads.select(F.col("part").alias("c"), "load"), "c", "left")
            .withColumn("load", F.coalesce("load", F.lit(0)))
            .where((F.col("c") == F.col("cur")) | (F.col("load") < F.lit(cap)))
        )
        best = (
            cand.groupBy("id")
            .agg(
                F.max_by(
                    F.struct("c", "w"),
                    F.struct(
                        F.col("w"),
                        F.when(F.col("c") == F.col("cur"), 1)
                        .otherwise(0)
                        .alias("is_cur"),
                        (-F.col("c")).alias("nc"),
                    ),
                ).alias("b"),
                F.max(F.when(F.col("c") == F.col("cur"), F.col("w"))).alias(
                    "wcur"
                ),
                F.first("cur").alias("cur"),
            )
            .select(
                "id",
                F.col("b.c").alias("target"),
                F.col("b.w").alias("wbest"),
                "wcur",
                "cur",
            )
        )
        movable = (F.col("target") != F.col("cur")) & (
            F.col("wbest") > F.col("wcur")
        )
        dir_ok = (
            F.col("target") < F.col("cur")
            if rnd % 2 == 0
            else F.col("target") > F.col("cur")
        )
        best = best.persist()
        counts = best.agg(
            F.sum(F.when(movable, 1).otherwise(0)).alias("all_movable"),
            F.sum(F.when(movable & dir_ok, 1).otherwise(0)).alias("this_dir"),
        ).collect()[0]
        ckpt.record(
            op="refine_partition",
            iteration=rnd,
            movable=int(counts["all_movable"] or 0),
        )
        if not counts["all_movable"]:
            best.unpersist()
            break
        if counts["this_dir"]:
            adm = Window.partitionBy("target").orderBy(
                F.desc("wbest"), F.asc("id")
            )
            moves = (
                best.where(movable & dir_ok)
                .join(
                    loads.select(F.col("part").alias("target"), "load"),
                    "target",
                    "left",
                )
                .withColumn("load", F.coalesce("load", F.lit(0)))
                .withColumn("rn", F.row_number().over(adm))
                .where(F.col("load") + F.col("rn") <= F.lit(cap))
                .select("id", F.col("target").alias("np"))
            )
            assign = ckpt.truncate(
                assign.join(moves, "id", "left").select(
                    "id",
                    F.coalesce("np", "part").cast("int").alias("part"),
                )
            )
        best.unpersist()
    return assign


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


def _refine_ctes(k: int, rounds: int, slack_pct: int) -> str:
    """CTE chain from ``parts(id, part)`` to ``rp{rounds}(id, part)`` —
    the unrolled ``refine_partition`` (extra rounds past the fixpoint
    are no-ops, so a fixed unroll is exact)."""
    out = [
        "rp0 AS MATERIALIZED (SELECT id, part FROM parts)",
        f"caps AS (SELECT (COUNT(*) * {100 + slack_pct} + {100 * k} - 1) "
        f"// {100 * k} AS cap FROM rp0)",
    ]
    for r in range(rounds):
        gate = "target < cur" if r % 2 == 0 else "target > cur"
        out.append(f"""rfld{r} AS MATERIALIZED (
  SELECT part, COUNT(*) AS load FROM rp{r} GROUP BY part
),
rfcd{r} AS MATERIALIZED (
  SELECT id, c, MAX(w) AS w FROM (
    SELECT e.src AS id, p.part AS c, SUM(e.weight) AS w
    FROM edges e JOIN rp{r} p ON p.id = e.dst GROUP BY e.src, p.part
    UNION ALL SELECT id, part AS c, 0.0 AS w FROM rp{r}
  ) GROUP BY id, c
),
rfbs{r} AS MATERIALIZED (
  SELECT id, cur, c AS target, w AS wbest,
         MAX(CASE WHEN c = cur THEN w END) OVER (PARTITION BY id) AS wcur,
         ROW_NUMBER() OVER (PARTITION BY id
           ORDER BY w DESC, (c = cur) DESC, c ASC) AS rk
  FROM (
    SELECT cd.id, cd.c, cd.w, p.part AS cur
    FROM rfcd{r} cd JOIN rp{r} p ON p.id = cd.id
    LEFT JOIN rfld{r} l ON l.part = cd.c
    WHERE cd.c = p.part OR COALESCE(l.load, 0) < (SELECT cap FROM caps)
  )
),
rfmv{r} AS MATERIALIZED (
  SELECT b.id, b.target,
         COALESCE(l.load, 0) + ROW_NUMBER() OVER (
           PARTITION BY b.target ORDER BY b.wbest DESC, b.id ASC
         ) <= (SELECT cap FROM caps) AS admit
  FROM (SELECT * FROM rfbs{r}
        WHERE rk = 1 AND target <> cur AND wbest > wcur AND {gate}) b
  LEFT JOIN rfld{r} l ON l.part = b.target
),
rp{r + 1} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN m.admit THEN m.target ELSE p.part END AS part
  FROM rp{r} p
  LEFT JOIN rfmv{r} m ON m.id = p.id
)""")
    return ",\n".join(out)


def refined_partition_oracle_sql(
    edges_cte: str,
    k: int,
    rounds: int | None = None,
    refine_rounds: int = REFINE_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
) -> str:
    """DuckDB twin of ``refine_partition(partition_graph(levels=1))``.
    Output (id, part) ordered by id."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(edges_cte, k, rounds or MATCHING_MAX_ROUNDS)
    refine = _refine_ctes(k, refine_rounds, slack_pct)
    return (
        f"WITH {ctes},\n{refine}\n"
        f"SELECT id, part FROM rp{refine_rounds} ORDER BY id"
    )


def refined_edge_cut_oracle_sql(
    edges_cte: str,
    k: int,
    rounds: int | None = None,
    refine_rounds: int = REFINE_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
) -> str:
    """DuckDB twin of ``edge_cut_summary`` over the refined level-1
    partition. One row."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(edges_cte, k, rounds or MATCHING_MAX_ROUNDS)
    refine = _refine_ctes(k, refine_rounds, slack_pct)
    return f"""WITH {ctes},
{refine},
cut AS (
  SELECT SUM(CASE WHEN a.part <> b.part THEN e.weight ELSE 0 END) / 2 AS cut_weight,
         SUM(e.weight) / 2 AS total_weight
  FROM edges e
  JOIN rp{refine_rounds} a ON a.id = e.src
  JOIN rp{refine_rounds} b ON b.id = e.dst
),
sizes AS (SELECT part, COUNT(*) AS n FROM rp{refine_rounds} GROUP BY part)
SELECT CAST(COUNT(*) AS BIGINT) AS k_parts,
       ROUND((SELECT cut_weight FROM cut), 6) AS cut_weight,
       ROUND((SELECT total_weight FROM cut), 6) AS total_weight,
       ROUND((SELECT cut_weight / total_weight FROM cut), 6) AS cut_fraction,
       MIN(n) AS min_part_size,
       MAX(n) AS max_part_size
FROM sizes"""


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
