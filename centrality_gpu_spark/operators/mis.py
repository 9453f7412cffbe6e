"""Symmetry-breaking primitives: Luby maximal independent set and
Jones-Plassmann greedy coloring, deterministic via md5 priorities.

Luby's algorithm (Luby 1986, "A simple parallel algorithm for the
maximal independent set problem") is the canonical BSP symmetry
breaker: each round every still-active vertex compares a random
priority against its active neighbors' priorities; local minima join
the MIS, and they plus their neighbors leave the game. Expected
O(log n) rounds. Jones-Plassmann (1993) reuses the same local-min rule
for graph coloring: local minima are an independent set, so they can
all take the current round index as their color; only they retire.

Determinism: the "random" priority is the engine-standard md5→int64
hex prefix of ``'mis:'||id`` (same idiom as operators/walks.py), with
the vertex id appended as an explicit tie-break — a total order both
Spark and DuckDB compute bit-identically, which is what lets the
driver value-hash an entire unrolled run (``mis_oracle_sql`` /
``jp_coloring_oracle_sql``).

Scale shape: one round = one src-partitioned edge join + a min
aggregation + two anti-joins — O(V) shuffle rows per round against the
pre-partitioned edge table (``Graph.edges_by_src``), never O(E), and
everything stays in JVM whole-stage codegen (no Python in the loop).
Rounds shrink geometrically (Luby removes a constant fraction of edges
per round in expectation), so the wall clock is O(log n) supersteps on
any graph size.

The reference has no MIS/coloring (it is a centrality engine); these
are north-rule additions in the same spirit as LPA — the standard
iterative-graph toolbox a transcript-scale link graph needs (e.g.
conflict-free scheduling of tool groups, distributed locking order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf

# generous fixed round budgets: Luby needs O(log n) rounds w.h.p.; the
# oracle unrolls the same budget, and the Spark side RAISES if the
# budget is exceeded rather than returning a partial result (same
# convergence contract as k_core after the round-1 advice fix)
MIS_MAX_ROUNDS = 16
JP_MAX_ROUNDS = 24


def _priority(id_col):
    """Total-order priority string: md5 of 'mis:<id>' with the decimal
    id appended as tie-break (md5 collisions cannot produce equal
    keys). Identical in DuckDB:
    ``md5('mis:'||CAST(id AS VARCHAR))||'|'||lpad(CAST(id AS VARCHAR),20,'0')``.
    """
    s = id_col.cast("string")
    return F.concat(
        F.md5(F.concat(F.lit("mis:"), s)), F.lit("|"), F.lpad(s, 20, "0")
    )


_PRIORITY_SQL = (
    "md5('mis:' || CAST(id AS VARCHAR)) || '|' || "
    "lpad(CAST(id AS VARCHAR), 20, '0')"
)


@with_iterative_conf
def maximal_independent_set(
    graph: Graph,
    max_rounds: int = MIS_MAX_ROUNDS,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Luby MIS. Returns (id:long, in_mis:int, round:int) covering every
    vertex: ``in_mis=1`` joined the MIS in ``round``; ``in_mis=0`` was
    knocked out by an adjacent round-``round`` winner.

    Raises RuntimeError if ``max_rounds`` is hit with vertices still
    undecided (never returns a partial labeling).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = graph.edges_by_src()
    active = ckpt.truncate(
        graph.vertices().select("id", _priority(F.col("id")).alias("prio"))
    )
    decided: list[DataFrame] = []
    for rnd in range(max_rounds):
        n_active = active.count()
        ckpt.record(op="mis", iteration=rnd, changed=n_active)
        if n_active == 0:
            break
        # min active-neighbor priority per vertex (vertices with no
        # active neighbor see NULL → they are unconditional local minima)
        nbr_min = (
            edges.join(active, edges.src == active.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("prio").alias("nprio"))
        )
        winners = (
            active.join(nbr_min, "id", "left")
            .where(F.col("nprio").isNull() | (F.col("prio") < F.col("nprio")))
            .select("id")
        )
        winners = ckpt.truncate(winners)
        knocked = (
            edges.join(winners, edges.src == winners.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            # only still-active neighbors are knocked out THIS round —
            # without the semi-join a vertex decided earlier would be
            # re-emitted every time a later winner is adjacent to it
            .join(active.select("id"), "id", "left_semi")
            .join(winners, "id", "left_anti")  # adjacent winners impossible; guard anyway
        )
        knocked = ckpt.truncate(knocked)
        decided.append(
            winners.select(
                "id", F.lit(1).alias("in_mis"), F.lit(rnd).alias("round")
            )
        )
        decided.append(
            knocked.select(
                "id", F.lit(0).alias("in_mis"), F.lit(rnd).alias("round")
            )
        )
        active = ckpt.truncate(
            active.join(winners, "id", "left_anti").join(knocked, "id", "left_anti")
        )
    else:
        if active.count() > 0:
            raise RuntimeError(
                f"maximal_independent_set did not decide every vertex in "
                f"{max_rounds} rounds — raise max_rounds"
            )
    from centrality_gpu_spark.graph import union_all

    return union_all(decided)


@with_iterative_conf
def jp_coloring(
    graph: Graph,
    max_rounds: int = JP_MAX_ROUNDS,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Jones-Plassmann coloring with color = round index. Returns
    (id:long, color:int). Each round's local-priority-minima among the
    UNCOLORED vertices form an independent set, take the round index as
    their color, and retire — a proper coloring by construction (two
    neighbors can never both be local minima in the same round).

    Raises RuntimeError if ``max_rounds`` is hit with uncolored
    vertices remaining (round count is the length of the longest
    priority-decreasing path — O(log n / log log n) w.h.p. under the
    md5-uniform priorities).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = graph.edges_by_src()
    active = ckpt.truncate(
        graph.vertices().select("id", _priority(F.col("id")).alias("prio"))
    )
    colored: list[DataFrame] = []
    for rnd in range(max_rounds):
        n_active = active.count()
        ckpt.record(op="jp_coloring", iteration=rnd, changed=n_active)
        if n_active == 0:
            break
        nbr_min = (
            edges.join(active, edges.src == active.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("prio").alias("nprio"))
        )
        winners = (
            active.join(nbr_min, "id", "left")
            .where(F.col("nprio").isNull() | (F.col("prio") < F.col("nprio")))
            .select("id")
        )
        winners = ckpt.truncate(winners)
        colored.append(winners.select("id", F.lit(rnd).alias("color")))
        active = ckpt.truncate(active.join(winners, "id", "left_anti"))
    else:
        if active.count() > 0:
            raise RuntimeError(
                f"jp_coloring did not color every vertex in {max_rounds} "
                f"rounds — raise max_rounds"
            )
    from centrality_gpu_spark.graph import union_all

    return union_all(colored)


# ------------------------------------------------------------- oracles


def mis_oracle_sql(edges_cte: str, rounds: int = MIS_MAX_ROUNDS) -> str:
    """DuckDB twin of ``maximal_independent_set``: the identical md5
    priorities and local-min rule, unrolled ``rounds`` rounds (same
    pattern as ``lpa_oracle_sql``; extra rounds past the fixpoint are
    no-ops because the active set is empty). Output (id, in_mis, round).

    ``edges_cte`` must define ``edges(src, dst, weight)`` with both
    directions present.
    """
    parts = [
        edges_cte,
        "verts AS (SELECT DISTINCT src AS id FROM edges)",
        f"a0 AS MATERIALIZED (SELECT id, {_PRIORITY_SQL} AS prio FROM verts)",
        "d0 AS (SELECT id, 0 AS in_mis, 0 AS round FROM verts WHERE FALSE)",
    ]
    for k in range(rounds):
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT a.id FROM a{k} a
  LEFT JOIN (
    SELECT e.dst AS id, MIN(b.prio) AS nprio
    FROM edges e JOIN a{k} b ON e.src = b.id GROUP BY e.dst
  ) nm ON a.id = nm.id
  WHERE nm.nprio IS NULL OR a.prio < nm.nprio
),
r{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS id FROM edges e JOIN w{k} w ON e.src = w.id
  WHERE e.dst IN (SELECT id FROM a{k})
    AND e.dst NOT IN (SELECT id FROM w{k})
),
d{k + 1} AS MATERIALIZED (
  SELECT * FROM d{k}
  UNION ALL SELECT id, 1 AS in_mis, {k} AS round FROM w{k}
  UNION ALL SELECT id, 0 AS in_mis, {k} AS round FROM r{k}
),
a{k + 1} AS MATERIALIZED (
  SELECT a.* FROM a{k} a
  WHERE a.id NOT IN (SELECT id FROM w{k})
    AND a.id NOT IN (SELECT id FROM r{k})
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, in_mis, round FROM d{rounds} ORDER BY id"
    )


def jp_coloring_oracle_sql(edges_cte: str, rounds: int = JP_MAX_ROUNDS) -> str:
    """DuckDB twin of ``jp_coloring`` (unrolled). Output (id, color)."""
    parts = [
        edges_cte,
        "verts AS (SELECT DISTINCT src AS id FROM edges)",
        f"a0 AS MATERIALIZED (SELECT id, {_PRIORITY_SQL} AS prio FROM verts)",
        "c0 AS (SELECT id, 0 AS color FROM verts WHERE FALSE)",
    ]
    for k in range(rounds):
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT a.id FROM a{k} a
  LEFT JOIN (
    SELECT e.dst AS id, MIN(b.prio) AS nprio
    FROM edges e JOIN a{k} b ON e.src = b.id GROUP BY e.dst
  ) nm ON a.id = nm.id
  WHERE nm.nprio IS NULL OR a.prio < nm.nprio
),
c{k + 1} AS MATERIALIZED (
  SELECT * FROM c{k} UNION ALL SELECT id, {k} AS color FROM w{k}
),
a{k + 1} AS MATERIALIZED (
  SELECT a.* FROM a{k} a WHERE a.id NOT IN (SELECT id FROM w{k})
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, color FROM c{rounds} ORDER BY id"
    )
