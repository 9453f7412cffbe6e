"""Label propagation (community detection) — deterministic variant.

Synchronous LPA: every vertex adopts the most frequent label among its
neighbors *plus its own current label* (the self-vote damps the 2-cycle
oscillation synchronous LPA exhibits on bipartite structures); ties
break to the smallest label. Deterministic by construction — required
for exact-match testing (SURVEY.md §5, FIXTURES.md §5; networkx's LPA
is randomized so the oracle is a small numpy re-implementation in
tests).

Superstep = one join + one count aggregation + one ``max_by`` pick:
the vote count shuffles O(Σ deg distinct labels) rows; ``max_by`` over
a (count, -label) struct is the deterministic argmax, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf


@with_iterative_conf
def label_propagation(
    graph: Graph,
    max_iterations: int = 20,
    checkpoint: CheckpointManager | None = None,
    weighted: bool = False,
    self_weight: float = 1.0,
) -> DataFrame:
    """Return (id, label) after convergence or ``max_iterations``.

    ``weighted=True``: votes carry the incident edge weight instead of
    1 (the self-vote carries ``self_weight``) — neighbor-majority
    becomes neighbor-weight-majority. Vote sums stay engine-exact when
    weights are integers or binary fractions (the testdata contract
    every weighted operator here relies on), so the weighted mode is
    oracle-checkable like the unweighted one.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = graph.edges_by_src()  # src-partitioned: only labels shuffle per iter

    name = "labelprop_w" if weighted else "labelprop"
    start_iter = 0
    resumed = ckpt.latest_epoch(name)
    if resumed is not None:
        start_iter, labels, _ = resumed
        start_iter += 1
    else:
        labels = graph.vertices().select("id", F.col("id").alias("label"))
        labels = ckpt.truncate(labels)

    for it in range(start_iter, max_iterations):
        wcol = (
            F.col("weight").cast("double") if weighted else F.lit(1.0)
        )
        neighbor_votes = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "label", wcol.alias("wt")
        )
        votes = neighbor_votes.unionByName(
            labels.select(
                "id", "label", F.lit(float(self_weight)).alias("wt")
            )
        )
        counts = votes.groupBy("id", "label").agg(F.sum("wt").alias("cnt"))
        new_labels = counts.groupBy("id").agg(
            F.max_by(
                "label", F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
            ).alias("label")
        )
        new_labels = ckpt.truncate(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        ckpt.record(op=name, iteration=it, changed=changed)
        labels = new_labels
        if ckpt.should_save(it):
            ckpt.save_epoch(labels, name, it)
        if changed == 0:
            break
    return labels


def lpa_oracle_sql(
    edges_cte: str,
    iterations: int,
    weighted: bool = False,
    self_weight: float = 1.0,
) -> str:
    """DuckDB SQL computing the *identical* synchronous LPA recurrence
    by unrolling ``iterations`` rounds (same pattern as
    ``pagerank_oracle_sql``; recursive CTEs can't aggregate per step in
    DuckDB 1.0).

    Equivalence to ``label_propagation(g, max_iterations=K)``: the
    update is a deterministic function of the previous labeling, and
    Spark's early stop fires only at a fixpoint — where further rounds
    are no-ops — so K unrolled rounds give the same labels whether or
    not Spark stopped early.

    ``edges_cte`` must define ``edges(src, dst, weight)`` holding both
    directions. Output: (id, label).
    """
    return (
        "WITH " + edges_cte + ",\n"
        + lpa_ctes("edges", iterations, weighted, self_weight)
        + f"\nSELECT id, label FROM l{iterations} ORDER BY id"
    )


def lpa_ctes(
    edges_name: str,
    iterations: int,
    weighted: bool = False,
    self_weight: float = 1.0,
    prefix: str = "",
) -> str:
    """CTE chunk (no WITH, no final SELECT) unrolling ``iterations`` of
    the synchronous-LPA recurrence over the CTE named ``edges_name``.
    All CTE names carry ``prefix`` so LPA can chain inside a larger
    statement (the multilevel partitioner's coarsest-level init); the
    labeling lands in ``{prefix}l{iterations}(id, label)``."""
    p = prefix
    wexpr = "CAST(e.weight AS DOUBLE)" if weighted else "1.0"
    parts = [
        f"{p}l0 AS (SELECT DISTINCT src AS id, src AS label "
        f"FROM {edges_name})",
    ]
    for k in range(iterations):
        # l{k+1} MATERIALIZED: each step reads its predecessor twice
        # (neighbor join + self-vote) — without materialization DuckDB
        # inlines the chain into a 2^iterations plan
        parts.append(
            f"""{p}v{k} AS (
  SELECT e.dst AS id, l.label, {wexpr} AS wt
  FROM {edges_name} e JOIN {p}l{k} l ON e.src = l.id
  UNION ALL
  SELECT id, label, {float(self_weight)} AS wt FROM {p}l{k}
),
{p}c{k} AS (SELECT id, label, SUM(wt) AS cnt FROM {p}v{k} GROUP BY id, label),
{p}l{k + 1} AS MATERIALIZED (
  SELECT id, label FROM (
    SELECT id, label,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
    FROM {p}c{k}
  ) WHERE rn = 1
)"""
        )
    return ",\n".join(parts)
