"""Weisfeiler–Leman (1-WL) color refinement and graph fingerprints.

Iterated neighborhood hashing: every vertex's label is rehashed each
round from its own label plus the sorted multiset of its neighbors'
labels. After k rounds two vertices share a label only if their k-hop
unfolded neighborhoods are indistinguishable — the standard structural
fingerprint for graph/subgraph dedup (the graph-level analog of the
document fingerprints in ``operators/text.py``, and the classical
isomorphism-rejection test).

Engine shape: one ``groupBy(dst)`` label-multiset aggregation per
round — identical shuffle profile to the LPA/hash-min supersteps, so
it inherits their scale behavior (labels are the only per-round shuffle
traffic; edges stay src-partitioned). md5 throughout — DuckDB computes
the identical digests, which is what makes the refinement
driver-oracle-checkable term for term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf

DEFAULT_WL_ITERATIONS = 3


@with_iterative_conf
def wl_labels(
    graph: Graph,
    iterations: int = DEFAULT_WL_ITERATIONS,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, wl_label) — md5 hex color after ``iterations`` refinement
    rounds, starting from the degree color md5('d:' || degree).

    Round update (canonical 1-WL): lbl' = md5(lbl || '|' || join(sorted
    neighbor lbls, '|')). Sorting the collected neighbor labels makes
    the aggregation order-insensitive, so the distributed result is
    deterministic and equal to the DuckDB twin's ordered string_agg.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = graph.edges_by_src()
    labels = graph.degrees().select(
        "id", F.md5(F.concat(F.lit("d:"), F.col("degree").cast("string"))).alias("lbl")
    )
    labels = ckpt.truncate(labels)
    for it in range(iterations):
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("lbl").alias("nl")
        )
        nbr = msgs.groupBy("id").agg(
            F.array_join(F.array_sort(F.collect_list("nl")), "|").alias("ns")
        )
        labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat_ws("|", F.col("lbl"), F.coalesce("ns", F.lit("")))
                ).alias("lbl"),
            )
        )
        labels = ckpt.truncate(labels)
        ckpt.record(op="wl_labels", iteration=it)
    return labels.select("id", F.col("lbl").alias("wl_label"))


def wl_graph_hash(graph: Graph, iterations: int = DEFAULT_WL_ITERATIONS) -> DataFrame:
    """One row (wl_hash, n_colors) — md5 of the sorted final color
    multiset (the whole-graph fingerprint: equal for isomorphic graphs,
    already distinguishing for most non-isomorphic pairs) plus the
    number of distinct colors (the refinement's partition size)."""
    lbls = wl_labels(graph, iterations)
    return lbls.agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("wl_label")), "|")).alias(
            "wl_hash"
        ),
        F.countDistinct("wl_label").alias("n_colors"),
    )


def wl_labels_oracle_sql(
    edges_cte: str, iterations: int = DEFAULT_WL_ITERATIONS
) -> str:
    """DuckDB twin of ``wl_labels`` — the identical md5 chain with
    ordered string_agg for the neighbor multiset. Output
    (id, wl_label) ordered by id."""
    rounds = []
    for k in range(1, iterations + 1):
        rounds.append(
            f"""n{k} AS (
  SELECT e.dst AS id, string_agg(l.lbl, '|' ORDER BY l.lbl) AS ns
  FROM edges e JOIN l{k-1} l ON l.id = e.src
  GROUP BY e.dst
),
l{k} AS (
  SELECT p.id, md5(concat_ws('|', p.lbl, COALESCE(n.ns, ''))) AS lbl
  FROM l{k-1} p LEFT JOIN n{k} n ON n.id = p.id
)"""
        )
    chain = ",\n".join(rounds)
    return f"""WITH {edges_cte},
deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src),
l0 AS (SELECT id, md5(concat('d:', CAST(degree AS VARCHAR))) AS lbl FROM deg),
{chain}
SELECT id, lbl AS wl_label FROM l{iterations} ORDER BY id"""


def wl_graph_hash_oracle_sql(
    edges_cte: str, iterations: int = DEFAULT_WL_ITERATIONS
) -> str:
    """DuckDB twin of ``wl_graph_hash``: one row (wl_hash, n_colors)."""
    body = wl_labels_oracle_sql(edges_cte, iterations)
    prefix = body[: body.rindex("SELECT id, lbl")]
    return f"""{prefix}SELECT md5(string_agg(lbl, '|' ORDER BY lbl)) AS wl_hash,
       CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_colors
FROM l{iterations}"""
