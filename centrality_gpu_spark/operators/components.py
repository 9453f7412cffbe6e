"""Connected components: hash-min label exchange with pointer jumping.

Generalizes the reference's ``check_connect`` recursive-DFS reachability
(``graph_ear_decompos.h:16-33,141-149``) — but where the reference
*aborts* on a disconnected graph, we label every component (the north
rule requires handling disconnected transcript graphs).

Algorithm: every vertex starts labeled with its own id; each superstep
a vertex takes the min label over itself and its neighbors (hash-min),
followed by one label-compression join (label ← label[label], pointer
jumping), giving O(log diameter) supersteps instead of O(diameter).
On power-law graphs (small diameter) this converges in a handful of
shuffles; the compression join is what keeps long chains from
degrading to O(n) supersteps at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf


@with_iterative_conf
def connected_components(
    graph: Graph,
    max_iterations: int = 50,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Return (id, component) — component = min vertex id in the component."""
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = graph.edges_by_src()  # src-partitioned: only labels shuffle per iter

    name = "components"
    start_iter = 0
    labels: DataFrame
    resumed = ckpt.latest_epoch(name)
    if resumed is not None:
        start_iter, labels, _meta = resumed
        start_iter += 1
    else:
        labels = graph.vertices().select(
            F.col("id"), F.col("id").alias("component")
        )
        labels = ckpt.truncate(labels)

    for it in range(start_iter, max_iterations):
        # neighbor exchange: each dst hears the labels of its neighbors
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "component"
        )
        new_labels = (
            msgs.unionByName(labels.select("id", "component"))
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping: component <- labels[component] when smaller
        lookup = new_labels.select(
            F.col("id").alias("c_id"), F.col("component").alias("c_comp")
        )
        new_labels = (
            new_labels.join(lookup, new_labels.component == lookup.c_id, "left")
            .select(
                "id",
                F.least("component", F.coalesce("c_comp", "component")).alias(
                    "component"
                ),
            )
        )
        new_labels = ckpt.truncate(new_labels)

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") < F.col("o.component"))
            .count()
        )
        ckpt.record(op=name, iteration=it, changed=changed)
        labels = new_labels
        if ckpt.should_save(it):
            ckpt.save_epoch(labels, name, it)
        if changed == 0:
            break
    return labels


def num_components(graph: Graph) -> int:
    return connected_components(graph).select("component").distinct().count()


def component_summary(
    graph: Graph, checkpoint: CheckpointManager | None = None
) -> DataFrame:
    """(component, n_vertices, n_edges, density) — per-component
    rollup: undirected edge count and density 2E/(V(V−1)) (0.0 for
    singletons). The standard post-CC report (giant-component share,
    fragment profile).

    Plan shape: one CC run + one label join onto the canonical edges
    (both endpoints share the label by definition, so joining src alone
    suffices) + two label-keyed aggregations.
    """
    comp = connected_components(graph, checkpoint=checkpoint)
    vstats = comp.groupBy("component").agg(
        F.count("*").alias("n_vertices")
    )
    estats = (
        graph.edges.select("src", "dst")
        .where(F.col("src") < F.col("dst"))
        .join(comp.select(F.col("id").alias("src"), "component"), "src")
        .groupBy("component")
        .agg(F.count("*").alias("n_edges"))
    )
    density = F.when(
        F.col("n_vertices") >= 2,
        F.round(
            2.0 * F.coalesce("n_edges", F.lit(0))
            / (F.col("n_vertices") * (F.col("n_vertices") - 1)),
            8,
        ),
    ).otherwise(F.lit(0.0))
    return (
        vstats.join(estats, "component", "left")
        .select(
            "component",
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            density.alias("density"),
        )
    )


def component_summary_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of ``component_summary`` (recursive min-label
    closure + the same rollup)."""
    return f"""WITH RECURSIVE {edges_cte},
verts AS (SELECT DISTINCT src AS id FROM edges),
reach(id, l) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(l) AS component FROM reach GROUP BY id),
vstats AS (
  SELECT component, COUNT(*) AS n_vertices FROM comp GROUP BY component
),
estats AS (
  SELECT c.component, COUNT(*) AS n_edges
  FROM edges e JOIN comp c ON e.src = c.id
  WHERE e.src < e.dst GROUP BY c.component
)
SELECT v.component,
       CAST(v.n_vertices AS BIGINT) AS n_vertices,
       CAST(COALESCE(e.n_edges, 0) AS BIGINT) AS n_edges,
       CASE WHEN v.n_vertices >= 2
            THEN ROUND(2.0 * COALESCE(e.n_edges, 0)
                       / (v.n_vertices * (v.n_vertices - 1)), 8)
            ELSE 0.0 END AS density
FROM vstats v LEFT JOIN estats e USING (component)
ORDER BY v.component""".strip()
