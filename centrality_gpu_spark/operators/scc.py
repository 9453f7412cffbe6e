"""Strongly connected components of a DIRECTED edge table.

The undirected engine covers the reference's graphs (it symmetrizes
everything, ``graph.cpp:50-59``); transcripts are naturally directed
(conv→tool invocation arrows, reply chains), so SCC is the missing
directed decomposition — it is what collapses a conversation graph into
its condensation DAG before any topological processing.

Algorithm: trim + forward-coloring (Orzan's coloring algorithm; the
FW-BW-Trim family of Slota-Rajamanickam-Madduri is the standard
distributed-memory approach). Per phase:

1. **Trim to fixpoint**: a vertex with no in-edge or no out-edge in the
   remaining graph is a singleton SCC — peel these until none remain.
   This deletes entire DAG-like regions and is the workhorse on mostly
   acyclic graphs (conversation graphs are mostly acyclic).
2. **Forward min-label coloring to fixpoint**: c(v) ← min(c(v),
   min_{(u,v)∈E} c(u)) starting from c(v)=v. Color regions are closed
   under forward reachability from their root (the vertex whose id is
   its own color).
3. **Backward containment**: SCC(root) = vertices of color ``root``
   that reach ``root`` — grown as a fixpoint from the root along
   reversed edges, restricted to the color class. All roots are
   processed in the SAME joins (no per-root work), so one phase peels
   one SCC per color region.

Every step is min/anti-join-based — fully deterministic, so the driver
can hash the labeling against a DuckDB mutual-reachability oracle
(``scc_oracle_sql``: recursive reach CTE, scc(v) = min{u : v⇄u}).

Scale shape: each fixpoint round is one src-partitioned edge join plus
a min-aggregate or anti-join — O(V) shuffle rows per round; rounds are
bounded by graph diameter (coloring), peel depth (trim), and SCC
diameter (containment). All JVM codegen, no Python in the loop. The
round/phase budgets RAISE rather than returning a partial labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def _restrict(edges: DataFrame, verts: DataFrame) -> DataFrame:
    """Edges with BOTH endpoints in ``verts`` — name-keyed semi-joins so
    the twice-used verts DF never creates ambiguous attribute refs."""
    vs = verts.select(F.col("id").alias("src"))
    vd = verts.select(F.col("id").alias("dst"))
    return edges.join(vs, "src", "left_semi").join(vd, "dst", "left_semi")


def strongly_connected_components(
    dedges: DataFrame,
    max_phases: int = 64,
    max_rounds: int = 512,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """SCC labels for a directed edge DataFrame (src:long, dst:long).

    Returns (id:long, scc:long) where ``scc`` is the smallest vertex id
    in the component (the canonical label). Self-loops are irrelevant
    (a vertex is always in its own SCC) and parallel edges are deduped.
    """
    import contextlib

    from centrality_gpu_spark.plans.checkpoint import (
        ITERATIVE_CONF_MIN_EDGES,
        iterative_conf,
    )

    spark = dedges.sparkSession
    # with_iterative_conf wants a Graph first arg; this operator takes a
    # raw directed edge DF, so gate the conf scope manually
    cm = (
        iterative_conf(spark)
        if dedges.count() >= 2 * ITERATIVE_CONF_MIN_EDGES
        else contextlib.nullcontext()
    )
    with cm:
        return _scc_loop(dedges, max_phases, max_rounds, checkpoint)


def _scc_loop(
    dedges: DataFrame,
    max_phases: int,
    max_rounds: int,
    checkpoint: CheckpointManager | None,
) -> DataFrame:
    spark = dedges.sparkSession
    ckpt = checkpoint or CheckpointManager(spark)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cur = (
        dedges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nparts, "src")
    )
    cur = ckpt.truncate(cur)
    verts = ckpt.truncate(
        cur.select(F.col("src").alias("id"))
        .unionByName(cur.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels: list[DataFrame] = []
    rounds = 0

    def tick(op: str) -> None:
        nonlocal rounds
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"strongly_connected_components exceeded {max_rounds} "
                f"rounds (in {op}) — raise max_rounds"
            )

    for phase in range(max_phases):
        # ---- 1. trim singleton SCCs (no in- or no out-edge) to fixpoint
        while True:
            tick("trim")
            core = (
                cur.select(F.col("src").alias("id"))
                .distinct()
                .join(cur.select(F.col("dst").alias("id")).distinct(), "id")
            )
            core = ckpt.truncate(core)
            trivial = verts.join(core, "id", "left_anti")
            n_triv = trivial.count()
            ckpt.record(op="scc_trim", iteration=rounds, changed=n_triv)
            if n_triv == 0:
                break
            labels.append(trivial.select("id", F.col("id").alias("scc")))
            verts = core
            cur = ckpt.truncate(_restrict(cur, verts))
        if verts.isEmpty():
            break

        # ---- 2. forward min-label coloring to fixpoint
        colors = ckpt.truncate(verts.select("id", F.col("id").alias("color")))
        while True:
            tick("color")
            msg = cur.join(colors, cur.src == colors.id).select(
                F.col("dst").alias("id"), "color"
            )
            new = (
                colors.unionByName(msg)
                .groupBy("id")
                .agg(F.min("color").alias("color"))
            )
            new = ckpt.truncate(new)
            changed = (
                new.alias("n")
                .join(colors.alias("o"), "id")
                .where(F.col("n.color") != F.col("o.color"))
                .count()
            )
            ckpt.record(op="scc_color", iteration=rounds, changed=changed)
            colors = new
            if changed == 0:
                break

        # ---- 3. backward containment from every root at once
        members = ckpt.truncate(
            colors.where(F.col("color") == F.col("id")).select(
                "id", F.col("id").alias("root")
            )
        )
        while True:
            tick("contain")
            cand = (
                cur.join(members, cur.dst == members.id)
                .select(F.col("src").alias("id"), "root")
                .join(colors, "id")
                .where(F.col("color") == F.col("root"))
                .select("id", "root")
                .distinct()
            )
            new_members = cand.join(members, "id", "left_anti")
            n_new = new_members.count()
            ckpt.record(op="scc_contain", iteration=rounds, changed=n_new)
            if n_new == 0:
                break
            members = ckpt.truncate(members.unionByName(new_members))
        labels.append(members.select("id", F.col("root").alias("scc")))
        verts = ckpt.truncate(verts.join(members, "id", "left_anti"))
        if verts.isEmpty():
            break
        cur = ckpt.truncate(_restrict(cur, verts))
    else:
        raise RuntimeError(
            f"strongly_connected_components did not converge in "
            f"{max_phases} phases — raise max_phases"
        )

    from centrality_gpu_spark.graph import union_all

    return union_all(labels)


def condensation_summary(dedges: DataFrame, scc: DataFrame) -> DataFrame:
    """One-row condensation stats: (n_sccs, n_trivial, largest_scc,
    n_cond_edges) — the DAG the SCCs collapse to. ``scc`` is the output
    of ``strongly_connected_components``."""
    sizes = scc.groupBy("scc").agg(F.count("*").alias("sz"))
    e = (
        dedges.join(scc.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("scc", "s_scc")
        .join(
            scc.select(F.col("id").alias("dst"), F.col("scc").alias("d_scc")),
            "dst",
        )
        .where(F.col("s_scc") != F.col("d_scc"))
        .select("s_scc", "d_scc")
        .distinct()
    )
    return sizes.agg(
        F.count("*").alias("n_sccs"),
        F.sum((F.col("sz") == 1).cast("long")).alias("n_trivial"),
        F.max("sz").alias("largest_scc"),
    ).crossJoin(e.agg(F.count("*").alias("n_cond_edges")))


def scc_oracle_sql(dedges_cte: str) -> str:
    """DuckDB mutual-reachability oracle: scc(v) = MIN(u) over u with
    v→u AND u→v (self included via the recursion base). ``dedges_cte``
    must define ``dedges(src, dst)``. Output (id, scc) — the identical
    canonical labeling ``strongly_connected_components`` produces."""
    return f"""
WITH RECURSIVE {dedges_cte},
verts AS (SELECT DISTINCT src AS id FROM dedges
          UNION SELECT DISTINCT dst FROM dedges),
reach(a, b) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.a, e.dst FROM reach r JOIN dedges e ON e.src = r.b
)
SELECT f.a AS id, MIN(f.b) AS scc
FROM reach f JOIN reach g ON f.a = g.b AND f.b = g.a
GROUP BY f.a ORDER BY id
""".strip()


def condensation_oracle_sql(dedges_cte: str) -> str:
    """DuckDB twin of ``condensation_summary`` over the same SCC oracle."""
    return f"""
WITH RECURSIVE {dedges_cte},
verts AS (SELECT DISTINCT src AS id FROM dedges
          UNION SELECT DISTINCT dst FROM dedges),
reach(a, b) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.a, e.dst FROM reach r JOIN dedges e ON e.src = r.b
),
scc AS (
  SELECT f.a AS id, MIN(f.b) AS scc
  FROM reach f JOIN reach g ON f.a = g.b AND f.b = g.a
  GROUP BY f.a
),
sizes AS (SELECT scc, COUNT(*) AS sz FROM scc GROUP BY scc),
ce AS (
  SELECT DISTINCT s.scc AS a, d.scc AS b
  FROM dedges e JOIN scc s ON e.src = s.id JOIN scc d ON e.dst = d.id
  WHERE s.scc <> d.scc
)
SELECT (SELECT COUNT(*) FROM sizes) AS n_sccs,
       (SELECT COUNT(*) FROM sizes WHERE sz = 1) AS n_trivial,
       (SELECT MAX(sz) FROM sizes) AS largest_scc,
       (SELECT COUNT(*) FROM ce) AS n_cond_edges
""".strip()
