"""Community detection: modularity scoring + distributed Louvain.

Two operators a link-graph user expects that the reference lacks (its
decompositions — BCC/ears — are exact structural cuts, not density
communities):

- ``modularity(graph, assignment)`` — Newman modularity Q of any
  vertex→community assignment. Pure two-join + one-agg DataFrame code,
  SQL-expressible, so it carries a DuckDB oracle AND serves as the
  objective check for Louvain.

- ``louvain(graph)`` — the Louvain method re-expressed for a BSP
  engine: synchronous local-move rounds (every vertex evaluates the
  standard ΔQ against its neighbor communities from the *current*
  assignment, all accepted moves apply at once) followed by graph
  contraction, repeated level by level. Determinism and convergence:

  * moves are gated by an id-hash parity that alternates per round —
    the classic fix for the two-coloring oscillation of synchronous
    label updates (same role as LPA's deterministic tie-break);
  * ties in gain break to the smallest community id;
  * final labels are canonicalized to the minimum ORIGINAL vertex id
    in each community, so output is stable across schedules that reach
    the same partition.

  Scale shape per round: one edges⋈assignment join (shuffle on dst),
  one (vertex, community) aggregation, one broadcast-size community
  stats table (|C| ≤ |V|, shrinks fast). Contraction is a groupBy on
  (comm_src, comm_dst) — the same shape as the transcript builder's
  projection. No driver-side per-vertex loop anywhere; levels are few
  (the vertex count drops geometrically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager


def modularity(
    graph: Graph,
    assignment: DataFrame,
    weighted: bool = False,
    resolution: float = 1.0,
) -> DataFrame:
    """Single row (modularity:double) of the partition given by
    ``assignment`` (id, community) over the graph.

    Q = Σ_c [ in_c/(2m) − γ·(tot_c/(2m))² ] with in_c the DIRECTED
    (both-direction) intra-community edge weight, tot_c the summed
    degree, 2m the total directed weight — ``nx.community.modularity``
    semantics for a graph without self-loops.
    """
    w = F.col("weight") if weighted else F.lit(1.0)
    e = graph.edges.select("src", "dst", w.alias("w"))
    a_src = assignment.select(F.col("id").alias("src"), F.col("community").alias("c_src"))
    a_dst = assignment.select(F.col("id").alias("dst"), F.col("community").alias("c_dst"))
    labeled = e.join(a_src, "src").join(a_dst, "dst")
    per_c = labeled.groupBy("c_src").agg(
        F.sum("w").alias("tot"),
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), F.col("w")).otherwise(0.0)).alias("intra"),
    )
    m2 = per_c.agg(F.sum("tot").alias("m2"))
    return (
        per_c.crossJoin(F.broadcast(m2))
        .agg(
            F.round(
                F.sum(
                    F.col("intra") / F.col("m2")
                    - F.lit(resolution) * (F.col("tot") / F.col("m2")) ** 2
                ),
                8,
            ).alias("modularity")
        )
    )


def modularity_sql(edges_cte: str, communities_cte: str,
                   weighted: bool = False, resolution: float = 1.0) -> str:
    """DuckDB twin of ``modularity``: ``edges_cte`` defines
    edges(src, dst, weight) both directions; ``communities_cte`` defines
    communities(id, community)."""
    w = "e.weight" if weighted else "1.0"
    return f"""WITH {edges_cte},
{communities_cte},
labeled AS (
  SELECT a.community AS c_src, b.community AS c_dst, {w} AS w
  FROM edges e
  JOIN communities a ON e.src = a.id
  JOIN communities b ON e.dst = b.id
),
per_c AS (
  SELECT c_src, SUM(w) AS tot,
         SUM(CASE WHEN c_src = c_dst THEN w ELSE 0.0 END) AS intra
  FROM labeled GROUP BY c_src
)
SELECT ROUND(SUM(intra / m2 - {resolution} * (tot / m2) * (tot / m2)), 8)
       AS modularity
FROM per_c, (SELECT SUM(tot) AS m2 FROM per_c)"""


def louvain(
    graph: Graph,
    weighted: bool = False,
    max_levels: int = 10,
    max_local_rounds: int = 40,
    min_gain: float = 1e-9,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Louvain communities: returns (id:long, community:long) where the
    community label is the minimum original vertex id in the community.

    See module docstring for the synchronous-BSP re-expression. Each
    level runs parity-alternating local-move rounds to a fixpoint, then
    contracts communities to supervertices (aggregating parallel edge
    weights and keeping intra-community weight as vertex self-weight)
    and recurses until modularity stops improving by ``min_gain``.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    w = F.col("weight") if weighted else F.lit(1.0)
    # level-local state: edge list with weights, vertex self-weight
    edges = ckpt.truncate(graph.edges.select("src", "dst", w.alias("w")))
    selfw = None  # (id, sw) — contracted intra weight, level >= 2 only
    # orig→current-supervertex map (level 1: identity)
    mapping = ckpt.truncate(
        graph.vertices().select(F.col("id").alias("orig"), F.col("id").alias("node"))
    )
    prev_q = None
    for _level in range(max_levels):
        assign, q = _local_move_level(
            edges, selfw, max_local_rounds, ckpt
        )
        if prev_q is not None and q - prev_q < min_gain:
            break
        prev_q = q
        mapping = ckpt.truncate(
            mapping.join(
                assign.select(F.col("id").alias("node"), "community"), "node"
            ).select("orig", F.col("community").alias("node"))
        )
        # ---- contract: communities become the next level's vertices
        a_src = assign.select(F.col("id").alias("src"), F.col("community").alias("cs"))
        a_dst = assign.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
        labeled = edges.join(a_src, "src").join(a_dst, "dst")
        new_edges = ckpt.truncate(
            labeled.where(F.col("cs") != F.col("cd"))
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        intra = labeled.where(F.col("cs") == F.col("cd")).groupBy(
            F.col("cs").alias("id")
        ).agg(F.sum("w").alias("iw"))
        old_selfw = (
            selfw.join(assign, "id")
            .groupBy(F.col("community").alias("id"))
            .agg(F.sum("sw").alias("osw"))
            if selfw is not None
            else None
        )
        comm_verts = assign.select(F.col("community").alias("id")).distinct()
        sw_df = comm_verts.join(intra, "id", "left")
        # self-weight: UNDIRECTED intra weight (= directed/2), so the
        # supervertex degree k = out-edges + 2·sw conserves Σk (and m2)
        if old_selfw is not None:
            sw_df = sw_df.join(old_selfw, "id", "left")
            sw_expr = F.coalesce("iw", F.lit(0.0)) / 2.0 + F.coalesce("osw", F.lit(0.0))
        else:
            sw_expr = F.coalesce("iw", F.lit(0.0)) / 2.0
        selfw = ckpt.truncate(sw_df.select("id", sw_expr.alias("sw")))
        n_before = assign.count()
        n_after = comm_verts.count()
        edges = new_edges
        if n_after == n_before:
            break  # no merges happened — converged
    # canonical labels: min original id per community
    canon = mapping.groupBy(F.col("node")).agg(F.min("orig").alias("community"))
    return mapping.join(canon, "node").select(
        F.col("orig").alias("id"), "community"
    )


def _local_move_level(
    edges: DataFrame,
    selfw: DataFrame | None,
    max_rounds: int,
    ckpt: CheckpointManager,
):
    """One Louvain level: synchronous parity-gated local moves to a
    fixpoint. Returns (assignment (id, community), modularity_q)."""
    spark = edges.sparkSession
    verts = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    if selfw is not None:
        verts = verts.unionAll(selfw.select("id")).distinct()
    # degree k_i: incident edge weight; self-weight counts fully into
    # both k_i and 2m (it is intra by construction and never moves the
    # ΔQ comparison because it stays with the vertex)
    kdeg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    if selfw is not None:
        kdeg = (
            verts.join(kdeg, "id", "left")
            .join(selfw, "id", "left")
            .select(
                "id",
                (F.coalesce("k", F.lit(0.0)) + 2.0 * F.coalesce("sw", F.lit(0.0))).alias("k"),
            )
        )
    else:
        kdeg = verts.join(kdeg, "id", "left").select(
            "id", F.coalesce("k", F.lit(0.0)).alias("k")
        )
    kdeg = ckpt.truncate(kdeg)
    m2 = kdeg.agg(F.sum("k")).collect()[0][0]
    if not m2:
        a = verts.select("id", F.col("id").alias("community"))
        return ckpt.truncate(a), 0.0
    assign = ckpt.truncate(verts.select("id", F.col("id").alias("community")))
    for rnd in range(max_rounds):
        # community totals Σ_tot(c) = Σ k_i over members
        ctot = assign.join(kdeg, "id").groupBy("community").agg(
            F.sum("k").alias("tot")
        )
        # per (vertex, neighbor community) incident weight k_{i,c}
        nbr = (
            edges.join(
                assign.select(F.col("id").alias("dst"), F.col("community").alias("c")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("w").alias("kic"))
        )
        cur = assign.select("id", F.col("community").alias("cur"))
        # the CURRENT community is always a candidate (kic = 0 when the
        # vertex has no neighbor inside it) — the move test is
        # gain(best) > gain(stay), standard Louvain
        all_cand = nbr.unionByName(
            cur.select("id", F.col("cur").alias("c"), F.lit(0.0).alias("kic"))
        ).groupBy("id", "c").agg(F.max("kic").alias("kic"))
        cand = (
            all_cand.join(cur, "id")
            .join(ctot.select(F.col("community").alias("c"), "tot"), "c")
            .join(kdeg, "id")
        )
        # gain of placing i (removed from cur) into c: tot excludes i
        # itself when c == cur
        tot_wo_i = F.col("tot") - F.when(F.col("c") == F.col("cur"), F.col("k")).otherwise(0.0)
        gain = F.col("kic") - F.col("k") * tot_wo_i / F.lit(float(m2))
        scored = cand.select(
            "id", "c", "cur", gain.alias("gain"),
            F.when(F.col("c") == F.col("cur"), F.lit(1)).otherwise(0).alias("is_cur"),
        )
        # best candidate: max gain, tie → current community, then min id
        best = scored.groupBy("id").agg(
            F.max_by(
                F.struct("c", "gain"),
                F.struct(F.col("gain"), F.col("is_cur"), (-F.col("c")).alias("nc")),
            ).alias("b"),
            F.max(F.when(F.col("is_cur") == 1, F.col("gain"))).alias("gcur"),
            F.first("cur").alias("cur"),
        ).select(
            "id", F.col("b.c").alias("target"), F.col("b.gain").alias("gain"),
            "gcur", "cur",
        )
        movable = (F.col("target") != F.col("cur")) & (
            F.col("gain") > F.col("gcur") + 1e-12
        )
        # direction gate: label-DECREASING moves on even rounds,
        # label-increasing on odd. A simultaneous swap (u: a→b while
        # v: b→a) needs one move down and one up, so it can never land
        # in the same round — this kills the two-coloring oscillation
        # of synchronous local moves deterministically (an id-hash
        # parity gate does not: a star center and a leaf that hash to
        # the same parity swap forever). Any wanted move waits at most
        # one round.
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
        if not counts["all_movable"]:
            best.unpersist()
            break  # fixpoint: clean in BOTH directions
        if counts["this_dir"]:
            moves = best.where(movable & dir_ok).select(
                "id", F.col("target").alias("nc")
            )
            assign = ckpt.truncate(
                assign.join(moves, "id", "left")
                .select("id", F.coalesce("nc", "community").alias("community"))
            )
        best.unpersist()
    # level modularity (for the outer convergence test): over current
    # edges + selfw, directed weights
    a_src = assign.select(F.col("id").alias("src"), F.col("community").alias("cs"))
    a_dst = assign.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
    labeled = edges.join(a_src, "src").join(a_dst, "dst")
    intra = labeled.where(F.col("cs") == F.col("cd")).agg(F.sum("w")).collect()[0][0] or 0.0
    if selfw is not None:
        sw_total = selfw.agg(F.sum("sw")).collect()[0][0] or 0.0
        intra += 2.0 * sw_total
    ctot = assign.join(kdeg, "id").groupBy("community").agg(F.sum("k").alias("tot"))
    sq = ctot.agg(F.sum(F.col("tot") * F.col("tot"))).collect()[0][0] or 0.0
    q = intra / m2 - sq / (m2 * m2)
    return assign, q
