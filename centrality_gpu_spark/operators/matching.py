"""Maximal matching via parallel local-min edge priorities.

The edge analog of Luby MIS (``operators/mis.py``): every round, each
still-active edge compares a deterministic priority against all edges
sharing either endpoint; an edge that is the minimum at BOTH endpoints
joins the matching (two winners can never conflict — they would have to
share a vertex, where only one can be the minimum), its endpoints
retire, and all their incident edges deactivate. This parallel rule
computes exactly the sequential greedy matching by ascending priority
(Blelloch/Fineman/Shun SPAA'12 analysis: O(log m) rounds w.h.p.), which
is what the pytest cross-checks — and, priorities being md5 strings both
engines compute bit-identically, the whole unrolled run is
driver-oracle-checkable (the MIS/coloring pattern).

Scale shape: per round, one O(E_active) union + min-agg keyed by vertex
and two anti-joins; the active edge set shrinks geometrically, all
JVM-side codegen, no Python in the loop. Matching is the standard
coarsening primitive (multilevel partitioning, graph sparsification) a
link-graph toolbox needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf

MATCHING_MAX_ROUNDS = 12


def _edge_priority(src_col, dst_col, weight_col=None):
    """Total-order edge priority: md5 of 'match:<src>:<dst>' with the
    decimal endpoints appended as tie-break (identical in DuckDB).

    With ``weight_col``, a fixed-width ``10^12 − weight`` integer is
    prepended so HEAVIER edges sort first (heavy-edge matching, the
    Karypis/Kumar HEM rule — multiplicities merged by contraction are
    exactly the edges a multilevel partitioner wants matched);
    md5+endpoints still break ties. Fractional weights are floor()ed
    on BOTH engines before formatting (a bare cast would truncate in
    Spark but round in DuckDB, silently picking different matchings);
    weights must be < 10^12."""
    s, d = src_col.cast("string"), dst_col.cast("string")
    prio = F.concat(
        F.md5(F.concat(F.lit("match:"), s, F.lit(":"), d)),
        F.lit("|"), F.lpad(s, 20, "0"), F.lit("|"), F.lpad(d, 20, "0"),
    )
    if weight_col is not None:
        prio = F.concat(
            F.lpad(
                (
                    F.lit(10**12).cast("long")
                    - F.floor(weight_col).cast("long")
                ).cast(
                    "string"
                ),
                13,
                "0",
            ),
            F.lit("|"),
            prio,
        )
    return prio


_EDGE_PRIORITY_SQL = (
    "md5('match:' || CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)) "
    "|| '|' || lpad(CAST(src AS VARCHAR), 20, '0') "
    "|| '|' || lpad(CAST(dst AS VARCHAR), 20, '0')"
)

_WEIGHTED_PRIORITY_SQL = (
    "lpad(CAST(1000000000000 - CAST(floor(weight) AS BIGINT) AS VARCHAR), "
    "13, '0') || '|' || " + _EDGE_PRIORITY_SQL
)


@with_iterative_conf
def maximal_matching(
    graph: Graph,
    max_rounds: int = MATCHING_MAX_ROUNDS,
    checkpoint: CheckpointManager | None = None,
    allow_partial: bool = False,
    by_weight: bool = False,
) -> DataFrame:
    """(src, dst, round) — the matched pairs (src < dst canonical
    orientation) with the round each pair was claimed in. Every vertex
    appears at most once across the result; no graph edge has both
    endpoints unmatched (maximality).

    Raises RuntimeError if ``max_rounds`` is hit with active edges
    remaining (never returns a non-maximal matching) — unless
    ``allow_partial=True``, which returns the (valid, possibly
    non-maximal) matching accumulated so far: the multilevel-coarsening
    caller only needs *a* matching to contract, and the first few
    rounds claim the bulk of the pairs, so a truncated run buys most of
    the V-halving at a fraction of the rounds (the standard
    time/quality knob; Karypis & Kumar run one heuristic pass).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    wcol = F.col("weight") if by_weight else None
    ea = (
        graph.edges_by_src()
        .where(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            _edge_priority(F.col("src"), F.col("dst"), wcol).alias("prio"),
        )
        .distinct()
    )
    ea = ckpt.truncate(ea)
    matched: list[DataFrame] = []
    for rnd in range(max_rounds):
        n_active = ea.count()
        ckpt.record(op="maximal_matching", iteration=rnd, changed=n_active)
        if n_active == 0:
            break
        # mutual-favorite formulation: each vertex picks its
        # min-priority incident edge (min_by over the exploded
        # endpoint view), winners are edges picked by BOTH endpoints
        # (they occur twice in the favorites) — identical output to
        # the min-join formulation (the priority is a total order:
        # ties are impossible), but per round it costs one 2E-row
        # groupBy + one V-row groupBy instead of a 2E-row groupBy
        # plus two V-sized joins back onto ea
        inc = ea.select(F.col("src").alias("v"), "src", "dst", "prio").unionByName(
            ea.select(F.col("dst").alias("v"), "src", "dst", "prio")
        )
        fav = inc.groupBy("v").agg(
            F.min_by(F.struct("src", "dst"), F.col("prio")).alias("e")
        )
        winners = (
            fav.groupBy(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
            .agg(F.count("*").alias("nends"))
            .where(F.col("nends") == 2)
            .select("src", "dst")
        )
        # lazy truncates: the next round's count() materializes the new
        # ea AND winners in ONE job instead of three (truncate
        # docstring's eager=False contract)
        winners = ckpt.truncate(winners, eager=False)
        matched.append(winners.select("src", "dst", F.lit(rnd).alias("round")))
        mv = (
            winners.select(F.col("src").alias("v"))
            .unionByName(winners.select(F.col("dst").alias("v")))
            .distinct()
        )
        # winners ≤ V/2 rows and shrinking — broadcast the anti-join side
        ea = ckpt.truncate(
            ea.join(
                F.broadcast(mv.select(F.col("v").alias("src"))),
                "src",
                "left_anti",
            )
            .join(
                F.broadcast(mv.select(F.col("v").alias("dst"))),
                "dst",
                "left_anti",
            )
            .select("src", "dst", "prio"),
            eager=False,
        )
    else:
        if not allow_partial and ea.count() > 0:
            raise RuntimeError(
                f"maximal_matching did not exhaust the edge set in "
                f"{max_rounds} rounds — raise max_rounds"
            )
    from centrality_gpu_spark.graph import union_all

    return union_all(matched)


def matching_ctes(
    edges_name: str, rounds: int = MATCHING_MAX_ROUNDS, prefix: str = "",
    by_weight: bool = False,
) -> str:
    """CTE chunk (no WITH, no final SELECT) unrolling ``rounds`` of the
    local-min matching over the CTE named ``edges_name`` (both
    directions present). All CTE names carry ``prefix`` so multiple
    matchings (one per coarsening level) can chain in one statement;
    the matched set lands in ``{prefix}m{rounds}(src, dst, round)``.
    ``by_weight`` switches to the heavy-edge priority."""
    p = prefix
    prio = _WEIGHTED_PRIORITY_SQL if by_weight else _EDGE_PRIORITY_SQL
    src_cols = "src, dst, weight" if by_weight else "src, dst"
    parts = [
        f"""{p}e0 AS MATERIALIZED (
  SELECT src, dst, {prio} AS prio
  FROM (SELECT DISTINCT {src_cols} FROM {edges_name} WHERE src < dst)
)""",
        f"{p}m0 AS (SELECT src, dst, 0 AS round FROM {p}e0 WHERE FALSE)",
    ]
    for k in range(rounds):
        parts.append(
            f"""{p}vmin{k} AS MATERIALIZED (
  SELECT v, MIN(prio) AS mprio FROM (
    SELECT src AS v, prio FROM {p}e{k}
    UNION ALL SELECT dst AS v, prio FROM {p}e{k}
  ) GROUP BY v
),
{p}w{k} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {p}e{k} e
  JOIN {p}vmin{k} a ON a.v = e.src AND a.mprio = e.prio
  JOIN {p}vmin{k} b ON b.v = e.dst AND b.mprio = e.prio
),
{p}mv{k} AS MATERIALIZED (
  SELECT src AS v FROM {p}w{k} UNION SELECT dst AS v FROM {p}w{k}
),
{p}m{k + 1} AS MATERIALIZED (
  SELECT * FROM {p}m{k}
  UNION ALL SELECT src, dst, {k} AS round FROM {p}w{k}
),
{p}e{k + 1} AS MATERIALIZED (
  SELECT e.* FROM {p}e{k} e
  WHERE e.src NOT IN (SELECT v FROM {p}mv{k})
    AND e.dst NOT IN (SELECT v FROM {p}mv{k})
)"""
        )
    return ",\n".join(parts)


def matching_oracle_sql(edges_cte: str, rounds: int = MATCHING_MAX_ROUNDS) -> str:
    """DuckDB twin of ``maximal_matching``: identical priorities and
    local-min-at-both-endpoints rule, unrolled (extra rounds past the
    fixpoint are no-ops). ``edges_cte`` must define
    ``edges(src, dst, ...)`` with both directions present. Output
    (src, dst, round) ordered.
    """
    return (
        "WITH " + edges_cte + ",\n" + matching_ctes("edges", rounds)
        + f"\nSELECT src, dst, round FROM m{rounds} ORDER BY src, dst"
    )


def contract_matching(
    graph: Graph,
    matching: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One multilevel-coarsening step: contract each matched pair to its
    smaller endpoint (the matching's reason to exist — Karypis/Kumar
    multilevel scheme, SIAM J. Sci. Comput. 1998).

    Returns ``(coarse_edges, mapping)``:

    - ``mapping`` (id, rep): every vertex to its coarse representative —
      matched pairs map to min(src, dst) = src (canonical orientation),
      unmatched vertices to themselves.
    - ``coarse_edges`` (src, dst, weight): endpoint-mapped edges with
      parallel edges merged by weight sum and self-loops (intra-pair
      edges) dropped — roughly halving V each level while preserving
      cut weights.

    Plan shape: two broadcast-size joins of the O(V) mapping against the
    bucketed edge table + one groupBy — the mapping is the only shuffled
    state, so a coarsening level costs the same as one superstep.
    """
    if matching is None:
        matching = maximal_matching(graph)
    mapping = (
        graph.vertices()
        .join(
            matching.select(
                F.col("dst").alias("id"), F.col("src").alias("rep")
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("rep", F.col("id")).alias("rep"))
    )
    e = graph.edges_by_src()
    coarse = (
        e.join(mapping.select(F.col("id").alias("src"), F.col("rep").alias("rs")), "src")
        .join(mapping.select(F.col("id").alias("dst"), F.col("rep").alias("rd")), "dst")
        .where(F.col("rs") != F.col("rd"))
        .groupBy(F.col("rs").alias("src"), F.col("rd").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )
    return coarse, mapping


def contraction_oracle_sql(edges_cte: str, rounds: int = MATCHING_MAX_ROUNDS) -> str:
    """DuckDB twin of ``contract_matching`` over the unrolled matching:
    (src, dst, weight) coarse edges, ordered. Both directions of each
    coarse edge appear (the input CTE is symmetric), weights summed."""
    return f"""WITH {edges_cte},
{matching_ctes("edges", rounds)},
mapping AS (
  SELECT v.id, COALESCE(m.src, v.id) AS rep
  FROM (SELECT DISTINCT src AS id FROM edges) v
  LEFT JOIN m{rounds} m ON m.dst = v.id
)
SELECT a.rep AS src, b.rep AS dst, SUM(e.weight) AS weight
FROM edges e
JOIN mapping a ON a.id = e.src
JOIN mapping b ON b.id = e.dst
WHERE a.rep <> b.rep
GROUP BY 1, 2
ORDER BY src, dst"""
