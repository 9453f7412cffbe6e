"""Approximate neighborhood function + effective diameter via
Flajolet-Martin bit sketches — the ANF/HADI algorithm (Palmer-Gibbons-
Faloutsos KDD'02 "ANF"; Kang et al. ICDM'08 "HADI"), the canonical way
to get distance statistics out of a 100 TB graph without APSP.

Per vertex keep ``trials`` FM bitmasks (8 B each). Hop 0: vertex v sets
bit ρ(H('anf:r:v')) in mask r, where ρ = number of trailing zeros of
the engine-standard md5→int64. Hop h: mask_r(v) ← mask_r(v) OR
bit_or over neighbors' mask_r — after h hops mask_r(v) is the FM sketch
of the FULL h-hop ball around v, because OR is idempotent/associative
(double-counting is free, the reason this beats exact BFS counting at
scale). Estimated ball size: 2^(mean_r b_r)/0.77351 with b_r = index of
the lowest zero bit of mask_r (Flajolet-Martin's estimator).

Why this is the scale path: state is ``trials``×8 B per vertex
(constant), each hop is ONE src-partitioned join + a ``bit_or``
aggregation — O(V) shuffle rows per hop against the cached edge
partitioning, all JVM whole-stage codegen — and ``max_hops`` hops cost
O(diameter) supersteps total. Exact per-vertex reach would need an
O(V²) visited structure; this needs 64 bytes/vertex.

Determinism (for the driver oracle): the md5 hash, the trailing-zero ρ,
the OR-fold, and the estimator are all computed bit-identically in
DuckDB (``anf_oracle_sql``) — including the estimate itself, which is
assembled from an exact integer shift times a per-residue literal
constant (no libm pow), so even the rounded double hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import CheckpointManager, with_iterative_conf

DEFAULT_TRIALS = 8
FM_PHI = 0.77351  # Flajolet-Martin bias correction constant

# 2^(j/8) literals shared by Spark and the DuckDB oracle: the estimate
# 2^(sum_b/8) = (1 << sum_b//8) · FRAC8[sum_b%8] is exact-integer shift
# times one literal — both engines parse the same decimal to the same
# double, so no pow()/libm call can diverge
FRAC8 = [2 ** (j / 8) for j in range(8)]


def _mask_expr(trial: int, id_col):
    """Initial FM mask for one trial: 1 << trailing_zeros(h60), computed
    shift-free as ``h & -h`` (the lowest set bit IS that power of two);
    h = 0 (probability 2^-60) maps to the top usable bit."""
    s = id_col.cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"anf:{trial}:"), s)), 1, 15), 16, 10
    ).cast("long")
    return F.when(h == 0, F.lit(1 << 62)).otherwise(h.bitwiseAND(-h))


def _sum_b(trials: int):
    """Σ_r (lowest-zero-bit index of mask r) — an exact integer."""
    total = None
    for r in range(trials):
        m = F.col(f"m{r}")
        b = F.bit_count(m.bitwiseAND(F.bitwise_not(m + F.lit(1))))
        total = b if total is None else total + b
    return total.cast("int")


def _est_expr(sum_b_col, trials: int):
    """2^(sum_b/trials)/φ via exact shift × literal (see module doc)."""
    if trials != 8:
        # general path (tests): plain pow — fine when no oracle is hashed
        return F.round(
            F.pow(F.lit(2.0), sum_b_col.cast("double") / trials) / FM_PHI, 6
        )
    q = F.least(F.floor(sum_b_col / 8).cast("int"), F.lit(62))
    # 2^q via a literal table (PySpark's shiftleft wants a Python int,
    # not a Column); doubles are exact for q ≤ 62
    pow2 = F.element_at(
        F.array(*[F.lit(float(1 << j)) for j in range(63)]), q + 1
    )
    frac = F.element_at(
        F.array(*[F.lit(c) for c in FRAC8]), F.pmod(sum_b_col, F.lit(8)) + 1
    )
    return F.round(pow2 * frac / FM_PHI, 6)


@with_iterative_conf
def neighborhood_function(
    graph: Graph,
    max_hops: int = 3,
    trials: int = DEFAULT_TRIALS,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Per-vertex h-hop ball-size estimates for h = 0..max_hops.

    Returns (id:long, hop:int, sum_b:int, est_reach:double): ``sum_b``
    is the exact integer Σ_r b_r (the raw FM statistic), ``est_reach``
    the bias-corrected ball-size estimate (≈ |{u : d(u,v) ≤ hop}|,
    including v itself).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = graph.edges_by_src()
    mcols = [f"m{r}" for r in range(trials)]
    sk = graph.vertices().select(
        "id", *[_mask_expr(r, F.col("id")).alias(f"m{r}") for r in range(trials)]
    )
    sk = ckpt.truncate(sk)
    snapshots = [sk.select("id", F.lit(0).alias("hop"), _sum_b(trials).alias("sum_b"))]
    for h in range(1, max_hops + 1):
        nbr = (
            edges.join(sk, edges.src == sk.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(*[F.bit_or(c).alias(c) for c in mcols])
        )
        sk = sk.alias("s").join(nbr.alias("n"), "id", "left").select(
            "id",
            *[
                (
                    F.col(f"s.{c}").bitwiseOR(F.coalesce(F.col(f"n.{c}"), F.lit(0)))
                ).alias(c)
                for c in mcols
            ],
        )
        sk = ckpt.truncate(sk)
        ckpt.record(op="anf", iteration=h, changed=-1)
        snapshots.append(
            sk.select("id", F.lit(h).alias("hop"), _sum_b(trials).alias("sum_b"))
        )
    from centrality_gpu_spark.graph import union_all

    out = union_all(snapshots)
    return out.select(
        "id", "hop", "sum_b", _est_expr(F.col("sum_b"), trials).alias("est_reach")
    )


def effective_diameter(
    graph: Graph,
    max_hops: int = 3,
    trials: int = DEFAULT_TRIALS,
    quantile: float = 0.9,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """One-row (eff_diameter:long, n_vertices:long).

    Per-vertex effective eccentricity = min hop with est_reach ≥
    quantile × est_reach(max_hops) (HADI's per-node effective radius);
    the graph's effective diameter is their max. Integer aggregates
    only — order-independent, so the driver hash is stable.
    """
    nf = neighborhood_function(
        graph, max_hops=max_hops, trials=trials, checkpoint=checkpoint
    )
    last = nf.where(F.col("hop") == max_hops).select(
        "id", F.col("est_reach").alias("full_reach")
    )
    ecc = (
        nf.join(last, "id")
        .where(F.col("est_reach") >= F.lit(quantile) * F.col("full_reach"))
        .groupBy("id")
        .agg(F.min("hop").alias("eff_ecc"))
    )
    return ecc.agg(
        F.max("eff_ecc").cast("long").alias("eff_diameter"),
        F.count("*").alias("n_vertices"),
    )


# ------------------------------------------------------------- oracles

_H60_SQL = "CAST(('0x' || substr(md5('anf:{r}:' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)"


def _oracle_parts(edges_cte: str, max_hops: int, trials: int) -> list[str]:
    mask0 = ",\n         ".join(
        f"(CASE WHEN h{r} = 0 THEN (CAST(1 AS BIGINT) << 62) "
        f"ELSE h{r} & -h{r} END) AS m{r}"
        for r in range(trials)
    )
    hs = ",\n         ".join(_H60_SQL.format(r=r) for r in range(trials))
    hnames = ", ".join(f"h{r}" for r in range(trials))
    parts = [
        edges_cte,
        "verts AS (SELECT DISTINCT src AS id FROM edges)",
        f"hv(id, {hnames}) AS (SELECT id,\n         {hs}\n  FROM verts)",
        f"s0 AS MATERIALIZED (SELECT id,\n         {mask0}\n  FROM hv)",
    ]
    for h in range(1, max_hops + 1):
        ors = ", ".join(f"bit_or(s.m{r}) AS m{r}" for r in range(trials))
        merged = ", ".join(
            f"(s.m{r} | COALESCE(n.m{r}, 0)) AS m{r}" for r in range(trials)
        )
        parts.append(
            f"""nb{h} AS MATERIALIZED (
  SELECT e.dst AS id, {ors}
  FROM edges e JOIN s{h - 1} s ON e.src = s.id GROUP BY e.dst
),
s{h} AS MATERIALIZED (
  SELECT s.id, {merged}
  FROM s{h - 1} s LEFT JOIN nb{h} n ON s.id = n.id
)"""
        )
    sumb = " + ".join(
        f"bit_count(m{r} & ~(m{r} + 1))" for r in range(trials)
    )
    ests = "\n  UNION ALL\n  ".join(
        f"SELECT id, {h} AS hop, CAST({sumb} AS INTEGER) AS sum_b FROM s{h}"
        for h in range(max_hops + 1)
    )
    parts.append(f"est AS (\n  {ests}\n)")
    return parts


def _est_reach_sql() -> str:
    cases = " ".join(
        f"WHEN {j} THEN {FRAC8[j]!r}" for j in range(8)
    )
    return (
        "ROUND(CAST((CAST(1 AS BIGINT) << least(sum_b // 8, 62)) AS DOUBLE)"
        f" * (CASE sum_b % 8 {cases} END) / {FM_PHI!r}, 6)"
    )


def anf_oracle_sql(
    edges_cte: str, max_hops: int = 3, trials: int = DEFAULT_TRIALS
) -> str:
    """DuckDB twin of ``neighborhood_function`` (trials must be 8 so the
    exact-literal estimator applies). Output (id, hop, sum_b, est_reach).
    """
    assert trials == 8, "oracle implements the trials=8 exact estimator"
    parts = _oracle_parts(edges_cte, max_hops, trials)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, hop, sum_b, {_est_reach_sql()} AS est_reach"
        " FROM est ORDER BY id, hop"
    )


def effective_diameter_oracle_sql(
    edges_cte: str,
    max_hops: int = 3,
    trials: int = DEFAULT_TRIALS,
    quantile: float = 0.9,
) -> str:
    """DuckDB twin of ``effective_diameter``."""
    assert trials == 8
    parts = _oracle_parts(edges_cte, max_hops, trials)
    parts.append(
        f"reach AS (SELECT id, hop, {_est_reach_sql()} AS est_reach FROM est)"
    )
    parts.append(
        f"""ecc AS (
  SELECT r.id, MIN(r.hop) AS eff_ecc
  FROM reach r
  JOIN (SELECT id, est_reach AS full_reach FROM reach WHERE hop = {max_hops}) f
    ON r.id = f.id
  WHERE r.est_reach >= {quantile!r} * f.full_reach
  GROUP BY r.id
)"""
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT CAST(MAX(eff_ecc) AS BIGINT) AS eff_diameter,"
        " COUNT(*) AS n_vertices FROM ecc"
    )
