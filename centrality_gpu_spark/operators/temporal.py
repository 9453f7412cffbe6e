"""Time-respecting (temporal) reachability over a timestamped edge
table (src, dst, ts).

A temporal path must traverse edges in non-decreasing time: a hop over
edge (u, v, t) is usable only when t >= the arrival time at u (Wu et
al., "Path Problems in Temporal Graphs", VLDB 2014 — the
earliest-arrival formulation). Static reachability over-approximates
badly on event streams; this is the honest reachability notion for the
transcript/event data model, and the only operator family that uses the
``ts`` column the tables carry.

Engine shape: one edge×arrival join + a ``groupBy(dst).min(ts)`` per
synchronous round — the identical shuffle profile to the hash-min
connected-components superstep, with the time predicate riding the join
(JVM-side, codegen). Fixed synchronous rounds (the repo's
fixed-iteration idiom: round k covers every temporal path of <= k
hops), so the DuckDB twin is the same relaxation unrolled — and a
fixpoint variant for tests. State per round is one (id, arrival) row
per reached vertex — O(V) shuffle traffic, edges never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.plans.checkpoint import CheckpointManager

DEFAULT_TEMPORAL_ROUNDS = 6


def earliest_arrival(
    edges: DataFrame,
    sources: DataFrame,
    start_ts: int = 0,
    rounds: int = DEFAULT_TEMPORAL_ROUNDS,
    to_fixpoint: bool = False,
    checkpoint: CheckpointManager | None = None,
    initial: DataFrame | None = None,
) -> DataFrame:
    """(id, arrival) — earliest time each vertex is reachable from the
    source set by a time-respecting path over ``edges(src, dst, ts)``.

    ``sources`` is a DataFrame with column ``id``; every source starts
    with arrival ``start_ts`` (a hop over (u, v, t) then requires
    t >= start_ts). Unreached vertices are absent from the result.

    ``initial`` (id, arrival), if given, warm-starts the relaxation —
    the streaming accumulator's hook: arrivals already proven by earlier
    batches seed the state, merged min-wise with the sources.

    With ``to_fixpoint=True`` the loop instead runs until a round
    improves nothing (``rounds`` becomes a safety valve: exceeding it
    raises rather than returning a non-fixpoint — the k_core
    convention).
    """
    ckpt = checkpoint or CheckpointManager(edges.sparkSession)
    # bucket edges by src ONCE: the cached partitioning satisfies every
    # round's join requirement, so per round only the O(V) arrival side
    # shuffles (edges never move — the superstep invariant)
    e = (
        edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("ts").cast("long"),
        )
        .repartition("src")
        .persist()
    )
    arr = sources.select(
        F.col("id").cast("long"), F.lit(int(start_ts)).cast("long").alias("arrival")
    ).distinct()
    if initial is not None:
        arr = (
            arr.unionByName(
                initial.select(
                    F.col("id").cast("long"), F.col("arrival").cast("long")
                )
            )
            .groupBy("id")
            .agg(F.min("arrival").alias("arrival"))
        )
    arr = ckpt.truncate(arr)
    it = 0
    try:
        arr = _arrival_loop(e, arr, ckpt, rounds, to_fixpoint)
    finally:
        e.unpersist()
    return arr


def _arrival_stats(arr):
    # Exact decimal(38,0) sum: arrivals are epoch-microsecond longs
    # (~1.7e15), so a plain bigint SUM overflows under ANSI mode once the
    # reached set passes ~5,400 vertices. decimal keeps the sum exact, so
    # the monotone changed-iff-(count,sum)-changed fixpoint argument is
    # untouched.
    row = arr.agg(
        F.count("*").alias("c"),
        F.sum(F.col("arrival").cast("decimal(38,0)")).alias("s"),
    ).first()
    return (row.c, None if row.s is None else int(row.s))


def _arrival_loop(e, arr, ckpt, rounds: int, to_fixpoint: bool):
    it = 0
    # Fixpoint detection without a per-round join: the min-merge makes
    # the arrival vector MONOTONE (per-id arrivals never increase, the
    # id set never shrinks), so the vector changed iff its (count,
    # sum) changed — one tiny agg on the new vector, folded into the
    # same job that materializes the lazy truncate. The old shape ran a
    # second full join+count action every round; on a
    # hundreds-of-tiny-rounds fixpoint run the per-round action count
    # is the whole cost.
    prev = _arrival_stats(arr) if to_fixpoint else None
    while True:
        msgs = (
            e.join(arr, e.src == arr.id)
            .where(F.col("ts") >= F.col("arrival"))
            .select(F.col("dst").alias("id"), F.col("ts").alias("arrival"))
        )
        # single min-agg merges old arrivals and new messages; Spark's
        # map-side partial agg does the per-partition combine a separate
        # pre-aggregation would duplicate
        new_arr = (
            arr.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("arrival").alias("arrival"))
        )
        if to_fixpoint:
            new_arr = ckpt.truncate(new_arr, eager=False)
            stats = _arrival_stats(new_arr)  # materializes the truncate
            changed = stats != prev
            ckpt.record(
                op="earliest_arrival", iteration=it,
                n_reached=stats[0], arrival_sum=stats[1],
            )
            arr, prev = new_arr, stats
            if not changed:
                break
            it += 1
            if it >= rounds:
                raise RuntimeError(
                    f"earliest_arrival did not reach a fixpoint within "
                    f"rounds={rounds}; raise the cap"
                )
        else:
            new_arr = ckpt.truncate(new_arr)
            ckpt.record(op="earliest_arrival", iteration=it)
            arr = new_arr
            it += 1
            if it >= rounds:
                break
    return arr


def latest_departure(
    edges: DataFrame,
    targets: DataFrame,
    end_ts: int,
    rounds: int = DEFAULT_TEMPORAL_ROUNDS,
    to_fixpoint: bool = False,
) -> DataFrame:
    """(id, departure) — the latest time one can leave each vertex and
    still reach the target set by a time-respecting path whose final
    hop happens no later than ``end_ts``.

    Exactly the reverse-time dual of ``earliest_arrival``: reverse every
    edge and negate its timestamp, and the latest-departure recursion
    ld[v] = max{ t : (v, w, t), t <= ld[w] } becomes the
    earliest-arrival recursion on the transformed table — so this is a
    thin wrapper (one extra projection, same per-round plan), and the
    two operators stay consistent by construction. Targets themselves
    report ``end_ts``.
    """
    rev = edges.select(
        F.col("dst").cast("long").alias("src"),
        F.col("src").cast("long").alias("dst"),
        (-F.col("ts").cast("long")).alias("ts"),
    )
    arr = earliest_arrival(
        rev, targets, start_ts=-int(end_ts), rounds=rounds, to_fixpoint=to_fixpoint
    )
    return arr.select("id", (-F.col("arrival")).alias("departure"))


def temporal_reach_summary(
    edges: DataFrame,
    sources: DataFrame,
    start_ts: int = 0,
    rounds: int = DEFAULT_TEMPORAL_ROUNDS,
) -> DataFrame:
    """One row (n_reached, min_arrival, max_arrival) over the
    ``earliest_arrival`` table — the influence-set size of the source
    set plus its time extent."""
    arr = earliest_arrival(edges, sources, start_ts=start_ts, rounds=rounds)
    return arr.agg(
        F.count("*").cast("long").alias("n_reached"),
        F.min("arrival").alias("min_arrival"),
        F.max("arrival").alias("max_arrival"),
    )


def _unrolled_arrival_ctes(
    sources_sql: str, start_ts: int, rounds: int, edge_table: str = "tedges"
) -> str:
    """CTE chain a0..a{rounds} implementing the identical relaxation.
    ``sources_sql`` must select a single BIGINT column ``id``.
    MATERIALIZED keeps DuckDB from re-inlining the chain exponentially
    (the unrolled-PageRank-oracle trick)."""
    parts = [
        f"""a0 AS MATERIALIZED (
  SELECT DISTINCT CAST(id AS BIGINT) AS id,
         CAST({start_ts} AS BIGINT) AS arrival
  FROM ({sources_sql})
)"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""c{k} AS MATERIALIZED (
  SELECT e.dst AS id, MIN(e.ts) AS arrival
  FROM {edge_table} e JOIN a{k-1} a ON a.id = e.src AND e.ts >= a.arrival
  GROUP BY e.dst
),
a{k} AS MATERIALIZED (
  SELECT id, MIN(arrival) AS arrival
  FROM (SELECT * FROM a{k-1} UNION ALL SELECT * FROM c{k})
  GROUP BY id
)"""
        )
    return ",\n".join(parts)


def earliest_arrival_oracle_sql(
    temporal_edges_cte: str,
    sources_sql: str,
    start_ts: int = 0,
    rounds: int = DEFAULT_TEMPORAL_ROUNDS,
) -> str:
    """DuckDB twin of ``earliest_arrival`` over a CTE exposing
    ``tedges(src, dst, ts)``. Output (id, arrival) ordered by id."""
    chain = _unrolled_arrival_ctes(sources_sql, start_ts, rounds)
    return f"""WITH {temporal_edges_cte},
{chain}
SELECT id, arrival FROM a{rounds} ORDER BY id"""


def latest_departure_oracle_sql(
    temporal_edges_cte: str,
    targets_sql: str,
    end_ts: int,
    rounds: int = DEFAULT_TEMPORAL_ROUNDS,
) -> str:
    """DuckDB twin of ``latest_departure``: the identical reverse-time
    transform feeding the unrolled arrival chain. Output
    (id, departure) ordered by id."""
    chain = _unrolled_arrival_ctes(
        targets_sql, -int(end_ts), rounds, edge_table="tedges_rev"
    )
    return f"""WITH {temporal_edges_cte},
tedges_rev AS (SELECT dst AS src, src AS dst, -ts AS ts FROM tedges),
{chain}
SELECT id, -arrival AS departure FROM a{rounds} ORDER BY id"""


def temporal_reach_summary_oracle_sql(
    temporal_edges_cte: str,
    sources_sql: str,
    start_ts: int = 0,
    rounds: int = DEFAULT_TEMPORAL_ROUNDS,
) -> str:
    """DuckDB twin of ``temporal_reach_summary``: one row."""
    chain = _unrolled_arrival_ctes(sources_sql, start_ts, rounds)
    return f"""WITH {temporal_edges_cte},
{chain}
SELECT CAST(COUNT(*) AS BIGINT) AS n_reached,
       MIN(arrival) AS min_arrival,
       MAX(arrival) AS max_arrival
FROM a{rounds}"""
