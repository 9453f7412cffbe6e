"""Temporal earliest-arrival: time-respecting semantics vs a brute
Python fixpoint, plus the hand-built cases that separate temporal from
static reachability."""

import pytest

from centrality_gpu_spark.operators.temporal import earliest_arrival


def _brute_earliest(edges, sources, start_ts=0):
    """Label-correcting fixpoint over (src, dst, ts) triples."""
    arr = {s: start_ts for s in sources}
    changed = True
    while changed:
        changed = False
        for u, v, t in edges:
            if u in arr and t >= arr[u] and t < arr.get(v, float("inf")):
                arr[v] = t
                changed = True
    return arr


def _run(spark, edges, sources, **kw):
    e = spark.createDataFrame(edges, "src long, dst long, ts long")
    s = spark.createDataFrame([(x,) for x in sources], "id long")
    return {r.id: r.arrival for r in earliest_arrival(e, s, **kw).collect()}


def test_time_decreasing_path_not_taken(spark):
    # 0 -(t=10)-> 1 -(t=5)-> 2 : the 1->2 edge happens BEFORE arrival
    # at 1, so 2 is temporally unreachable despite static reachability.
    got = _run(spark, [(0, 1, 10), (1, 2, 5)], [0], to_fixpoint=True)
    assert got == {0: 0, 1: 10}


def test_waiting_is_allowed(spark):
    # arrival at 1 is t=10; the later 1->2 edge at t=50 is usable.
    got = _run(spark, [(0, 1, 10), (1, 2, 50)], [0], to_fixpoint=True)
    assert got == {0: 0, 1: 10, 2: 50}


def test_earliest_among_parallel_edges(spark):
    got = _run(spark, [(0, 1, 30), (0, 1, 20), (0, 1, 40)], [0], to_fixpoint=True)
    assert got[1] == 20


def test_start_ts_gates_first_hop(spark):
    got = _run(spark, [(0, 1, 10)], [0], start_ts=20, to_fixpoint=True)
    assert got == {0: 20}


@pytest.mark.parametrize("seed", [3, 7])
def test_vs_brute_fixpoint(spark, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    n, m = 30, 150
    edges = [
        (int(rng.integers(n)), int(rng.integers(n)), int(rng.integers(1, 100)))
        for _ in range(m)
    ]
    edges = [(u, v, t) for u, v, t in edges if u != v]
    sources = [0, 1, 2]
    exp = _brute_earliest(edges, sources)
    got = _run(spark, edges, sources, rounds=64, to_fixpoint=True)
    assert got == exp


def test_fixed_rounds_monotone_and_bounded(spark):
    """More rounds only add/lower arrivals; k rounds cover <=k hops."""
    chain = [(i, i + 1, 10 * (i + 1)) for i in range(8)]
    g2 = _run(spark, chain, [0], rounds=2)
    g8 = _run(spark, chain, [0], rounds=8)
    assert set(g2) == {0, 1, 2}  # two hops only
    for v, a in g2.items():
        assert g8[v] <= a
    assert len(g8) == 9


def test_fixpoint_cap_raises(spark):
    chain = [(i, i + 1, 10 * (i + 1)) for i in range(8)]
    with pytest.raises(RuntimeError, match="fixpoint"):
        _run(spark, chain, [0], rounds=3, to_fixpoint=True)


def _brute_latest(edges, targets, end_ts):
    ld = {t: end_ts for t in targets}
    changed = True
    while changed:
        changed = False
        for u, v, t in edges:
            if v in ld and t <= ld[v] and t > ld.get(u, float("-inf")):
                ld[u] = t
                changed = True
    return ld


def test_latest_departure_hand_case(spark):
    from centrality_gpu_spark.operators.temporal import latest_departure

    # 0 -(10)-> 1 -(20)-> 2 ; to reach 2 by 100, leave 0 at 10, 1 at 20
    e = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 20)], "src long, dst long, ts long"
    )
    t = spark.createDataFrame([(2,)], "id long")
    got = {r.id: r.departure for r in
           latest_departure(e, t, 100, to_fixpoint=True, rounds=8).collect()}
    assert got == {2: 100, 1: 20, 0: 10}


@pytest.mark.parametrize("seed", [4])
def test_latest_departure_vs_brute(spark, seed):
    import numpy as np

    from centrality_gpu_spark.operators.temporal import latest_departure

    rng = np.random.default_rng(seed)
    edges = [
        (int(rng.integers(25)), int(rng.integers(25)), int(rng.integers(1, 90)))
        for _ in range(120)
    ]
    edges = [(u, v, t) for u, v, t in edges if u != v]
    targets = [0, 1]
    exp = _brute_latest(edges, targets, 100)
    e = spark.createDataFrame(edges, "src long, dst long, ts long")
    t = spark.createDataFrame([(x,) for x in targets], "id long")
    got = {r.id: r.departure for r in
           latest_departure(e, t, 100, rounds=64, to_fixpoint=True).collect()}
    assert got == exp


def test_fixpoint_stats_no_overflow_at_epoch_micro_scale(spark):
    """Epoch-microsecond arrivals (~1.7e15) summed over >5,400 vertices
    overflow a bigint SUM under Spark 4.1's default ANSI mode; the
    fixpoint detector must survive it (exact decimal(38,0) sum)."""
    base = 1_700_000_000_000_000  # 2023-11 in epoch micros
    n = 6_000
    # star: source 0 reaches every vertex in one round, all arrivals
    # land at epoch-micro magnitudes
    edges = [(0, i, base + i) for i in range(1, n)]
    e = spark.createDataFrame(edges, "src long, dst long, ts long")
    s = spark.createDataFrame([(0,)], "id long")
    got = earliest_arrival(e, s, start_ts=0, to_fixpoint=True)
    assert got.count() == n
