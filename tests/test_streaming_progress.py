"""applyInPandasWithState conversation progress: the state-store
stateful operator must converge, under ANY delivery order and with
replayed rows, to exactly the batch ``conversation_progress`` profile;
the timeout branch emits a terminal row and drops state."""

import shutil

import numpy as np
import pandas as pd
import pytest

from centrality_gpu_spark.datagen import generate_transcripts
from centrality_gpu_spark.streaming.progress import (
    _EMPTY_STATE,
    _advance_frontier,
    _fold_batch,
    _progress_fn,
    conversation_progress,
    conversation_progress_oracle_sql,
    streaming_conversation_progress,
)


# ---------------------------------------------------------------- unit


def test_frontier_in_order():
    upto, pending = -1, np.array([], dtype=np.int64)
    for i in range(5):
        upto, pending, fresh = _advance_frontier(
            upto, pending, np.array([i])
        )
        assert (upto, list(pending), list(fresh)) == (i, [], [i])


def test_frontier_out_of_order_and_replay():
    upto, pending, fresh = _advance_frontier(
        -1, np.array([], dtype=np.int64), np.array([3, 1, 4])
    )
    assert upto == -1 and list(pending) == [1, 3, 4]
    # turn 0 arrives -> frontier jumps through the pending run 0,1
    upto, pending, fresh = _advance_frontier(upto, pending, np.array([0]))
    assert upto == 1 and list(pending) == [3, 4]
    # replays (0, 3) are not fresh; 2 closes the gap entirely
    upto, pending, fresh = _advance_frontier(
        upto, pending, np.array([0, 3, 2])
    )
    assert upto == 4 and list(pending) == [] and list(fresh) == [2]


def _pdf(rows):
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "tool", "ts"]
    ).astype({"ts": "datetime64[us]"})


def test_fold_batch_counts_and_extent():
    pdf = _pdf(
        [
            ("c", 0, None, "2026-01-01 00:00:00"),
            ("c", 1, "grep", "2026-01-01 00:00:02"),
            ("c", 1, "grep", "2026-01-01 00:00:02"),  # in-batch dup
        ]
    )
    st, n_new, n_tools = _fold_batch(_EMPTY_STATE, pdf)
    # state: (upto, pending, pending_tool, n_turns, n_tools, first_us,
    # last_us, seq, n_conflicts)
    assert (st[0], st[1], st[2], st[3], st[4]) == (1, [], [], 2, 1)
    assert st[6] - st[5] == 2_000_000  # 2 s in micros
    assert (n_new, n_tools) == (2, 1)
    # replaying the same batch is a no-op apart from update_seq
    st2, n_new2, _ = _fold_batch(st, pdf)
    assert st2[:7] == st[:7] and n_new2 == 0 and st2[7] == st[7] + 1
    assert st2[8] == 0  # byte-identical replay: no conflicts


def test_fold_batch_counts_pending_tool_conflicts():
    # turn 2 arrives out of order carrying a tool; turn 0 missing
    st, _, _ = _fold_batch(
        _EMPTY_STATE, _pdf([("c", 2, "grep", "2026-01-01 00:00:00")])
    )
    assert st[1] == [2] and st[2] == [1] and st[8] == 0
    # conflicting replay of the still-pending turn (tool now NULL)
    st2, n_new, _ = _fold_batch(
        st, _pdf([("c", 2, None, "2026-01-01 00:00:00")])
    )
    assert n_new == 0 and st2[8] == 1
    # first-accepted wins: the stored bit is unchanged
    assert st2[1] == [2] and st2[2] == [1]
    # benign replay (same nullity) does not count
    st3, _, _ = _fold_batch(
        st2, _pdf([("c", 2, "grep", "2026-01-01 00:00:00")])
    )
    assert st3[8] == 1


def test_progress_fn_max_pending_finalizes():
    class _St:
        hasTimedOut = False
        exists = False
        removed = False

        def update(self, v):
            self._v = v

        def remove(self):
            self.removed = True

        def setTimeoutDuration(self, ms):
            pass

    st = _St()
    # turn 0 lost: 4 out-of-order turns exceed max_pending=3
    pdf = _pdf(
        [("c", i, None, "2026-01-01 00:00:00") for i in (5, 6, 7, 8)]
    )
    [out] = list(_progress_fn(("c",), iter([pdf]), st, max_pending=3))
    row = out.iloc[0]
    assert st.removed and bool(row["final"]) and row["n_pending"] == 4
    # the terminal row bumps update_seq past the folded state's seq,
    # same as the timeout path (ADVICE r04): one fold -> seq 1, +1 = 2
    assert row["update_seq"] == 2


class _StubState:
    """The GroupState surface _progress_fn touches."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return tuple(self._v)

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self.removed = True
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_progress_fn_timeout_emits_final_and_drops_state():
    st = _StubState(
        value=(2, [5], [0], 4, 1, 1_000_000, 9_000_000, 7, 0),
        timed_out=True,
    )
    [out] = list(_progress_fn(("conv_x",), iter([]), st))
    assert st.removed
    row = out.iloc[0]
    assert bool(row["final"]) and row["conv_id"] == "conv_x"
    assert row["contiguous_upto"] == 2 and row["n_pending"] == 1
    assert row["duration_us"] == 8_000_000 and row["update_seq"] == 8


def test_progress_fn_sets_timeout_only_when_configured():
    st = _StubState()
    list(_progress_fn(("c",), iter([_pdf([("c", 0, None, "2026-01-01")])]), st))
    assert st.timeout_set is None
    st2 = _StubState()
    list(
        _progress_fn(
            ("c",),
            iter([_pdf([("c", 0, None, "2026-01-01")])]),
            st2,
            timeout_ms=30_000,
        )
    )
    assert st2.timeout_set == 30_000


# ------------------------------------------------------- batch ≡ oracle


def test_batch_twin_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    tr = generate_transcripts(spark, n_conversations=40, seed=11)
    got = (
        conversation_progress(tr)
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("transcripts", tr.toPandas())
    exp = con.execute(conversation_progress_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the synthesized table is gap-free: frontier == last turn everywhere
    assert (got["n_pending"] == 0).all()
    assert (got["contiguous_upto"] == got["n_turns"] - 1).all()


def test_batch_twin_handles_gaps_and_missing_turn0(spark):
    from datetime import datetime

    t0 = datetime(2026, 1, 1)
    rows = [
        ("a", 0, "user", "t", None, t0),
        ("a", 1, "tool", "t", "grep", datetime(2026, 1, 1, 0, 0, 1)),
        ("a", 3, "user", "t", None, datetime(2026, 1, 1, 0, 0, 3)),
        ("b", 2, "user", "t", None, t0),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r.conv_id: r.asDict()
        for r in conversation_progress(tr).collect()
    }
    assert got["a"]["contiguous_upto"] == 1 and got["a"]["n_pending"] == 1
    assert got["b"]["contiguous_upto"] == -1 and got["b"]["n_pending"] == 1
    assert got["b"]["n_turns"] == 1


# ------------------------------------------------- streaming ≡ batch


def test_stream_converges_to_batch_any_order(spark, tmp_path):
    tr = generate_transcripts(spark, n_conversations=30, seed=7)
    rows = tr.collect()
    rng = np.random.default_rng(3)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    # replay ~10% of rows in a later chunk: must be no-ops
    rows = rows + rows[:: 10]
    in_dir = str(tmp_path / "turns_in")
    for chunk in np.array_split(np.arange(len(rows)), 5):
        spark.createDataFrame(
            [rows[i] for i in chunk], tr.schema
        ).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_conversation_progress(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM conv_progress ORDER BY update_seq"
    ).toPandas()
    # pick each conversation's LAST update (update_seq is monotone/key)
    last = out.groupby("conv_id").tail(1).set_index("conv_id")
    exp = conversation_progress(tr).toPandas().set_index("conv_id")
    assert set(last.index) == set(exp.index)
    for col in (
        "contiguous_upto",
        "n_pending",
        "n_turns",
        "n_tool_calls",
        "duration_us",
    ):
        pd.testing.assert_series_equal(
            last[col].sort_index(),
            exp[col].sort_index(),
            check_dtype=False,
            check_names=False,
        )
    assert not last["final"].any()
    # per-key frontier trajectory is monotone non-decreasing
    mono = out.groupby("conv_id")["contiguous_upto"].apply(
        lambda s: s.is_monotonic_increasing
    )
    assert mono.all()
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_stream_timeout_finalizes_idle_conversations(spark, tmp_path):
    """Under a continuous trigger, idle keys emit final=true and drop
    state (ProcessingTimeTimeout e2e; see the operator docstring for
    why availableNow must not be combined with a timeout)."""
    import time

    tr = generate_transcripts(
        spark, n_conversations=5, seed=9, embed_samples=False
    )
    in_dir = str(tmp_path / "turns_in")
    tr.coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_conversation_progress(stream, timeout_ms=2000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress_timeout")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        n_final = 0
        while time.time() < deadline and n_final < 5:
            time.sleep(3)
            assert q.exception() is None
            pdf = spark.sql(
                "SELECT * FROM conv_progress_timeout"
            ).toPandas()
            n_final = int(pdf["final"].sum()) if len(pdf) else 0
        assert n_final == 5
        finals = pdf[pdf["final"]]
        exp = conversation_progress(tr).toPandas()
        assert sorted(finals["conv_id"]) == sorted(exp["conv_id"])
        merged = finals.merge(exp, on="conv_id", suffixes=("_s", "_b"))
        assert (merged["n_turns_s"] == merged["n_turns_b"]).all()
    finally:
        q.stop()
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_negative_turn_idx_ignored_both_sides(spark):
    """Malformed negative turn_idx rows are dropped identically by the
    batch twin (and its oracle) and the streaming fold — they used to
    shift the batch frontier rank and break streaming == batch."""
    from datetime import datetime

    t0 = datetime(2026, 1, 1)
    tr = spark.createDataFrame(
        [
            ("a", -2, "user", "t", None, t0),
            ("a", 0, "user", "t", None, t0),
            ("a", 1, "tool", "t", "grep", t0),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    row = conversation_progress(tr).collect()[0]
    assert row.contiguous_upto == 1 and row.n_pending == 0
    assert row.n_turns == 2 and row.n_tool_calls == 1
    # streaming fold: same answer
    st, n_new, _ = _fold_batch(
        _EMPTY_STATE,
        _pdf(
            [
                ("a", -2, None, "2026-01-01"),
                ("a", 0, None, "2026-01-01"),
                ("a", 1, "grep", "2026-01-01"),
            ]
        ),
    )
    assert (st[0], st[1], st[3], st[4]) == (1, [], 2, 1) and n_new == 2


def test_fold_batch_null_ts_does_not_corrupt_extent():
    pdf = _pdf(
        [
            ("c", 0, None, "2026-01-01 00:00:01"),
            ("c", 1, None, None),  # NaT must not become the int64 sentinel
        ]
    )
    st, _, _ = _fold_batch(_EMPTY_STATE, pdf)
    assert st[5] == st[6]  # extent spans only the one real timestamp
    assert st[5] > 0


def test_all_malformed_conv_absent_and_conflicting_dups_deterministic(spark):
    """A conversation with only negative turn_idx appears in NEITHER
    output (the stream filters before the state store); duplicate
    (conv, turn) rows with conflicting tool nullity resolve by the
    any-row-has-tool rule on batch, oracle, and in-batch fold."""
    import duckdb
    from datetime import datetime

    t0 = datetime(2026, 1, 1)
    tr = spark.createDataFrame(
        [
            ("bad", -1, "user", "t", None, t0),
            ("bad", -7, "user", "t", None, t0),
            ("c", 0, "user", "t", None, t0),
            ("c", 0, "tool", "t", "grep", t0),  # conflicting duplicate
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = conversation_progress(tr).toPandas()
    assert sorted(got["conv_id"]) == ["c"]
    assert got.iloc[0]["n_tool_calls"] == 1  # any-row-has-tool
    con = duckdb.connect()
    con.register("transcripts", tr.toPandas())
    exp = con.execute(conversation_progress_oracle_sql()).df()
    assert sorted(exp["conv_id"]) == ["c"]
    assert exp.iloc[0]["n_tool_calls"] == 1
    # in-batch fold: tool-bearing duplicate wins the dedupe
    st, n_new, n_tools = _fold_batch(
        _EMPTY_STATE,
        _pdf(
            [
                ("c", 0, None, "2026-01-01"),
                ("c", 0, "grep", "2026-01-01"),
            ]
        ),
    )
    assert (st[3], st[4]) == (1, 1)


def test_all_null_ts_duration_zero_both_sides(spark):
    tr = spark.createDataFrame(
        [("c", 0, "user", "t", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    row = conversation_progress(tr).collect()[0]
    assert row.duration_us == 0
    st, _, _ = _fold_batch(_EMPTY_STATE, _pdf([("c", 0, None, None)]))
    assert st[5] is None and st[6] is None  # emitted as duration 0


def test_stream_resumes_from_checkpoint_across_restart(spark, tmp_path):
    """Kill the query between micro-batches and restart it on the same
    checkpointLocation: per-key state comes back from the state store
    (not from reprocessing old files) and the final rows still equal
    the batch twin — the resumable-after-executor-loss contract for
    the applyInPandasWithState path."""
    tr = generate_transcripts(
        spark, n_conversations=12, seed=21, embed_samples=False
    )
    rows = tr.collect()
    rng = np.random.default_rng(5)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    in_dir = str(tmp_path / "turns_in")
    ckpt = str(tmp_path / "ckpt")
    half = len(rows) // 2

    def write(part):
        spark.createDataFrame(part, tr.schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def run(out_dir):
        # memory sink can't recover a checkpoint; foreachBatch can —
        # append each micro-batch's update rows to parquet
        stream = (
            spark.readStream.schema(tr.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )

        def sink(batch, batch_id):
            batch.write.mode("append").parquet(out_dir)

        q = (
            streaming_conversation_progress(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    write(rows[:half])
    run(out1)
    # restart: only the SECOND half of the data is new; the first run's
    # frontier/counts must come back from the state store
    write(rows[half:])
    run(out2)
    out = (
        spark.read.parquet(out2).orderBy("update_seq").toPandas()
    )
    last = out.groupby("conv_id").tail(1).set_index("conv_id")
    exp = conversation_progress(tr).toPandas().set_index("conv_id")
    # every conversation touched after restart must carry its full
    # pre-restart history (counts/frontier restored, not restarted)
    for conv in last.index:
        for col in (
            "contiguous_upto", "n_pending", "n_turns",
            "n_tool_calls", "duration_us",
        ):
            assert last.loc[conv, col] == exp.loc[conv, col], (
                conv, col, last.loc[conv, col], exp.loc[conv, col],
            )
    # update_seq proves state continuity: a restarted-from-zero key
    # would restart its sequence, but continuing keys strictly increase
    run1 = spark.read.parquet(out1).toPandas()
    seq1 = run1.groupby("conv_id")["update_seq"].max()
    for conv in set(seq1.index) & set(last.index):
        assert last.loc[conv, "update_seq"] > seq1.loc[conv]
