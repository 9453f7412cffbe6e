"""Sessionization: python golden + DuckDB twin + real-parquet run."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pandas as pd

from centrality_gpu_spark.operators.sessions import (
    session_stats,
    session_stats_oracle_sql,
    sessionize,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)

# user 1: 3 events tight, 30-min+ gap, 2 events; user 2: single event;
# user 3: two events at the SAME timestamp (id tie-break)
ROWS = [
    (1, 1, "a", T0),
    (2, 1, "b", T0 + timedelta(minutes=5)),
    (3, 1, "a", T0 + timedelta(minutes=10)),
    (4, 1, "c", T0 + timedelta(minutes=41)),
    (5, 1, "c", T0 + timedelta(minutes=50)),
    (6, 2, "a", T0 + timedelta(hours=2)),
    (7, 3, "a", T0),
    (8, 3, "b", T0),
]


def _events(spark):
    return spark.createDataFrame(
        [(i, u, t, ts) for i, u, t, ts in ROWS],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


def test_sessionize_golden(spark):
    s = sessionize(_events(spark)).toPandas().set_index("event_id")
    # user 1: events 1-3 session 0; events 4-5 session 1 (gap 31 min)
    assert list(s.loc[[1, 2, 3, 4, 5]].session_idx) == [0, 0, 0, 1, 1]
    assert s.loc[6].session_idx == 0
    # same-timestamp events: one session, deterministic
    assert list(s.loc[[7, 8]].session_idx) == [0, 0]


def test_session_stats_golden(spark):
    st = (
        session_stats(_events(spark))
        .toPandas()
        .set_index(["user_id", "session_idx"])
        .sort_index()
    )
    assert st.loc[(1, 0)].n_events == 3
    assert st.loc[(1, 0)].duration_ms == 10 * 60 * 1000
    assert st.loc[(1, 0)].n_types == 2
    assert st.loc[(1, 1)].n_events == 2
    assert st.loc[(2, 0)].n_events == 1
    assert st.loc[(2, 0)].duration_ms == 0
    assert st.loc[(3, 0)].n_events == 2


def test_session_stats_oracle_matches_testdata(spark):
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = (
        session_stats(ev)
        .toPandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(session_stats_oracle_sql()).df()
    assert len(got) == len(want)
    for c in ["user_id", "session_idx", "n_events", "start_ms", "duration_ms", "n_types"]:
        assert list(got[c]) == list(want[c]), c


def test_sessionize_gap_parameter(spark):
    # with a huge gap everything is one session per user
    s = sessionize(_events(spark), gap_ms=10**12).toPandas()
    assert s.session_idx.max() == 0
