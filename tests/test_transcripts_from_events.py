"""events_transcripts: the driver-checkable synthesis of the north
rule's input table (conv_id, turn_idx, role, text, tool, ts) from
events, and the transcript pipeline built over it.

The DuckDB twins (TRANSCRIPTS_CTE / TRANSCRIPT_EDGES_CTE) are
hash-checked every round by tools/check_oracles.py; these tests pin the
properties the twins can't express: exact input_hint schema, the
reply-chain invariant, and stable-ordering determinism.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from centrality_gpu_spark.sources.testdata_graphs import (
    TRANSCRIPT_EDGES_CTE,
    events_transcripts,
)
from centrality_gpu_spark.sources.transcripts import (
    reply_chain_check,
    transcript_graph,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def transcripts(spark):
    return events_transcripts(spark, SF).persist()


def test_input_hint_schema(transcripts):
    # exactly the input_hint's column names AND types, in order
    want = [
        ("conv_id", T.StringType()),
        ("turn_idx", T.IntegerType()),
        ("role", T.StringType()),
        ("text", T.StringType()),
        ("tool", T.StringType()),
        ("ts", T.TimestampType()),
    ]
    got = [(f.name, f.dataType) for f in transcripts.schema.fields]
    assert got == want


def test_reply_invariant_holds(transcripts):
    # text startswith "{conv_id}:{turn_idx}:{role}" and turn_idx is
    # dense per conversation — the input_hint's per-row invariant
    assert reply_chain_check(transcripts).count() == 0


def test_roles_alternate_and_tools_on_assistant_turns(transcripts):
    bad_role = transcripts.where(
        (
            (F.col("turn_idx") % 2 == 0) & (F.col("role") != "user")
        )
        | ((F.col("turn_idx") % 2 == 1) & (F.col("role") != "assistant"))
    )
    assert bad_role.count() == 0
    # tool present iff assistant turn
    assert (
        transcripts.where(
            (F.col("role") == "user") & F.col("tool").isNotNull()
        ).count()
        == 0
    )
    assert (
        transcripts.where(
            (F.col("role") == "assistant") & F.col("tool").isNull()
        ).count()
        == 0
    )


def test_deterministic_across_builds(transcripts, spark):
    again = events_transcripts(spark, SF)
    assert transcripts.exceptAll(again).count() == 0
    assert again.exceptAll(transcripts).count() == 0


def test_turn_count_matches_events(transcripts, spark):
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert transcripts.count() == n_events


def test_transcript_graph_edges_match_duckdb_twin(transcripts, spark):
    tg = transcript_graph(
        transcripts, edge_types=("tool", "coinvocation", "reply")
    )
    got = sorted(
        (r.src, r.dst, r.weight)
        for r in tg.graph.edges.select("src", "dst", "weight").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {TRANSCRIPT_EDGES_CTE} SELECT src, dst, weight FROM edges"
        ).fetchall()
    )
    assert got == want
