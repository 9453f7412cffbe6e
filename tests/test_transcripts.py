"""Transcript generation + edge builder: determinism, invariants, and
the golden-fixture carry-over (embedded sample graph → identical BC)."""

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.datagen import generate_transcripts
from centrality_gpu_spark.operators.betweenness import betweenness_broadcast
from centrality_gpu_spark.sources.transcripts import (
    reply_chain_check,
    transcript_graph,
    vertex_ids,
)

from tests.conftest import sample_nx


@pytest.fixture(scope="module")
def transcripts(spark):
    df = generate_transcripts(spark, n_conversations=60, n_tools=8).persist()
    df.count()
    yield df
    df.unpersist()


def test_generation_deterministic(spark, transcripts):
    again = generate_transcripts(spark, n_conversations=60, n_tools=8)
    assert transcripts.exceptAll(again).count() == 0
    assert again.exceptAll(transcripts).count() == 0
    # different partitioning must not change content
    repart = generate_transcripts(
        spark.range(0).sparkSession, n_conversations=60, n_tools=8
    )


def test_reply_chain_invariant(transcripts):
    assert reply_chain_check(transcripts).count() == 0


def test_reply_chain_catches_violations(spark):
    bad = spark.createDataFrame(
        [
            ("c1", 0, "user", "c1:0:user ok", None, None),
            ("c1", 2, "user", "c1:2:user gap", None, None),   # chain gap
            ("c2", 0, "user", "WRONG text", None, None),       # text invariant
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    assert reply_chain_check(bad).count() == 2


def test_vertex_ids_dense_and_hash(transcripts):
    dense = vertex_ids(transcripts, id_mode="dense")
    n = dense.count()
    ids = [r.id for r in dense.select("id").collect()]
    assert sorted(ids) == list(range(n))
    hashed = vertex_ids(transcripts, id_mode="hash")
    assert hashed.select("id").distinct().count() == n


def test_bipartite_tool_graph(transcripts):
    tg = transcript_graph(transcripts, edge_types=("tool",))
    # bipartite: every edge connects a conv vertex and a tool vertex
    vm = tg.vertex_map
    e = (
        tg.graph.edges.join(vm.select(F.col("id").alias("src"), F.col("kind").alias("ks")), "src")
        .join(vm.select(F.col("id").alias("dst"), F.col("kind").alias("kd")), "dst")
    )
    assert e.where(F.col("ks") == F.col("kd")).count() == 0


def test_golden_carryover_betweenness(spark, transcripts):
    """transcripts → co-invocation projection → BC must equal the
    reference golden values for the embedded test1 graph."""
    sub = transcripts.where(F.col("conv_id").startswith("gtest1_"))
    tg = transcript_graph(sub, edge_types=("coinvocation",))
    nxg = sample_nx("test1")
    exp = {k: 2.0 * v for k, v in
           nx.betweenness_centrality(nxg, normalized=False).items()}
    name_of = {r.id: r.name for r in tg.vertex_map.collect()}
    got = {
        int(name_of[r.id].rsplit("_v", 1)[1]): r.bc
        for r in betweenness_broadcast(tg.graph).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_coinvocation_weights(spark):
    """Two convs sharing 2 tools → one edge with weight 2."""
    rows = []
    for conv, tools in [("a", ["t1", "t2"]), ("b", ["t1", "t2"]), ("c", ["t2"])]:
        for i, t in enumerate(tools):
            rows.append((conv, i, "tool", f"{conv}:{i}:tool", t, None))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    tg = transcript_graph(df, edge_types=("coinvocation",))
    vm = {r.name: r.id for r in tg.vertex_map.collect()}
    w = {(r.src, r.dst): r.weight for r in tg.graph.edges.collect()}
    assert w[(vm["a"], vm["b"])] == 2.0
    assert w[(vm["a"], vm["c"])] == 1.0
    assert w[(vm["b"], vm["c"])] == 1.0


def test_max_tool_degree_cap(spark):
    """A hub tool above the cap is excluded from the projection."""
    rows = []
    for conv in ["a", "b", "c", "d"]:
        rows.append((conv, 0, "tool", f"{conv}:0:tool", "hub", None))
    rows.append(("a", 1, "tool", "a:1:tool", "rare", None))
    rows.append(("b", 1, "tool", "b:1:tool", "rare", None))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    tg = transcript_graph(df, edge_types=("coinvocation",), max_tool_degree=3)
    vm = {r.name: r.id for r in tg.vertex_map.collect()}
    pairs = {(r.src, r.dst) for r in tg.graph.edges.collect()}
    assert (vm["a"], vm["b"]) in pairs          # via 'rare'
    assert (vm["c"], vm["d"]) not in pairs      # 'hub' capped out


def test_tool_name_colliding_with_conv_id(spark):
    # a tool literally named like a conv_id must stay a separate vertex
    # and edges must not fan out through the name-only join
    rows = [
        ("conv_a", 0, "user", "t", "conv_b", None),
        ("conv_b", 0, "user", "t", "hammer", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    for mode in ("dense", "hash"):
        tg = transcript_graph(df, edge_types=("tool",), id_mode=mode)
        vm = {(r.name, r.kind): r.id for r in tg.vertex_map.collect()}
        assert len(vm) == 4  # conv_a, conv_b(conv), conv_b(tool), hammer
        assert vm[("conv_b", "conv")] != vm[("conv_b", "tool")]
        edges = {(r.src, r.dst) for r in tg.graph.edges.collect()}
        # exactly 2 undirected edges: conv_a–tool:conv_b, conv_b–hammer
        assert len(edges) == 4
        assert (vm[("conv_a", "conv")], vm[("conv_b", "tool")]) in edges
        assert (vm[("conv_b", "conv")], vm[("hammer", "tool")]) in edges
        assert (vm[("conv_a", "conv")], vm[("conv_b", "conv")]) not in edges


def test_conversation_stats_vs_duckdb(spark, transcripts, tmp_path):
    """conversation_stats hash-equals its DuckDB twin on the same
    parquet (the driver-gate idiom, run locally since the transcripts
    table is synthesized, not part of the driver's fixed table set)."""
    import duckdb

    from centrality_gpu_spark.sources.transcripts import (
        CONVERSATION_STATS_SQL,
        conversation_stats,
    )

    path = str(tmp_path / "transcripts.parquet")
    transcripts.write.mode("overwrite").parquet(path)
    got = sorted(
        tuple(r) for r in conversation_stats(transcripts).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW transcripts AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(CONVERSATION_STATS_SQL).fetchall())
    assert got == want
    # sanity on semantics
    stats = {r.conv_id: r for r in conversation_stats(transcripts).collect()}
    assert all(s.n_turns >= s.n_user + s.n_assistant for s in stats.values())
    assert all(s.n_tool_calls >= s.n_distinct_tools for s in stats.values())
    assert all(s.duration_us >= 0 for s in stats.values())


def test_tool_transitions_hand_and_duckdb(spark, tmp_path):
    import duckdb

    from centrality_gpu_spark.sources.transcripts import (
        TOOL_TRANSITIONS_SQL,
        tool_transitions,
    )

    rows = [
        # conv c1: grep -> edit -> edit ; the user turn between tool
        # turns must NOT break the chain (tool NULL rows are skipped)
        ("c1", 0, "assistant", "t", "grep", "2026-01-01T00:00:00"),
        ("c1", 1, "user", "t", None, "2026-01-01T00:00:01"),
        ("c1", 2, "assistant", "t", "edit", "2026-01-01T00:00:02"),
        ("c1", 3, "assistant", "t", "edit", "2026-01-01T00:00:03"),
        # conv c2: grep -> run ; transitions never cross conversations
        ("c2", 0, "assistant", "t", "grep", "2026-01-01T00:00:00"),
        ("c2", 1, "assistant", "t", "run", "2026-01-01T00:00:01"),
    ]
    df = spark.createDataFrame(
        [(c, i, r, tx, tl, __import__("datetime").datetime.fromisoformat(ts))
         for c, i, r, tx, tl, ts in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r.src_tool, r.dst_tool): (r.n, r.p)
        for r in tool_transitions(df).collect()
    }
    assert got == {
        ("grep", "edit"): (1, 0.5),
        ("grep", "run"): (1, 0.5),
        ("edit", "edit"): (1, 1.0),
    }
    # DuckDB twin parity on the same parquet
    path = str(tmp_path / "tt.parquet")
    df.write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW transcripts AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(TOOL_TRANSITIONS_SQL).fetchall())
    assert sorted(tuple(r) for r in tool_transitions(df).collect()) == want


def test_tool_transitions_on_synth(spark, transcripts, tmp_path):
    import duckdb

    from centrality_gpu_spark.sources.transcripts import (
        TOOL_TRANSITIONS_SQL,
        tool_transitions,
    )

    path = str(tmp_path / "transcripts.parquet")
    transcripts.write.mode("overwrite").parquet(path)
    got = sorted(tuple(r) for r in tool_transitions(transcripts).collect())
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW transcripts AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(TOOL_TRANSITIONS_SQL).fetchall())
    assert got == want


def test_reply_edge_type(spark):
    from centrality_gpu_spark.sources.transcripts import transcript_graph

    rows = [
        ("c1", 0, "assistant", "t", "grep", "2026-01-01T00:00:00"),
        ("c1", 1, "assistant", "t", "edit", "2026-01-01T00:00:01"),
        ("c1", 2, "assistant", "t", "grep", "2026-01-01T00:00:02"),
        ("c1", 3, "assistant", "t", "grep", "2026-01-01T00:00:03"),  # self
        ("c2", 0, "assistant", "t", "edit", "2026-01-01T00:00:00"),
        ("c2", 1, "assistant", "t", "grep", "2026-01-01T00:00:01"),
    ]
    df = spark.createDataFrame(
        [(c, i, r, tx, tl, __import__("datetime").datetime.fromisoformat(ts))
         for c, i, r, tx, tl, ts in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    tg = transcript_graph(df, edge_types=("reply",))
    vm = {(r.name, r.kind): r.id for r in tg.vertex_map.collect()}
    edges = {
        (r.src, r.dst): r.weight for r in tg.graph.edges.collect()
    }
    g_id, e_id = vm[("grep", "tool")], vm[("edit", "tool")]
    # grep->edit, edit->grep (c1), grep->grep (self, dropped),
    # edit->grep (c2): undirected weight = 3
    assert edges[(g_id, e_id)] == 3.0 and edges[(e_id, g_id)] == 3.0
    # only the two tool vertices carry reply edges
    assert set(edges) == {(g_id, e_id), (e_id, g_id)}


def test_dense_rank_ids_rejects_reserved_columns(spark):
    import pytest as _pytest

    from centrality_gpu_spark.ids import dense_rank_ids

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with _pytest.raises(ValueError, match="reserved"):
        dense_rank_ids(df, ("name",))
    df2 = spark.createDataFrame([(1, "a")], "pid long, name string")
    with _pytest.raises(ValueError, match="reserved"):
        dense_rank_ids(df2, ("name",))
