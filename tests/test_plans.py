"""Physical-plan assertions: the structural claims the engine's scale
story rests on, pinned against Catalyst's executed plans so a
regression (lost pushdown, a new per-round shuffle, Python in a hot
path) fails loudly instead of just running slower.
"""

import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_hash_exchanges(plan: str) -> int:
    return plan.count("Exchange hashpartitioning")


def test_parquet_scan_pushdown_and_pruning(spark):
    """Filter + projection must reach the parquet scan: PushedFilters
    non-empty and ReadSchema limited to the selected columns."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 10)
        .select("user_id", "event_type")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(user_id), LessThan(user_id,10)]" in plan
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in schema and "event_type" in schema
    assert "ts" not in schema and "props" not in schema  # pruned


def test_edges_by_src_join_reuses_cached_partitioning(spark):
    """A src-keyed join against edges_by_src() must not re-shuffle the
    edge side: the cached REPARTITION exchange satisfies the join's
    distribution, so only the (small) vector side moves."""
    g = Graph.from_undirected_edges(
        spark.createDataFrame(
            [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
        )
    )
    e = g.edges_by_src()
    e.count()  # materialize the cache
    vec = spark.range(50).select(
        F.col("id").alias("src"), F.lit(1.0).alias("x")
    )
    # force a shuffle join so the edge side's distribution is consulted
    joined = e.join(vec.hint("shuffle_hash"), "src")
    plan = _plan(joined)
    assert "InMemoryTableScan" in plan
    # the printed plan nests the cached relation's own build plan under
    # InMemoryRelation; the claim is about the OUTER plan: between the
    # join and the edge-side cache scan there must be no exchange
    edge_side = plan.split("InMemoryTableScan")[0]
    assert "Join" in edge_side
    assert _n_hash_exchanges(edge_side) == 0


def test_temporal_round_shuffles_only_the_vector(spark):
    """One earliest-arrival round = one O(V) hash exchange (the min-agg
    merge); bucketed edges never move (broadcast or cache-reuse only)."""
    from centrality_gpu_spark.operators.temporal import earliest_arrival  # noqa: F401

    e = (
        spark.createDataFrame([(0, 1, 5), (1, 2, 9)], "src long, dst long, ts long")
        .repartition("src")
        .persist()
    )
    e.count()
    arr = spark.createDataFrame([(0, 0)], "id long, arrival long").localCheckpoint()
    msgs = (
        e.join(arr, e.src == arr.id)
        .where(F.col("ts") >= F.col("arrival"))
        .select(F.col("dst").alias("id"), F.col("ts").alias("arrival"))
    )
    new_arr = arr.unionByName(msgs).groupBy("id").agg(
        F.min("arrival").alias("arrival")
    )
    plan = _plan(new_arr)
    # outside the cached edge relation (whose printed build plan holds
    # the one-time REPARTITION_BY_COL exchange): exactly the merge
    # aggregation's exchange — the edge table itself never re-shuffles
    outer = plan.split("InMemoryRelation")[0]
    assert outer.count("ENSURE_REQUIREMENTS") == 1
    assert "REPARTITION_BY_COL" not in outer
    e.unpersist()


def test_text_ops_stay_in_codegen(spark):
    """Quality scoring is pure-expression: whole-stage codegen, no
    Python evaluation nodes in the plan."""
    from centrality_gpu_spark.operators.text import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(quality_score(docs))
    # "*(n)" is the whole-stage-codegen stage marker in the plan print
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan


def test_pagerank_sql_iteration_vector_only_shuffle(spark):
    """One SQL-mode PageRank superstep over bucketed edges shuffles
    O(V) rank rows, not the edge table: at most 2 hash exchanges
    (contribution agg + any vector-side requirement), none of them a
    fresh edge repartition."""
    g = Graph.from_undirected_edges(
        spark.createDataFrame(
            [(i, (i * 7 + 1) % 100) for i in range(100)], "src long, dst long"
        )
    )
    e = g.edges_by_src()
    e.count()
    ranks = g.vertices().select("id", F.lit(1.0).alias("rank")).localCheckpoint()
    contrib = (
        e.join(ranks.hint("shuffle_hash"), e.src == ranks.id)
        .select("dst", (F.col("rank") * F.col("src_inv_deg")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("contrib"))
    )
    plan = _plan(contrib)
    assert "InMemoryTableScan" in plan
    edge_side = plan.split("InMemoryTableScan")[0]
    # above the cache scan: the contribution agg's exchange at most —
    # never a fresh repartition of the edge table
    assert _n_hash_exchanges(edge_side) <= 1


def test_pack_sequences_no_global_window(spark):
    """The two-phase prefix sum must not fall back to a single-task
    global window: every window in the plan is partitioned (by the
    range bucket), and the corpus is never sorted globally."""
    from centrality_gpu_spark.operators.corpus import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(pack_sequences(docs, seq_len=512))
    for line in plan.splitlines():
        if "Window [" in line or "RunningWindowFunction" in line:
            assert "windowspecdefinition(pid" in line, line
    # no empty-partition window spec (the WindowExec all-to-one-task
    # fallback prints 'windowspecdefinition(' with no partition cols)
    assert "windowspecdefinition(doc_id" not in plan


def test_knn_graph_no_cartesian_and_pruned_scan(spark):
    """The kNN construction must stay a bucketed equi-join (no
    cartesian/broadcast-nested-loop) and read only the two embedding
    columns it uses."""
    from centrality_gpu_spark.operators.similarity import knn_graph

    embs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).where("vec_id < 100")
    plan = _plan(knn_graph(embs, k=5, n_planes=8, n_tables=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    schema = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert schema and all("label" not in ln for ln in schema)  # pruned


def test_curate_corpus_single_pass_signals(spark):
    """The curation gate's four signal scans must not multiply into
    repeated full-document reads beyond the stage count — the plan
    reads the documents parquet a bounded number of times (one per
    signal + pipeline stages), never per-row Python."""
    from centrality_gpu_spark.operators.corpus import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(curate_corpus(docs, "src0", fraction=0.5))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_transcript_pipeline_pruned_scan_no_cartesian(spark):
    """The transcripts synthesis + edge build must (a) prune the events
    scan to the four columns the synthesis touches (value/props never
    read), (b) window-partition by user_id/conv_id — never a global
    single-partition window, and (c) join without cartesian products."""
    from centrality_gpu_spark.sources.testdata_graphs import (
        events_transcripts,
    )
    from centrality_gpu_spark.sources.transcripts import (
        tool_transitions,
        transcript_graph,
    )

    t = events_transcripts(spark, "/root/testdata/sf0.001")
    tplan = _plan(t)
    schema = tplan.split("ReadSchema:")[1].splitlines()[0]
    assert "value" not in schema and "props" not in schema  # pruned
    assert "windowspecdefinition(user_id" in tplan  # keyed window

    tt = tool_transitions(t)
    ttplan = _plan(tt)
    assert "windowspecdefinition(conv_id" in ttplan
    assert "CartesianProduct" not in ttplan
    assert "BroadcastHashJoin" in ttplan  # per-source totals broadcast

    edges = transcript_graph(
        t, edge_types=("tool", "coinvocation", "reply")
    ).graph.edges
    eplan = _plan(edges)
    assert "CartesianProduct" not in eplan
