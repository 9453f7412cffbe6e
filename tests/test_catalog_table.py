"""Catalog-table read surface (table-format='table'): the abstraction
an Iceberg table presents once session.iceberg_conf registers its
catalog. The sandbox ships no iceberg runtime jar, so the path is
proven end-to-end against the built-in session catalog — write the
transcripts table with saveAsTable, read it back via spark.read.table,
and run the north-rule graph build on it; the Iceberg case differs
only in session conf (unit-tested in test_iceberg.py)."""

import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.datagen import generate_transcripts
from centrality_gpu_spark.sources.transcripts import transcript_graph


@pytest.fixture()
def transcripts_table(spark, tmp_path):
    db = "cgs_cat_test"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'"
    )
    tr = generate_transcripts(
        spark, n_conversations=200, n_tools=12, max_turns=12,
        embed_samples=False,
    )
    tr.write.mode("overwrite").saveAsTable(f"{db}.transcripts")
    yield f"{db}.transcripts", tr
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_read_table_roundtrips_transcripts(spark, transcripts_table):
    ident, tr = transcripts_table
    back = spark.read.table(ident)
    assert sorted(back.columns) == sorted(tr.columns)
    assert back.count() == tr.count()
    # per-turn text equality under stable ordering — the input_hint's
    # row-level invariant, through the catalog surface
    a = tr.select("conv_id", "turn_idx", "text")
    b = back.select("conv_id", "turn_idx", "text")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_transcript_graph_from_catalog_table(spark, transcripts_table):
    ident, tr = transcripts_table
    g_tbl = transcript_graph(spark.read.table(ident), id_mode="hash")
    g_df = transcript_graph(tr, id_mode="hash")
    e1 = {
        (r.src, r.dst, r.weight)
        for r in g_tbl.graph.edges.collect()
    }
    e2 = {
        (r.src, r.dst, r.weight)
        for r in g_df.graph.edges.collect()
    }
    assert e1 == e2 and len(e1) > 0


def test_cli_table_format_reads_catalog_table(
    spark, transcripts_table, tmp_path, monkeypatch
):
    """The CLI's --table-format table path end-to-end: PageRank over
    the catalog-table transcripts equals the in-session run."""
    ident, tr = transcripts_table
    from centrality_gpu_spark import cli
    from centrality_gpu_spark.operators.pagerank import pagerank

    # keep the CLI on the already-running test session, and neuter its
    # end-of-run spark.stop() so the shared fixture survives
    monkeypatch.setattr(
        "centrality_gpu_spark.session.get_spark", lambda *a, **k: spark
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    out = tmp_path / "pr_out"
    cli.main([
        "pagerank",
        "--input", ident,
        "--input-format", "transcripts",
        "--table-format", "table",
        "--output", str(out),
        "--fixed-iterations", "5",
        "--mode", "sql",
        "--id-mode", "hash",
    ])
    got = spark.read.parquet(str(out))
    exp = pagerank(
        transcript_graph(tr, id_mode="hash").graph,
        fixed_iterations=5,
        mode="sql",
    )
    joined = got.select("id", F.col("rank").alias("g")).join(
        exp.select("id", F.col("rank").alias("e")), "id", "full"
    )
    assert joined.where(
        F.abs(F.col("g") - F.col("e")) > 1e-9
    ).isEmpty()
    assert got.count() == exp.count() > 0
