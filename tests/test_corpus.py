"""Corpus pipeline ops: boilerplate stripping, n-gram decontamination,
exact stratified sampling — hand-computed cases + DuckDB twin parity."""

import duckdb
import pytest

from centrality_gpu_spark.operators.corpus import (
    boilerplate_lines,
    ngram_contamination,
    ngram_contamination_sql,
    stratified_sample,
    stratified_sample_sql,
    strip_boilerplate,
    strip_boilerplate_sql,
)

from tests.conftest import SF_MED

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def boiler_docs(spark):
    banner = "accept all cookies"
    rows = [
        (1, f"{banner}\nreal content one\nmore text", "en", "a", 0),
        (2, f"intro line\n{banner}\nreal content two", "en", "a", 0),
        (3, f"{banner}\n\n{banner}", "en", "b", 0),  # all boilerplate
        (4, "unique document", "en", "b", 0),
        (5, "", "en", "b", 0),  # empty doc survives with 0 lines
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_boilerplate_lines(boiler_docs):
    got = {r.line: r.n_docs for r in boilerplate_lines(boiler_docs).collect()}
    # the banner appears in docs 1, 2, 3 (twice in 3 -> still 3 DISTINCT)
    assert got == {"accept all cookies": 3}


def test_strip_boilerplate(boiler_docs):
    got = {
        r.doc_id: (r.text_clean, r.n_lines_removed)
        for r in strip_boilerplate(boiler_docs).collect()
    }
    assert got[1] == ("real content one\nmore text", 1)
    assert got[2] == ("intro line\nreal content two", 1)
    assert got[3] == ("", 2)  # both banner copies removed
    assert got[4] == ("unique document", 0)
    assert got[5] == ("", 0)


def test_ngram_contamination_hand(spark):
    rows = [
        # eval split: one doc with trigrams "a b c", "b c d"
        (1, "a b c d", "en", "eval", 0),
        # train: shares "a b c" -> contaminated, 1 shared gram
        (2, "x a b c y", "en", "train", 0),
        # train: shares both eval trigrams
        (3, "a b c d e", "en", "train", 0),
        # train: clean
        (4, "p q r s", "en", "train", 0),
        # train: too short for trigrams -> clean
        (5, "a b", "en", "train", 0),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r.doc_id: (r.n_shared_ngrams, r.contaminated)
        for r in ngram_contamination(df, "eval", n=3).collect()
    }
    assert got == {
        2: (1, True),
        3: (2, True),
        4: (0, False),
        5: (0, False),
    }


def test_stratified_sample_exact_counts(spark):
    # 10 docs in source a, 5 in source b; fraction 0.4 -> exactly 4 + 2
    rows = [(i, f"doc {i}", "en", "a" if i < 10 else "b", 0) for i in range(15)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = stratified_sample(df, fraction=0.4).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["a"]) == 4
    assert len(by_src["b"]) == 2
    # deterministic: a second run picks the identical docs
    out2 = stratified_sample(df, fraction=0.4).collect()
    assert {(r.doc_id, r.source) for r in out} == {
        (r.doc_id, r.source) for r in out2
    }
    # a different seed picks a (almost surely) different set
    out3 = stratified_sample(df, fraction=0.4, seed="other").collect()
    assert len(out3) == len(out)


@pytest.mark.parametrize(
    "spark_fn,sql",
    [
        (
            lambda d: strip_boilerplate(d, min_docs=2),
            strip_boilerplate_sql(min_docs=2),
        ),
        (
            lambda d: ngram_contamination(d, "src0", n=3),
            ngram_contamination_sql("src0", n=3),
        ),
        (
            lambda d: stratified_sample(d, fraction=0.3),
            stratified_sample_sql(fraction=0.3),
        ),
    ],
    ids=["strip_boilerplate", "ngram_contamination", "stratified_sample"],
)
def test_oracle_parity_real_docs(spark, spark_fn, sql):
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    spark_rows = sorted(
        tuple(str(x) for x in row)
        for row in spark_fn(docs).toPandas().itertuples(index=False, name=None)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_MED}/documents.parquet')"
    )
    oracle_rows = sorted(
        tuple(str(x) for x in row)
        for row in con.execute(sql).df().itertuples(index=False, name=None)
    )
    assert spark_rows == oracle_rows


# ----------------------------------------------- end-to-end curation

from centrality_gpu_spark.operators.corpus import (
    curate_corpus,
    curate_corpus_sql,
    curation_funnel,
    curation_funnel_sql,
)

GOOD_A = (
    "the cat and the dog walk to the park in the morning with a friend of mine"
)
GOOD_B = "a story of the sea and the wind to sail in with hope for the crew"
CONTAM = "the spaceship lands on a red planet to explore the canyon of dust"
EVAL_DOC = "report on a red planet mission"
SHORT = "the tiny one"
GERMAN = "der die das und ist ein zu den von mit"


def test_curate_corpus_first_drop_ordering(spark):
    rows = [
        (1, GOOD_A, "en", "train", 0),
        (2, GOOD_A, "en", "train", 0),      # exact near-dup of 1
        (3, GERMAN, "de", "train", 0),      # fails lang
        (4, CONTAM, "en", "train", 0),      # shares "on a red" with eval
        (5, GOOD_B, "en", "train", 0),
        (6, SHORT, "en", "train", 0),       # too short
        (7, SHORT, "en", "train", 0),       # too short AND dup of 6:
                                            # quality fires first
        (8, EVAL_DOC, "en", "eval", 0),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r.doc_id: (r.decision, r.kept)
        for r in curate_corpus(docs, "eval", fraction=1.0).collect()
    }
    assert got == {
        1: ("kept", 1),
        2: ("duplicate", 0),
        3: ("quality:lang", 0),
        4: ("contaminated", 0),
        5: ("kept", 1),
        6: ("quality:too_short", 0),
        7: ("quality:too_short", 0),  # NOT 'duplicate' — stage order
    }
    funnel = {
        r.decision: r.n_docs
        for r in curation_funnel(docs, "eval", fraction=1.0).collect()
    }
    assert funnel == {
        "kept": 2,
        "duplicate": 1,
        "quality:lang": 1,
        "contaminated": 1,
        "quality:too_short": 2,
    }


@pytest.mark.parametrize(
    "spark_fn,sql",
    [
        (
            lambda d: curate_corpus(d, "src0", fraction=0.5),
            curate_corpus_sql("src0", fraction=0.5),
        ),
        (
            lambda d: curation_funnel(d, "src0", fraction=0.5),
            curation_funnel_sql("src0", fraction=0.5),
        ),
    ],
    ids=["curate_corpus", "curation_funnel"],
)
def test_curate_oracle_parity_real_docs(spark, spark_fn, sql):
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    spark_rows = sorted(
        tuple(str(x) for x in row)
        for row in spark_fn(docs).toPandas().itertuples(index=False, name=None)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_MED}/documents.parquet')"
    )
    oracle_rows = sorted(
        tuple(str(x) for x in row)
        for row in con.execute(sql).df().itertuples(index=False, name=None)
    )
    assert spark_rows == oracle_rows


# --------------------------------------------------- sequence packing

from centrality_gpu_spark.operators.corpus import (
    pack_sequences,
    pack_sequences_sql,
)


def test_pack_sequences_hand(spark):
    rows = [
        (1, "a b c", "en", "s", 0),       # 3 tokens, offset 0, shard 0
        (2, "d e", "en", "s", 0),         # 2 tokens, offset 3, shard 0
        (3, "", "en", "s", 0),            # 0 tokens, offset 5
        (4, "f g h i", "en", "s", 0),     # 4 tokens, offset 5, shard 1
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r.doc_id: (r.n_tokens, r.tok_offset, r.shard)
        for r in pack_sequences(docs, seq_len=4, n_buckets=2).collect()
    }
    assert got == {
        1: (3, 0, 0),
        2: (2, 3, 0),
        3: (0, 5, 1),
        4: (4, 5, 1),
    }


def test_pack_sequences_oracle_parity(spark):
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    got = sorted(
        tuple(r) for r in pack_sequences(docs, seq_len=1000).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_MED}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(pack_sequences_sql(1000)).fetchall())
    assert got == want


def test_cli_curate_job(spark, tmp_path):
    """The spark-submit-able curate job end-to-end: per-doc decisions
    parquet + funnel metrics, matching the operator directly. Runs in a
    subprocess (the cli owns and stops its own SparkSession)."""
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "curated")
    subprocess.run(
        [
            sys.executable, "-m", "centrality_gpu_spark.cli",
            "curate", "--input", f"{SF_MED}/documents.parquet",
            "--output", out, "--eval-source", "src0",
            "--sample-fraction", "0.5",
        ],
        check=True,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        timeout=420,
    )
    m = json.load(open(os.path.join(out, "_metrics.json")))
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    want = {
        r.decision: r.n_docs
        for r in curation_funnel(docs, "src0", fraction=0.5).collect()
    }
    assert m["funnel"] == want
    got = spark.read.parquet(out)
    assert got.count() == sum(want.values())


# --------------------------------------------------- vocabulary growth

from centrality_gpu_spark.operators.corpus import vocab_growth


def test_vocab_growth_hand(spark):
    rows = [
        (1, "a b c", "en", "s", 0),
        (2, "b c d", "en", "s", 0),   # d is new
        (3, "a d", "en", "s", 0),     # nothing new
        (4, "", "en", "s", 0),        # empty doc contributes 0
        (5, "e", "en", "s", 0),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r.doc_id: (r.new_words, r.vocab_size)
        for r in vocab_growth(docs, n_buckets=2).collect()
    }
    assert got == {1: (3, 3), 2: (1, 4), 3: (0, 4), 4: (0, 4), 5: (1, 5)}


def test_pack_and_vocab_empty_corpus(spark):
    """Empty documents input → empty result with the same schema (no
    TypeError from the null min/max bounds collect)."""
    from centrality_gpu_spark.operators.corpus import pack_sequences, vocab_growth

    empty = spark.createDataFrame([], DOC_SCHEMA)
    packed = pack_sequences(empty)
    assert packed.count() == 0
    assert packed.columns == ["doc_id", "n_tokens", "tok_offset", "shard"]
    vg = vocab_growth(empty)
    assert vg.count() == 0
    assert vg.columns == ["doc_id", "new_words", "vocab_size"]
