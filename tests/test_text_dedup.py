"""Text analysis + dedup operators on the real documents table and on
synthetic near-duplicates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.dedup import (
    exact_duplicates,
    minhash_candidates,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
    with_shingles,
)
from centrality_gpu_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)

from tests.conftest import SF_MED

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def documents(spark):
    df = spark.read.parquet(f"{SF_MED}/documents.parquet").persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),                       # exact dup
        (3, base.replace("lazy", "sleepy"), "en", "s", 0),     # near dup
        (4, "völlig anderes thema und der text ist deutsch mit den wörtern", "de", "s", 0),
        (5, "zzz qqq xxx", "und", "s", 0),                     # junk
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "hello, world! x", "en", "s", 0), (2, "", "en", "s", 0)], DOC_SCHEMA
    )
    got = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens) for r in token_stats(df).collect()}
    # ws: "hello,", "world!", "x" ; bpe: hello , world ! x
    assert got[1] == (3, 5)
    assert got[2] == (0, 0)


def test_repetition_stats_hand_computed(spark):
    from centrality_gpu_spark.operators.text import repetition_stats

    rows = [
        # 4 non-empty lines, 2 are "a b" dups -> dup_line_frac=0.25;
        # words: a b c a b d -> bigrams [a b, b c, c a, a b, b d]
        # top=2/5; trigrams all distinct -> 0
        (1, "a b\nc\n\na b\nd", "en", "s", 0),
        # one word: no bigrams/trigrams, one line, no dups
        (2, "word", "en", "s", 0),
        # empty doc: everything 0
        (3, "", "en", "s", 0),
        # "x x x x": bigrams [x x]*3 -> top=1.0; trigrams [x x x]*2 ->
        # dup 0.5; single line
        (4, "x x x x", "en", "s", 0),
    ]
    got = {
        r.doc_id: (r.n_lines, r.dup_line_frac, r.top_bigram_frac, r.dup_trigram_frac)
        for r in repetition_stats(
            spark.createDataFrame(rows, DOC_SCHEMA)
        ).collect()
    }
    assert got[1] == (4, 0.25, 0.4, 0.0)
    assert got[2] == (1, 0.0, 0.0, 0.0)
    assert got[3] == (0, 0.0, 0.0, 0.0)
    assert got[4] == (1, 0.0, 1.0, 0.5)


def test_repetition_stats_oracle_parity(documents):
    """Spark vs the DuckDB twin on the real documents table."""
    import duckdb

    from centrality_gpu_spark.operators.text import (
        repetition_stats,
        repetition_stats_sql,
    )

    spark_pdf = (
        repetition_stats(documents).orderBy("doc_id").toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_MED}/documents.parquet')"
    )
    oracle_pdf = con.execute(repetition_stats_sql()).df()
    assert len(spark_pdf) == len(oracle_pdf)
    for col in ("n_lines", "dup_line_frac", "top_bigram_frac", "dup_trigram_frac"):
        assert (
            abs(spark_pdf[col].to_numpy() - oracle_pdf[col].to_numpy()) < 1e-9
        ).all(), col


def test_quality_and_langid(near_dups):
    q = {r.doc_id: r.quality for r in quality_score(near_dups).collect()}
    assert q[1] > q[5]  # english prose beats junk
    l = {r.doc_id: r.lang_pred for r in language_id(near_dups).collect()}
    assert l[1] == "en" and l[4] == "de" and l[5] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Some  Text here", "en", "s", 0), (2, "some text HERE", "en", "s", 0),
         (3, "different", "en", "s", 0)],
        DOC_SCHEMA,
    )
    fp = {r.doc_id: r.fp for r in fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_exact_duplicates(near_dups):
    groups = exact_duplicates(near_dups).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]


def test_ngram_jaccard_exact(near_dups):
    """Spark inverted-index jaccard vs a direct python computation."""
    sh = {r.doc_id: set(r.shingles) for r in with_shingles(near_dups).collect()}
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in ngram_jaccard_pairs(near_dups, threshold=0.0).collect()}
    for (a, b), j in got.items():
        exp = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        assert j == pytest.approx(exp, abs=1e-6)
    assert got[(1, 2)] == 1.0
    assert 0.3 < got[(1, 3)] < 1.0


def test_ngram_jaccard_prefix_equals_index(documents):
    """PPJoin prefix filtering is EXACT: identical pair set + values as
    the full inverted-index join on the real sf0.01 documents table."""
    got_prefix = {(r.doc_a, r.doc_b): r.jaccard
                  for r in ngram_jaccard_pairs(
                      documents, threshold=0.4, method="prefix").collect()}
    got_index = {(r.doc_a, r.doc_b): r.jaccard
                 for r in ngram_jaccard_pairs(
                     documents, threshold=0.4, method="index").collect()}
    assert got_prefix == got_index
    assert len(got_prefix) > 0


def test_minhash_finds_near_dups(near_dups):
    # identical docs share every band in any hash family
    for mode in ("md5", "xx64"):
        cand = {(r.doc_a, r.doc_b)
                for r in minhash_candidates(near_dups, hash_mode=mode).collect()}
        assert (1, 2) in cand, mode
        verified = {(r.doc_a, r.doc_b): r.jaccard
                    for r in minhash_dedup(
                        near_dups, threshold=0.5, hash_mode=mode).collect()}
        assert verified[(1, 2)] == 1.0, mode
    # the mid-similarity pair (j≈0.5) is a probabilistic catch — its
    # recall is covered in aggregate by test_minhash_recall_documents


def test_minhash_recall_documents(documents):
    """On the real sf0.01 docs: every exact-jaccard pair ≥0.8 must be
    found by MinHash banding (high-sim pairs ⇒ band collision w.h.p.)."""
    truth = {(r.doc_a, r.doc_b) for r in
             ngram_jaccard_pairs(documents, threshold=0.8).collect()}
    cand = {(r.doc_a, r.doc_b) for r in minhash_candidates(documents).collect()}
    missed = truth - cand
    assert len(missed) <= max(1, int(0.05 * len(truth))), (len(missed), len(truth))


def test_simhash_properties(near_dups):
    sh = {r.doc_id: r.simhash for r in simhash(near_dups).collect()}
    assert sh[1] == sh[2]
    ham13 = bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    ham15 = bin((sh[1] ^ sh[5]) & ((1 << 64) - 1)).count("1")
    assert ham13 < ham15
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in simhash_near_duplicates(near_dups, max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0


def test_dedup_clusters_chain(spark):
    """A chain a~b~c must collapse to ONE cluster keeping exactly one
    doc, even though (a, c) may never pair directly; singletons keep."""
    from centrality_gpu_spark.operators.dedup import dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (10, base, "en", "s", 0),
        (11, base.replace("kappa", "lambda"), "en", "s", 0),   # ~10
        (12, base.replace("alpha", "omega").replace("kappa", "lambda"),
         "en", "s", 0),                                        # ~11
        (20, "an entirely different document about distributed systems",
         "en", "s", 0),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    res = {r.doc_id: (r.cluster, r.keep) for r in
           dedup_clusters(docs, threshold=0.5).collect()}
    assert res[10] == (10, 1)
    assert res[11] == (10, 0)
    assert res[12] == (10, 0)
    assert res[20] == (20, 1)


def test_dedup_clusters_matches_oracle(documents):
    """Full pipeline vs the DuckDB recursive-closure twin on real docs."""
    import duckdb

    from centrality_gpu_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_oracle_sql,
    )

    res = dedup_clusters(documents).toPandas().sort_values("doc_id")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_MED}/documents.parquet'"
    )
    ora = con.execute(dedup_clusters_oracle_sql()).df()
    merged = res.merge(ora, on="doc_id", suffixes=("_s", "_o"))
    assert len(merged) == len(res) == len(ora)
    assert (merged.cluster_s != merged.cluster_o).sum() == 0
    assert (merged.keep_s != merged.keep_o).sum() == 0


def test_pii_scrub_redacts_and_counts(spark):
    """Each PII kind is redacted with its token; counts are per-kind
    on the original text; clean docs pass through untouched."""
    from centrality_gpu_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail jo.doe+x@site.org or 10.1.2.3 ssn 123-45-6789 call +1 555-000-1234"),
            (2, "no pii here, just v1.2 and 42-17"),
            (3, "two mails a@b.io c@d.net one ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[1].clean_text == "mail <EMAIL> or <IP> ssn <SSN> call <PHONE>"
    assert (got[1].n_email, got[1].n_ssn, got[1].n_phone, got[1].n_ipv4) == (1, 1, 1, 1)
    assert got[2].clean_text == "no pii here, just v1.2 and 42-17"
    assert (got[2].n_email, got[2].n_ssn, got[2].n_phone, got[2].n_ipv4) == (0, 0, 0, 0)
    assert got[3].clean_text == "two mails <EMAIL> <EMAIL> one ip <IP>"
    assert got[3].n_email == 2 and got[3].n_ipv4 == 1


def test_pii_scrub_oracle_parity(documents):
    """Spark vs the DuckDB twin on the real documents table."""
    import duckdb

    from centrality_gpu_spark.operators.text import pii_scrub, pii_scrub_sql

    spark_pdf = pii_scrub(documents).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_MED}/documents.parquet')"
    )
    oracle_pdf = con.execute(pii_scrub_sql()).df()
    assert spark_pdf.reset_index(drop=True).equals(oracle_pdf.reset_index(drop=True))


def test_char_entropy_closed_forms(spark):
    from centrality_gpu_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),          # one symbol: H = 0
            (2, "abab"),          # two equiprobable: H = 1
            (3, "abcd"),          # four equiprobable: H = 2
            (4, ""),              # empty: H = 0, n = 0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars, r.entropy) for r in char_entropy(docs).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (4, 1.0)
    assert got[3] == (4, 2.0)
    assert got[4] == (0, 0.0)


def test_quality_filter_reasons_fixed_order(spark):
    from centrality_gpu_spark.operators.text import quality_filter

    docs = spark.createDataFrame(
        [
            # German stopwords -> lang fires first even though short
            (1, "der die das und ist ein zu den von mit"),
            # English but 3 tokens -> too_short
            (2, "the cat sat"),
            # English, long enough, low punct, line dupes -> repetitive
            (3, " ".join(["the quick brown fox is on a log with zest"] * 2)
                + "\nsame line\nsame line\nsame line\nsame line"),
            # healthy English prose -> kept
            (4, "the quick brown fox jumps over a lazy dog and the band "
                "plays on with a tune for everyone in the warm evening"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.keep, r.reason) for r in quality_filter(docs).collect()}
    assert got[1] == (False, "lang")
    assert got[2] == (False, "too_short")
    assert got[3][1] in ("repetitive", "low_quality")
    assert got[3][0] is False
    assert got[4] == (True, "kept")


def test_winnow_guarantee_and_density(spark):
    """Winnowing's match guarantee: two docs sharing a substring of
    length >= k + window - 1 share at least one fingerprint; unrelated
    docs (different alphabets) share none."""
    from centrality_gpu_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"AAAA {shared} BBBB", "en", "s", 0),
        (2, f"cccc dddd {shared} eeee", "en", "s", 0),
        (3, "zzzz yyyy xxxx wwww vvvv uuuu tttt", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fps = {}
    for r in winnow_fingerprints(docs, k=8, window=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2]           # shared substring -> shared fp
    assert not (fps[1] & fps[3])     # disjoint alphabets -> no overlap
    assert not (fps[2] & fps[3])
    # density: winnowing selects ~2/(w+1) of gram positions, far fewer
    # than all grams
    n_grams_1 = len(rows[0][1]) - 8 + 1
    assert len(fps[1]) < n_grams_1 / 2
