"""TF-IDF / BM25 lexical relevance: python goldens + DuckDB twins."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from centrality_gpu_spark.operators.relevance import (
    BM25_B,
    BM25_K1,
    bm25_oracle_sql,
    bm25_topk,
    tfidf_oracle_sql,
    tfidf_topk_terms,
)

DOCS = [
    (0, "spark joins the big table with a broadcast join"),
    (1, "vector search over spark dataframes"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "join join join spark spark vector"),
    (4, "unrelated text about nothing in particular"),
    (5, ""),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(query, k1=BM25_K1, b=BM25_B):
    toks = {d: re.findall(r"[a-z0-9_]+", t.lower()) for d, t in DOCS}
    tf = {d: {} for d, _ in DOCS}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    n = len(DOCS)
    df = {}
    for d in tf:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1
    dls = {d: len(ts) for d, ts in toks.items()}
    nonempty = [d for d in dls if dls[d] > 0]
    avgdl = sum(dls[d] for d in nonempty) / len(nonempty)
    out = {}
    for d in tf:
        s, hits = 0.0, 0
        for t in sorted(set(query)):
            if t not in tf[d]:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfv = tf[d][t]
            s += idf * (tfv * (k1 + 1)) / (
                tfv + k1 * (1 - b + b * dls[d] / avgdl)
            )
        if hits:
            out[d] = (hits, s)
    return out


def test_bm25_matches_python_golden(spark):
    got = bm25_topk(_docs_df(spark), ["spark", "join", "vector"], k=10).toPandas()
    want = _py_bm25(["spark", "join", "vector"])
    assert set(got.doc_id) == set(want)
    for _, r in got.iterrows():
        hits, score = want[r.doc_id]
        assert r.n_hits == hits
        assert r.score == pytest.approx(score, abs=1e-5)
    # doc 3 stuffs the query terms → must rank first
    assert got.sort_values("score", ascending=False).doc_id.iloc[0] == 3


def test_bm25_oracle_matches(spark):
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        DOCS, columns=["doc_id", "text"]
    ))
    got = (
        bm25_topk(_docs_df(spark), ["spark", "join"], k=10)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        con.execute(bm25_oracle_sql(["spark", "join"], k=10))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_hits) == list(want.n_hits)
    assert list(got.score) == list(want.score)  # bit-identical doubles


def test_tfidf_oracle_matches(spark):
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        DOCS, columns=["doc_id", "text"]
    ))
    got = (
        tfidf_topk_terms(_docs_df(spark), k=3)
        .toPandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    want = (
        con.execute(tfidf_oracle_sql(k=3))
        .df().sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.term) == list(want.term)
    assert list(got.tfidf) == list(want.tfidf)


def test_tfidf_python_golden(spark):
    res = tfidf_topk_terms(_docs_df(spark), k=2).toPandas()
    # recompute the smooth tf-idf in plain python for doc 2
    toks = {d: re.findall(r"[a-z0-9_]+", t.lower()) for d, t in DOCS}
    n = len(DOCS)
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    d2 = toks[2]
    scores = {
        t: d2.count(t) * (math.log((1.0 + n) / (1.0 + df[t])) + 1.0)
        for t in set(d2)
    }
    want = sorted(scores, key=lambda t: (-scores[t], t))[:2]
    got = res[res.doc_id == 2].sort_values("tfidf", ascending=False)
    assert list(got.term) == want


def test_bm25_empty_query_result(spark):
    got = bm25_topk(_docs_df(spark), ["zzzqqq"], k=5).toPandas()
    assert len(got) == 0
