"""Lexical relevance over the ``documents`` table: TF-IDF term weights
and BM25 ranked retrieval — the standard scoring pass of a text corpus
pipeline (quality filtering by keyword profile, lexical dedup triage,
search-index bootstrap).

Everything is built-in DataFrame ops (split → explode → groupBy), so
the whole pipeline is Catalyst/Tungsten end to end: term frequencies
shuffle O(total tokens) once, the document-frequency table is tiny
(vocabulary-sized) and broadcast into the scoring join, and top-k uses
a per-doc / per-query window — no Python anywhere.

Determinism for the driver oracle: tokenization, tf, df, and both
scoring formulas are written with the identical expression shape in
DuckDB (``tfidf_oracle_sql`` / ``bm25_oracle_sql``); the only libm
call is ``ln``, which the adamic-adar oracle already established agrees
across both engines on this platform (round(6) guards the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# lowercase word tokens; identical regex in DuckDB
WORD_REGEX = "[a-z0-9_]+"

BM25_K1 = 1.2
BM25_B = 0.75


def _term_freqs(documents: DataFrame) -> DataFrame:
    """(doc_id, term, tf) + per-doc length dl via a second aggregate."""
    toks = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_REGEX), 0)
        ).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def tfidf_topk_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-``k`` terms by smooth TF-IDF
    (idf = ln((1+N)/(1+df)) + 1, the sklearn smoothing). Returns
    (doc_id, term, tf, tfidf) with ties broken by term — fully
    deterministic."""
    tf = _term_freqs(documents)
    n_docs = documents.select("doc_id").distinct().count()
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = (
        F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    )
    scored = tf.join(F.broadcast(df_t), "term").select(
        "doc_id", "term", "tf", (F.col("tf") * idf).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "term", "tf", F.round("tfidf", 6).alias("tfidf"))
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson-Spärck Jones idf = ln(1 + (N - df + 0.5)/(df + 0.5))).
    Returns (doc_id, n_hits, score); ties break to the smaller doc_id.

    Scale shape: only documents containing ≥1 query term enter the
    scoring join (the tf table is filtered by the broadcast query-term
    list before anything else), so the cost is O(postings of the query
    terms), not O(corpus)."""
    tf = _term_freqs(documents)
    n_docs = documents.select("doc_id").distinct().count()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # exact integer sum / count → one deterministic division (both
    # engines compute the identical avgdl double)
    tot = dl.agg(
        F.sum("dl").alias("s"), F.count("*").alias("c")
    ).collect()[0]
    avgdl = float(tot["s"]) / float(tot["c"])
    qt = documents.sparkSession.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], "term string"
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    hits = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    contrib = idf * tf_part
    # one conditional sum PER QUERY TERM, folded in sorted-term order:
    # inside each sum all other rows contribute literal 0.0 (exact), so
    # the result is order-independent, and the cross-term fold is a
    # fixed-shape expression — bit-identical in Spark and DuckDB, unlike
    # a float SUM over a group whose addend order the engine picks
    terms_sorted = sorted(set(query_terms))
    per_term = [
        F.sum(F.when(F.col("term") == t, contrib).otherwise(F.lit(0.0)))
        for t in terms_sorted
    ]
    score = per_term[0]
    for c in per_term[1:]:
        score = score + c
    scored = hits.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"),
        score.alias("score"),
    )
    # global top-k as TakeOrdered (orderBy+limit): each partition ships
    # only its best k rows to the driver-side merge, vs the old
    # unpartitioned row_number window that moved every scored doc
    # through one task
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "n_hits", F.round("score", 6).alias("score"))
    )


# ------------------------------------------------------- DuckDB twins

_TF_CTE = f"""
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_REGEX}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term)
""".strip()


def tfidf_oracle_sql(k: int = 5) -> str:
    return f"""
WITH {_TF_CTE},
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * (ln((1.0 + (SELECT n_docs FROM n)) / (1.0 + dft.df)) + 1.0)
           AS tfidf
  FROM tf JOIN dft USING (term)
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, ROUND(tfidf, 6) AS tfidf
FROM ranked WHERE rn <= {k} ORDER BY doc_id, term
""".strip()


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    terms_sorted = sorted(set(query_terms))
    terms = ", ".join(f"('{t}')" for t in terms_sorted)
    contrib = (
        "ln(1.0 + ((SELECT n_docs FROM n) - dft.df + 0.5) / (dft.df + 0.5))"
        f" * (tf.tf * ({k1!r} + 1.0))"
        f" / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl.dl / (SELECT v FROM avgdl)))"
    )
    # per-term conditional sums folded in sorted order — the identical
    # fixed-shape addition the Spark side does (see bm25_topk)
    per_term = " + ".join(
        f"SUM(CASE WHEN term = '{t}' THEN {contrib} ELSE 0.0 END)"
        for t in terms_sorted
    )
    return f"""
WITH {_TF_CTE},
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v FROM dl),
qt(term) AS (SELECT * FROM (VALUES {terms})),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, COUNT(*) AS n_hits,
         {per_term} AS score
  FROM tf JOIN qt USING (term) JOIN dft USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id, n_hits, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT doc_id, n_hits, ROUND(score, 6) AS score
FROM ranked WHERE rn <= {k} ORDER BY doc_id
""".strip()
