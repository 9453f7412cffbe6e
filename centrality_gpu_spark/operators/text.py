"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface the round instructions require as
first-class components. All expressions are built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen); every
formula is deliberately SQL-replicable so the DuckDB oracle can verify
it bit-for-bit.

- token counting: whitespace tokens + a BPE-ish regex token count
- quality scoring: length / punctuation / stopword-ratio heuristics
- language ID: stopword-hit heuristic over a fixed per-language list
- fingerprinting: polynomial rolling hash of normalized text
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed stopword lists — tiny on purpose: the *plumbing* is the point,
# and both Spark and DuckDB must reproduce identical hits
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit")

# BPE-ish token regex: runs of word chars OR single non-space symbols
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars_text)."""
    t = F.col("text")
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0))
    return documents.select(
        "doc_id",
        F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(ws).cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        F.length(t).cast("long").alias("n_chars_text"),
    )


def _stopword_hits(col, words: tuple[str, ...]):
    """Count how many of the fixed stopwords occur as whole words."""
    lower = F.lower(col)
    hits = [
        F.when(lower.rlike(r"\b" + w + r"\b"), F.lit(1)).otherwise(F.lit(0))
        for w in words
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, len_score, punct_ratio, stopword_ratio, quality)

    quality ∈ [0,1]: mean of (bounded length score, 1 - punct ratio,
    min(1, stopword hits / 5)). A heuristic filter stage, not a model —
    what matters is that it runs JVM-side over billions of docs.
    """
    t = F.col("text")
    n = F.length(t).cast("double")
    n_punct = (n - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double")
    len_score = F.least(n / F.lit(1000.0), F.lit(1.0))
    punct_ratio = F.when(n > 0, n_punct / n).otherwise(F.lit(0.0))
    sw = _stopword_hits(t, STOPWORDS_EN).cast("double")
    sw_ratio = F.least(sw / F.lit(5.0), F.lit(1.0))
    quality = (len_score + (F.lit(1.0) - punct_ratio) + sw_ratio) / F.lit(3.0)
    return documents.select(
        "doc_id",
        F.round(len_score, 6).alias("len_score"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred) — argmax of per-language stopword hits;
    'und' (undetermined) when no list scores > 0."""
    en = _stopword_hits(F.col("text"), STOPWORDS_EN)
    de = _stopword_hits(F.col("text"), STOPWORDS_DE)
    pred = (
        F.when((en == 0) & (de == 0), F.lit("und"))
        .when(en >= de, F.lit("en"))
        .otherwise(F.lit("de"))
    )
    return documents.select("doc_id", pred.alias("lang_pred"))


# ------------------------------------------------------- DuckDB twins
# (kept beside the Spark expressions so formulas stay in lockstep)

def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}'))::BIGINT AS n_bpe_tokens,
       length(text)::BIGINT AS n_chars_text
FROM documents ORDER BY doc_id
""".strip()


def _sw_hits_sql(words: tuple[str, ...]) -> str:
    terms = " + ".join(
        f"(CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END)"
        for w in words
    )
    return f"({terms})"


def quality_score_sql() -> str:
    en = _sw_hits_sql(STOPWORDS_EN)
    return f"""
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST({en} AS DOUBLE) AS sw
  FROM documents
),
s AS (
  SELECT doc_id,
         LEAST(n / 1000.0, 1.0) AS len_score,
         CASE WHEN n > 0 THEN n_punct / n ELSE 0.0 END AS punct_ratio,
         LEAST(sw / 5.0, 1.0) AS stopword_ratio
  FROM q
)
SELECT doc_id,
       ROUND(len_score, 6) AS len_score,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stopword_ratio, 6) AS stopword_ratio,
       ROUND((len_score + (1.0 - punct_ratio) + stopword_ratio) / 3.0, 6) AS quality
FROM s ORDER BY doc_id
""".strip()


def language_id_sql() -> str:
    en = _sw_hits_sql(STOPWORDS_EN)
    de = _sw_hits_sql(STOPWORDS_DE)
    return f"""
SELECT doc_id,
       CASE WHEN {en} = 0 AND {de} = 0 THEN 'und'
            WHEN {en} >= {de} THEN 'en' ELSE 'de' END AS lang_pred
FROM documents ORDER BY doc_id
""".strip()


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp) — 64-bit content fingerprint of normalized text
    (lowercased, whitespace collapsed) via xxhash64. Normalization means
    near-identical whitespace/case variants collide — the cheap first
    pass before MinHash."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return documents.select("doc_id", F.xxhash64(norm).alias("fp"))
