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


def repetition_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, top_bigram_frac, dup_trigram_frac)

    Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    documents dominated by duplicated lines or a single repeated n-gram
    are low-quality training data. All ratios in [0,1], rounded to 6.

    - dup_line_frac: fraction of non-empty lines that are duplicates;
    - top_bigram_frac: occurrences of the most common word 2-gram over
      all 2-grams (0 when the doc has < 2 tokens);
    - dup_trigram_frac: fraction of word 3-grams that are duplicates.

    Line/trigram ratios are pure array expressions (JVM, zero shuffle);
    the bigram mode needs one explode + two-level groupBy on
    (doc_id, gram) — hash-partitioned on the doc, scale-safe.
    """
    t = F.col("text")
    lines_expr = F.filter(F.split(t, "\n"), lambda x: x != F.lit(""))
    lines = F.col("lines")
    n_lines = F.size(lines)
    n_dup_lines = n_lines - F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0, n_dup_lines.cast("double") / n_lines
    ).otherwise(F.lit(0.0))

    words = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != F.lit(""))
    w = F.col("w")

    def grams(k: int):
        # element_at is 1-based; sequence guarded against size < k
        # (Spark's sequence(1, 0) counts *down*, so the guard is load-bearing)
        idx = F.sequence(F.lit(1), F.size(w) - F.lit(k - 1))
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(w, i + j) for j in range(k)]
        )
        return F.when(F.size(w) >= k, F.transform(idx, gram)).otherwise(
            F.array().cast("array<string>")
        )

    base = documents.select(
        "doc_id", words.alias("w"), lines_expr.alias("lines")
    ).select(
        "doc_id",
        F.size("lines").alias("n_lines"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        grams(2).alias("bg"),
        grams(3).alias("tg"),
    )
    n_tg = F.size(F.col("tg"))
    dup_tg = F.when(
        n_tg > 0,
        (n_tg - F.size(F.array_distinct(F.col("tg")))).cast("double") / n_tg,
    ).otherwise(F.lit(0.0))

    top_bg = (
        base.select("doc_id", F.explode("bg").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"), F.sum("c").alias("tot"))
    )
    return (
        base.join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("long").alias("n_lines"),
            "dup_line_frac",
            F.round(
                F.coalesce(
                    F.col("top_cnt").cast("double") / F.col("tot"), F.lit(0.0)
                ),
                6,
            ).alias("top_bigram_frac"),
            F.round(dup_tg, 6).alias("dup_trigram_frac"),
        )
    )


def repetition_stats_sql() -> str:
    """DuckDB twin of ``repetition_stats`` — formulas kept term-for-term
    (same filter-empty, same division order) so ROUND(.,6) hash-matches."""
    return r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS w
  FROM documents
),
arrs AS (
  SELECT doc_id, lines,
         CASE WHEN len(w) >= 2
              THEN list_transform(generate_series(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS bg,
         CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w) - 2),
                                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
              ELSE CAST([] AS VARCHAR[]) END AS tg
  FROM base
),
bgx AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS g FROM arrs)
  GROUP BY doc_id, g
),
bga AS (SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS tot FROM bgx GROUP BY doc_id)
SELECT a.doc_id,
       CAST(len(a.lines) AS BIGINT) AS n_lines,
       ROUND(CASE WHEN len(a.lines) > 0
             THEN CAST(len(a.lines) - len(list_distinct(a.lines)) AS DOUBLE)
                  / len(a.lines)
             ELSE 0.0 END, 6) AS dup_line_frac,
       ROUND(COALESCE(CAST(b.top_cnt AS DOUBLE) / b.tot, 0.0), 6)
           AS top_bigram_frac,
       ROUND(CASE WHEN len(a.tg) > 0
             THEN CAST(len(a.tg) - len(list_distinct(a.tg)) AS DOUBLE)
                  / len(a.tg)
             ELSE 0.0 END, 6) AS dup_trigram_frac
FROM arrs a LEFT JOIN bga b USING (doc_id) ORDER BY a.doc_id
""".strip()


def char_entropy(documents: DataFrame) -> DataFrame:
    """(doc_id, n_chars, entropy) — Shannon entropy (bits/char) of the
    document's character distribution, from counts:
    ``H = log2(n) − (Σ_c cnt_c·log2 cnt_c)/n``. A near-zero entropy
    flags degenerate filler (one repeated char/page); an unusually high
    one flags binary-ish noise — the standard cheap perplexity proxy.
    One explode + two groupBys, all JVM-side; the per-char count table
    is bounded by alphabet size per doc."""
    chars = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).where(F.col("ch") != "")
    cnts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    per_doc = cnts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("clogc"),
    )
    ent = F.log2(F.col("n")) - F.col("clogc") / F.col("n")
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_chars"),
            F.round(F.coalesce(ent, F.lit(0.0)), 6).alias("entropy"),
        )
    )


def char_entropy_sql() -> str:
    return """
WITH chars AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(text, '')) AS ch
  FROM documents
),
cnts AS (
  SELECT doc_id, ch, COUNT(*) AS cnt FROM chars
  WHERE ch <> '' GROUP BY doc_id, ch
),
per_doc AS (
  SELECT doc_id, SUM(cnt) AS n, SUM(cnt * log2(cnt)) AS clogc
  FROM cnts GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n_chars,
       ROUND(COALESCE(log2(p.n) - p.clogc / p.n, 0.0), 6) AS entropy
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
""".strip()


QF_MIN_QUALITY = 0.5
QF_LANGS = ("en",)
QF_MIN_TOKENS = 5
QF_MAX_DUP_LINE_FRAC = 0.3


def quality_filter(
    documents: DataFrame,
    min_quality: float = QF_MIN_QUALITY,
    langs: tuple[str, ...] = QF_LANGS,
    min_tokens: int = QF_MIN_TOKENS,
    max_dup_line_frac: float = QF_MAX_DUP_LINE_FRAC,
) -> DataFrame:
    """(doc_id, keep, reason) — the curation gate that composes the
    signal operators into one decision per document. Rules apply in a
    FIXED order (lang → too_short → low_quality → repetitive) and the
    first failing rule names the drop ``reason`` ('kept' otherwise) —
    per-reason counts are the drop-accounting a pipeline reports.
    Four signal scans joined on doc_id; each signal is the
    already-oracle-checked operator, so the filter is a pure
    composition."""
    q = quality_score(documents).select("doc_id", "quality")
    lang = language_id(documents)
    tok = token_stats(documents).select("doc_id", "n_ws_tokens")
    rep = repetition_stats(documents).select("doc_id", "dup_line_frac")
    j = (
        documents.select("doc_id")
        .join(lang, "doc_id")
        .join(tok, "doc_id")
        .join(q, "doc_id")
        .join(rep, "doc_id")
    )
    reason = (
        F.when(~F.col("lang_pred").isin(*langs), F.lit("lang"))
        .when(F.col("n_ws_tokens") < F.lit(min_tokens), F.lit("too_short"))
        .when(F.col("quality") < F.lit(min_quality), F.lit("low_quality"))
        .when(
            F.col("dup_line_frac") > F.lit(max_dup_line_frac),
            F.lit("repetitive"),
        )
        .otherwise(F.lit("kept"))
    )
    return j.select(
        "doc_id",
        (reason == F.lit("kept")).alias("keep"),
        reason.alias("reason"),
    )


def quality_filter_sql(
    min_quality: float = QF_MIN_QUALITY,
    langs: tuple[str, ...] = QF_LANGS,
    min_tokens: int = QF_MIN_TOKENS,
    max_dup_line_frac: float = QF_MAX_DUP_LINE_FRAC,
) -> str:
    """DuckDB twin of ``quality_filter`` — composes the signal twins as
    CTEs and applies the same fixed-order CASE."""
    lang_list = ", ".join(f"'{x}'" for x in langs)
    return f"""
WITH qs AS ({quality_score_sql()}),
li AS ({language_id_sql()}),
ts AS ({token_stats_sql()}),
rs AS ({repetition_stats_sql()}),
j AS (
  SELECT d.doc_id, li.lang_pred, ts.n_ws_tokens, qs.quality,
         rs.dup_line_frac
  FROM documents d
  JOIN li ON li.doc_id = d.doc_id
  JOIN ts ON ts.doc_id = d.doc_id
  JOIN qs ON qs.doc_id = d.doc_id
  JOIN rs ON rs.doc_id = d.doc_id
)
SELECT doc_id,
       (CASE WHEN lang_pred NOT IN ({lang_list}) THEN 'lang'
             WHEN n_ws_tokens < {min_tokens} THEN 'too_short'
             WHEN quality < {min_quality} THEN 'low_quality'
             WHEN dup_line_frac > {max_dup_line_frac} THEN 'repetitive'
             ELSE 'kept' END) = 'kept' AS keep,
       CASE WHEN lang_pred NOT IN ({lang_list}) THEN 'lang'
            WHEN n_ws_tokens < {min_tokens} THEN 'too_short'
            WHEN quality < {min_quality} THEN 'low_quality'
            WHEN dup_line_frac > {max_dup_line_frac} THEN 'repetitive'
            ELSE 'kept' END AS reason
FROM j ORDER BY doc_id
""".strip()


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp) — 64-bit content fingerprint of normalized text
    (lowercased, whitespace collapsed) via xxhash64. Normalization means
    near-identical whitespace/case variants collide — the cheap first
    pass before MinHash."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return documents.select("doc_id", F.xxhash64(norm).alias("fp"))


def winnow_fingerprints(
    documents: DataFrame, k: int = 8, window: int = 4
) -> DataFrame:
    """(doc_id, fp) — MOSS-style winnowing fingerprints (Schleimer,
    Wilkerson, Aiken SIGMOD'03): hash every character k-gram of the
    normalized text (the rolling-hash fingerprint family — here the
    engine-standard md5→int64 per gram, deterministic in both engines),
    then keep the MINIMUM hash of each sliding window of ``window``
    consecutive gram hashes, deduplicated.

    Winnowing's guarantee: any substring match of length ≥ k+window−1
    shares at least one selected fingerprint — the local-fingerprint
    property that makes shared-fp joins a substring-plagiarism /
    near-dup detector with bounded density (≈ 2/(window+1) of grams
    selected). Pure array expressions (transform over sequence +
    array_min over slice) — no UDF, no explode until the final
    distinct.
    """
    from pyspark.sql import Window as W

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    n = F.length(norm)
    gram_hash = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.substring(norm, i, k)), 1, 15), 16, 10
    ).cast("long")
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        gram_hash,
    )
    # row-based window min, NOT array slice-of-expression: a
    # slice(transform(...), j, w) per window re-evaluates the whole
    # gram-hash transform per window (no CSE across lambda scopes) —
    # O(n²) md5 calls per doc. posexplode evaluates the transform once,
    # then the per-doc rows window is O(n·w) and shuffle-partitioned by
    # doc_id, the natural key.
    grams = documents.select(
        "doc_id", F.posexplode(hashes).alias("pos", "h")
    )
    per_doc = W.partitionBy("doc_id")
    fwd = per_doc.orderBy("pos").rowsBetween(0, window - 1)
    g = grams.withColumn("nh", F.count("*").over(per_doc)).withColumn(
        "wmin", F.min("h").over(fwd)
    )
    # valid window starts: pos ≤ nh − window; a doc with fewer than
    # `window` grams keeps its single all-grams window (pos = 0)
    starts = g.where(
        (F.col("pos") <= F.col("nh") - window)
        | ((F.col("nh") < window) & (F.col("pos") == 0))
    )
    return starts.select("doc_id", F.col("wmin").alias("fp")).distinct()


def winnow_fingerprints_sql(k: int = 8, window: int = 4) -> str:
    """DuckDB twin of ``winnow_fingerprints``."""
    return f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
hashes AS (
  SELECT doc_id,
         [CAST(('0x' || substr(md5(substr(t, i, {k})), 1, 15)) AS BIGINT)
          FOR i IN range(1, GREATEST(length(t) - {k - 1}, 1) + 1)] AS h
  FROM norm
),
mins AS (
  SELECT doc_id,
         list_distinct(
           [list_min(h[j:j+{window - 1}])
            FOR j IN range(1, GREATEST(len(h) - {window - 1}, 1) + 1)]
         ) AS fps
  FROM hashes
)
SELECT doc_id, unnest(fps) AS fp FROM mins ORDER BY doc_id, fp
""".strip()


def winnow_matches(
    documents: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_docs: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, n_shared) — document pairs sharing ≥ min_shared
    winnowed fingerprints (doc_a < doc_b): the substring-overlap
    detector winnowing exists for (plagiarism / near-dup text reuse).

    ``max_fp_docs`` drops fingerprints present in more docs than the
    cap before pairing — the hot-shingle control every inverted-index
    join here applies (a boilerplate fingerprint in 10⁶ docs would emit
    C(10⁶,2) pairs); the cap is declared semantics, disclosed like
    ``ngram_jaccard_pairs``.
    """
    fps = winnow_fingerprints(documents, k, window)
    if max_fp_docs is not None:
        df_counts = fps.groupBy("fp").agg(F.count("*").alias("nd"))
        fps = fps.join(
            df_counts.where(F.col("nd") <= max_fp_docs).select("fp"), "fp"
        )
    a = fps.select("fp", F.col("doc_id").alias("doc_a"))
    b = fps.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_matches_sql(
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_docs: int | None = 1000,
) -> str:
    """DuckDB twin of ``winnow_matches``."""
    cap = (
        f"""fpc AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {max_fp_docs}
),
kept AS (SELECT f.* FROM fps f JOIN fpc USING (fp)),"""
        if max_fp_docs is not None
        else "kept AS (SELECT * FROM fps),"
    )
    return f"""
WITH fps AS ({winnow_fingerprints_sql(k, window)}),
{cap}
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
FROM pairs WHERE n_shared >= {min_shared}
ORDER BY doc_a, doc_b
""".strip()


# --------------------------------------------------------------- PII

# Redaction patterns restricted to the Java-regex ∩ RE2 dialect so the
# same pattern strings run in both Spark and DuckDB. Order matters and
# is part of the contract: emails first (their domains would otherwise
# be chewed up by the IP pattern), then SSN-style ids (so the phone
# pattern can't nibble their digit runs), then phones, then IPv4 last.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d{1,2}[- ]\d{3}[- ]?\d{3,4}[- ]?\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(documents: DataFrame) -> DataFrame:
    """(doc_id, clean_text, n_email, n_ssn, n_phone, n_ipv4) — redact
    PII-shaped spans and report per-kind match counts (counted on the
    ORIGINAL text, independently per pattern; replacement is the
    sequential pipeline above).

    Training-data pipelines scrub before tokenization; everything here
    is built-in regexp expressions (whole-stage codegen, no Python), so
    at 100 TB this is a pure map stage — no shuffle, predicate/column
    pruning intact underneath.
    """
    t = F.col("text")
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = t
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return documents.select("doc_id", clean.alias("clean_text"), *counts)


def pii_scrub_sql(source: str = "documents") -> str:
    """DuckDB twin of ``pii_scrub`` — same patterns, same replacement
    order ('g' flag ≡ Spark's replace-all default)."""
    clean = "text"
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    return f"""
SELECT doc_id,
       {clean} AS clean_text,
       {counts}
FROM {source} ORDER BY doc_id
""".strip()
