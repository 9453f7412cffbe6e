"""Corpus-level training-data pipeline operators.

Three ops a 100 TB pretraining pipeline runs between ingestion and
tokenization (all public techniques; cf. Rae et al. 2021, Brown et al.
2020 appendix C on decontamination):

- boilerplate line removal: lines repeated across >= min_docs distinct
  documents (nav bars, cookie banners, license headers) are stripped
  from every document;
- n-gram decontamination: training documents sharing a word n-gram
  with a held-out evaluation split are flagged so they can be dropped;
- exact stratified sampling: a deterministic per-stratum top-fraction
  sample (md5-ranked, no RNG) for building eval slices and ablations.

Everything is built-in ``pyspark.sql.functions`` (JVM, codegen) and
each op has a term-for-term DuckDB twin for the driver's hash gate.

Scale notes (100 TB): the line/gram shuffles here group by the raw
string so the DuckDB twin can reproduce them bit-for-bit; at petabyte
scale you group by ``xxhash64(line)`` instead to shuffle 8-byte keys
(collisions only ever *merge* boilerplate candidates, never lose one).
The frequent-line and eval-gram sets are tiny relative to the corpus
and are broadcast; the per-document reassembly groups by ``doc_id``,
the natural partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lines(documents: DataFrame) -> DataFrame:
    """(doc_id, pos, line) — non-empty lines with original position."""
    return (
        documents.select(
            "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
        )
        .where(F.col("line") != "")
    )


def boilerplate_lines(documents: DataFrame, min_docs: int = 2) -> DataFrame:
    """(line, n_docs) — non-empty lines occurring in >= min_docs
    distinct documents, i.e. the boilerplate candidate set.

    One explode + one groupBy(line) with map-side partial aggregation;
    the result is orders of magnitude smaller than the corpus.
    """
    return (
        _lines(documents)
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(documents: DataFrame, min_docs: int = 2) -> DataFrame:
    """(doc_id, text_clean, n_lines_removed) — every document with its
    boilerplate lines (per ``boilerplate_lines``) removed.

    Cleaned text = the remaining non-empty lines joined by ``\\n`` in
    original order (empty lines are dropped by definition — they carry
    no content and keeping them would make "line removed" ambiguous).
    Documents that lose every line stay in the output with
    ``text_clean = ''``. The frequent-line set is broadcast; the
    reassembly is one groupBy(doc_id) with an array_sort on (pos, line)
    structs — no window, no per-row Python.
    """
    lines = _lines(documents)
    frequent = boilerplate_lines(documents, min_docs=min_docs).select("line")
    kept = lines.join(F.broadcast(frequent), "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    n_orig = lines.groupBy("doc_id").agg(F.count("*").alias("n_orig"))
    return (
        documents.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .join(n_orig, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (
                F.coalesce("n_orig", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).cast("long").alias("n_lines_removed"),
        )
    )


def strip_boilerplate_sql(min_docs: int = 2) -> str:
    """DuckDB twin of ``strip_boilerplate`` (1-based positions — only
    used for ordering, so parity with posexplode's 0-based is exact)."""
    return f"""
WITH splits AS (
  SELECT doc_id, string_split(text, chr(10)) AS l FROM documents
),
lines0 AS (
  SELECT doc_id, l, unnest(generate_series(1, len(l))) AS pos FROM splits
),
lines AS (
  SELECT doc_id, pos, l[pos] AS line FROM lines0 WHERE l[pos] <> ''
),
freq AS (
  SELECT line FROM lines GROUP BY line
  HAVING COUNT(DISTINCT doc_id) >= {min_docs}
),
kept AS (
  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM freq)
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
norig AS (SELECT doc_id, COUNT(*) AS n_orig FROM lines GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(r.text_clean, '') AS text_clean,
       CAST(COALESCE(n.n_orig, 0) - COALESCE(r.n_kept, 0) AS BIGINT)
           AS n_lines_removed
FROM documents d
LEFT JOIN rebuilt r USING (doc_id)
LEFT JOIN norig n USING (doc_id)
ORDER BY d.doc_id
""".strip()


def _word_ngrams(n: int):
    """Array expression: word n-grams of column ``w`` (lowercased,
    whitespace-split, empties dropped — same tokenization as
    ``repetition_stats``)."""
    w = F.col("w")
    idx = F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j) for j in range(n)]
    )
    return F.when(F.size(w) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    documents: DataFrame, eval_source: str, n: int = 3
) -> DataFrame:
    """(doc_id, n_shared_ngrams, contaminated) for every TRAINING doc
    (``source != eval_source``): how many of its distinct word n-grams
    also occur in the held-out ``source == eval_source`` split.

    The eval split's distinct gram set is broadcast (eval sets are
    tiny next to the corpus); the training side is one explode +
    distinct + broadcast-join + groupBy(doc_id) — linear in corpus
    grams, no train×eval pair blowup.
    """
    words = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    based = documents.select(
        "doc_id", "source", words.alias("w")
    ).select("doc_id", "source", _word_ngrams(n).alias("grams"))
    train = based.where(F.col("source") != eval_source)
    eval_grams = (
        based.where(F.col("source") == eval_source)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    hits = (
        train.select("doc_id", F.explode(F.array_distinct("grams")).alias("gram"))
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_ngrams", F.lit(0)).cast("long").alias(
                "n_shared_ngrams"
            ),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngram_contamination_sql(eval_source: str, n: int = 3) -> str:
    """DuckDB twin of ``ngram_contamination``."""
    gram = " || ' ' || ".join(f"w[i + {j}]" for j in range(n))
    return f"""
WITH base AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         CASE WHEN len(w) >= {n}
              THEN list_transform(generate_series(1, len(w) - {n - 1}),
                                  i -> {gram})
              ELSE CAST([] AS VARCHAR[]) END AS g
  FROM base
),
eg AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE source = '{eval_source}'
),
tg AS (
  SELECT DISTINCT doc_id, unnest(g) AS gram FROM grams
  WHERE source <> '{eval_source}'
),
hits AS (
  SELECT doc_id, COUNT(*) AS n_shared FROM tg
  WHERE gram IN (SELECT gram FROM eg) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_ngrams,
       COALESCE(h.n_shared, 0) > 0 AS contaminated
FROM (SELECT DISTINCT doc_id FROM grams WHERE source <> '{eval_source}') t
LEFT JOIN hits h USING (doc_id)
ORDER BY t.doc_id
""".strip()


def stratified_sample(
    documents: DataFrame, fraction: float, seed: str = "corpus"
) -> DataFrame:
    """(doc_id, source) — EXACT deterministic stratified sample: within
    every ``source`` stratum, rank docs by the engine-standard
    md5→int64 uniform (salted with ``seed``) and keep the top
    ``ceil(fraction * stratum_size)``.

    Exact per-stratum counts (unlike hash-threshold sampling, which
    only hits the fraction in expectation) and reproducible across
    runs/engines — no RNG. One window per stratum (the shuffle is on
    ``source``; at scale strata are large and few, so this is the
    cheapest possible partitioning) plus a broadcast of per-stratum
    counts.
    """
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"sample:{seed}:"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy(u.asc(), F.col("doc_id").asc())
    counts = documents.groupBy("source").agg(F.count("*").alias("n_src"))
    return (
        documents.select("doc_id", "source")
        .withColumn("rnk", F.row_number().over(w))
        .join(F.broadcast(counts), "source")
        .where(F.col("rnk") <= F.ceil(F.lit(fraction) * F.col("n_src")))
        .select("doc_id", "source")
    )


def stratified_sample_sql(fraction: float, seed: str = "corpus") -> str:
    """DuckDB twin of ``stratified_sample`` — identical md5 uniforms,
    identical rank/ceil cut."""
    return f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5('sample:{seed}:'
                     || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
                    doc_id ASC
         ) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM documents
)
SELECT doc_id, source FROM ranked
WHERE rnk <= CEIL({fraction} * n_src)
ORDER BY doc_id
""".strip()


# ------------------------------------------------- end-to-end curation

import re as _re


def _retarget(sql: str, new_source: str) -> str:
    """Re-point a DuckDB twin that reads the ``documents`` view at a
    differently-named relation (a CTE holding a filtered survivor set).

    Word-boundary replace of the table name only — the twins never use
    'documents' as a CTE name, alias, or string literal, which
    ``curate_corpus_sql``'s own parity test pins.
    """
    return _re.sub(r"\bdocuments\b", new_source, sql)


def curate_corpus(
    documents: DataFrame,
    eval_source: str,
    fraction: float = 0.5,
    dedup_threshold: float = 0.5,
    contam_n: int = 3,
    seed: str = "corpus",
) -> DataFrame:
    """(doc_id, decision, kept) — the END-TO-END curation pipeline over
    every training document (``source != eval_source``), composing the
    four oracle-checked stages in the canonical order a pretraining
    corpus build runs them (Rae et al. 2021 §A.2; Brown et al. 2020
    §C; Penedo et al. 2023 RefinedWeb fig. 2):

      1. quality gate   (``quality_filter``: lang -> too_short ->
                         low_quality -> repetitive, first rule names it)
      2. near-dedup     (``dedup_clusters``: MinHash LSH pairs -> CC ->
                         min-id representative per cluster)
      3. decontaminate  (``ngram_contamination`` vs the *full* eval
                         split — eval docs are never themselves curated)
      4. subsample      (``stratified_sample``: exact md5-ranked
                         per-source top-fraction)

    ``decision`` is the FIRST stage that dropped the doc
    ('quality:<reason>' | 'duplicate' | 'contaminated' |
    'not_sampled') or 'kept'; ``kept`` is the 0/1 survival flag.
    Per-decision counts (``curation_funnel``) are the drop accounting
    every corpus build reports.

    Scale shape: each stage only ever sees the previous stage's
    survivors (the expensive LSH dedup runs *after* the cheap quality
    gate drops the junk — the standard funnel ordering), every stage is
    the engine's own scale path, and the composition adds only
    broadcast-able doc_id survivor joins between stages.
    """
    from centrality_gpu_spark.operators.dedup import dedup_clusters
    from centrality_gpu_spark.operators.text import quality_filter

    train = documents.where(F.col("source") != eval_source)
    qf = quality_filter(train).select(
        "doc_id", F.col("keep").alias("q_keep"), F.col("reason").alias("q_reason")
    )
    docs_q = train.join(
        qf.where(F.col("q_keep")).select("doc_id"), "doc_id"
    )
    dc = dedup_clusters(docs_q, threshold=dedup_threshold).select(
        "doc_id", F.col("keep").alias("d_keep")
    )
    docs_d = docs_q.join(
        dc.where(F.col("d_keep") == 1).select("doc_id"), "doc_id"
    )
    # eval grams always come from the full eval split, not a curated one
    ct = ngram_contamination(
        docs_d.unionByName(documents.where(F.col("source") == eval_source)),
        eval_source,
        n=contam_n,
    ).select("doc_id", "contaminated")
    docs_c = docs_d.join(
        ct.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    samp = stratified_sample(docs_c, fraction, seed=seed).select(
        "doc_id", F.lit(1).alias("sampled")
    )
    decision = (
        F.when(~F.col("q_keep"), F.concat(F.lit("quality:"), F.col("q_reason")))
        .when(F.col("d_keep") == 0, F.lit("duplicate"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .when(F.col("sampled").isNull(), F.lit("not_sampled"))
        .otherwise(F.lit("kept"))
    )
    return (
        train.select("doc_id")
        .join(qf, "doc_id", "left")
        .join(dc, "doc_id", "left")
        .join(ct, "doc_id", "left")
        .join(samp, "doc_id", "left")
        .select(
            "doc_id",
            decision.alias("decision"),
            F.coalesce(F.col("sampled"), F.lit(0)).cast("int").alias("kept"),
        )
    )


def curation_funnel(
    documents: DataFrame,
    eval_source: str,
    fraction: float = 0.5,
    dedup_threshold: float = 0.5,
    contam_n: int = 3,
    seed: str = "corpus",
) -> DataFrame:
    """(decision, n_docs) — per-decision drop accounting of
    ``curate_corpus`` (one row per observed decision)."""
    return (
        curate_corpus(
            documents, eval_source, fraction, dedup_threshold, contam_n, seed
        )
        .groupBy("decision")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def curate_corpus_sql(
    eval_source: str,
    fraction: float = 0.5,
    dedup_threshold: float = 0.5,
    contam_n: int = 3,
    seed: str = "corpus",
) -> str:
    """DuckDB twin of ``curate_corpus`` — the four stage twins chained
    through survivor CTEs (each retargeted at the previous stage's
    survivors), then the same first-drop CASE."""
    from centrality_gpu_spark.operators.dedup import dedup_clusters_oracle_sql
    from centrality_gpu_spark.operators.text import quality_filter_sql

    qf_sql = _retarget(quality_filter_sql(), "train")
    dc_sql = _retarget(
        dedup_clusters_oracle_sql(threshold=dedup_threshold), "docs_q"
    )
    ct_sql = _retarget(
        ngram_contamination_sql(eval_source, n=contam_n), "ct_input"
    )
    samp_sql = _retarget(stratified_sample_sql(fraction, seed=seed), "docs_c")
    # MATERIALIZED throughout: each survivor CTE is referenced by the
    # next stage AND the final left-join fan; letting DuckDB re-inline
    # them re-runs the whole upstream pipeline per reference
    # (exponentially for the recursive dedup closure).
    return f"""
WITH train AS MATERIALIZED (
  SELECT * FROM documents WHERE source <> '{eval_source}'
),
qf AS MATERIALIZED ({qf_sql}),
docs_q AS MATERIALIZED (
  SELECT d.* FROM train d JOIN qf ON qf.doc_id = d.doc_id WHERE qf.keep
),
dc AS MATERIALIZED ({dc_sql}),
docs_d AS MATERIALIZED (
  SELECT d.* FROM docs_q d JOIN dc ON dc.doc_id = d.doc_id WHERE dc.keep = 1
),
ct_input AS MATERIALIZED (
  SELECT * FROM docs_d
  UNION ALL SELECT * FROM documents WHERE source = '{eval_source}'
),
ct AS MATERIALIZED ({ct_sql}),
docs_c AS MATERIALIZED (
  SELECT d.* FROM docs_d d
  JOIN ct ON ct.doc_id = d.doc_id WHERE NOT ct.contaminated
),
samp AS MATERIALIZED ({samp_sql})
SELECT t.doc_id,
       CASE WHEN NOT qf.keep THEN 'quality:' || qf.reason
            WHEN dc.keep = 0 THEN 'duplicate'
            WHEN ct.contaminated THEN 'contaminated'
            WHEN s.doc_id IS NULL THEN 'not_sampled'
            ELSE 'kept' END AS decision,
       CAST(s.doc_id IS NOT NULL AS INTEGER) AS kept
FROM train t
LEFT JOIN qf ON qf.doc_id = t.doc_id
LEFT JOIN dc ON dc.doc_id = t.doc_id
LEFT JOIN ct ON ct.doc_id = t.doc_id
LEFT JOIN samp s ON s.doc_id = t.doc_id
ORDER BY t.doc_id
""".strip()


def curation_funnel_sql(
    eval_source: str,
    fraction: float = 0.5,
    dedup_threshold: float = 0.5,
    contam_n: int = 3,
    seed: str = "corpus",
) -> str:
    """DuckDB twin of ``curation_funnel``."""
    inner = curate_corpus_sql(
        eval_source, fraction, dedup_threshold, contam_n, seed
    )
    return (
        f"SELECT decision, CAST(COUNT(*) AS BIGINT) AS n_docs\n"
        f"FROM ({inner}) GROUP BY decision ORDER BY decision"
    )


# --------------------------------------------------- sequence packing

def pack_sequences(
    documents: DataFrame, seq_len: int = 1024, n_buckets: int = 32
) -> DataFrame:
    """(doc_id, n_tokens, tok_offset, shard) — GPT-style sequence
    packing: concatenate all documents in doc_id order and chunk the
    token stream into fixed ``seq_len`` blocks. ``tok_offset`` is each
    document's global starting position (exclusive prefix sum of
    whitespace-token counts), ``shard = tok_offset // seq_len`` the
    training shard its first token lands in (documents may straddle
    shard boundaries — the standard concat-then-chunk packing).

    The global prefix sum is the textbook two-phase distributed scan,
    NOT a single-partition window: documents land in ``n_buckets``
    doc_id-range buckets (range order = global order), per-bucket token
    sums are collected (n_buckets rows — driver-safe at any corpus
    size) and turned into bucket prefix offsets, then a within-bucket
    window cumsum adds the broadcast offset. One range shuffle + one
    n_buckets-row agg, no O(corpus) window on one task.
    """
    from centrality_gpu_spark.operators.text import token_stats

    toks = token_stats(documents).select("doc_id", "n_ws_tokens")
    # doc_id-range buckets: ordered buckets => bucket-major order equals
    # global doc_id order
    bounds = toks.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if bounds.hi is None:  # empty corpus: empty result, same schema
        return toks.select(
            "doc_id",
            F.col("n_ws_tokens").cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("tok_offset"),
            F.lit(0).cast("long").alias("shard"),
        )
    span = max(int(bounds.hi) - int(bounds.lo) + 1, 1)
    pid = (
        (F.col("doc_id") - F.lit(int(bounds.lo)))
        * F.lit(n_buckets) / F.lit(span)
    ).cast("int")
    t = toks.withColumn("pid", pid)
    bucket_sums = {
        r.pid: r.s
        for r in t.groupBy("pid").agg(F.sum("n_ws_tokens").alias("s")).collect()
    }
    prefix, acc = {}, 0
    for b in range(n_buckets):
        prefix[b] = acc
        acc += int(bucket_sums.get(b, 0))
    pref_df = documents.sparkSession.createDataFrame(
        [(b, prefix[b]) for b in range(n_buckets)], "pid int, pref long"
    )
    w = Window.partitionBy("pid").orderBy("doc_id")
    cum = (
        F.coalesce(
            F.sum("n_ws_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    )
    return (
        t.join(F.broadcast(pref_df), "pid")
        .select(
            "doc_id",
            F.col("n_ws_tokens").cast("long").alias("n_tokens"),
            (cum + F.col("pref")).cast("long").alias("tok_offset"),
        )
        .withColumn(
            "shard", (F.col("tok_offset") / F.lit(seq_len)).cast("long")
        )
    )


def pack_sequences_sql(seq_len: int = 1024) -> str:
    """DuckDB twin of ``pack_sequences`` — the same exclusive prefix
    sum as ONE global window (the oracle can afford it)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+'))
         END::BIGINT AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0)::BIGINT AS tok_offset
  FROM toks
)
SELECT doc_id, n_tokens, tok_offset,
       (tok_offset // {seq_len})::BIGINT AS shard
FROM packed ORDER BY doc_id
""".strip()


# --------------------------------------------------- vocabulary growth

def vocab_growth(documents: DataFrame, n_buckets: int = 32) -> DataFrame:
    """(doc_id, new_words, vocab_size) — the Heaps-law vocabulary
    growth curve: scanning the corpus in doc_id order, how many
    never-seen-before (lowercased whitespace) words each document
    contributes and the running distinct-vocabulary size after it.

    The curve is the standard corpus-composition diagnostic (vocabulary
    saturation ⇒ duplication / narrow domain; Heaps' law predicts
    V(n) ≈ K·nᵝ on natural text). Distributed shape: first-occurrence
    assignment is one word groupBy (min doc_id — no window), and the
    running total is the same two-phase prefix sum as
    ``pack_sequences`` (doc_id-range buckets, n_buckets-row collected
    prefix, within-bucket window) — no global single-task scan.
    """
    words = F.explode(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
        )
    )
    first = (
        documents.select("doc_id", words.alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("new_words"))
    )
    per_doc = documents.select("doc_id").join(first, "doc_id", "left").select(
        "doc_id", F.coalesce("new_words", F.lit(0)).cast("long").alias("new_words")
    )
    bounds = per_doc.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if bounds.hi is None:  # empty corpus: empty result, same schema
        return per_doc.select(
            "doc_id", "new_words",
            F.lit(0).cast("long").alias("vocab_size"),
        )
    span = max(int(bounds.hi) - int(bounds.lo) + 1, 1)
    pid = (
        (F.col("doc_id") - F.lit(int(bounds.lo)))
        * F.lit(n_buckets) / F.lit(span)
    ).cast("int")
    t = per_doc.withColumn("pid", pid)
    bucket_sums = {
        r.pid: r.s
        for r in t.groupBy("pid").agg(F.sum("new_words").alias("s")).collect()
    }
    prefix, acc = {}, 0
    for b in range(n_buckets):
        prefix[b] = acc
        acc += int(bucket_sums.get(b, 0))
    pref_df = documents.sparkSession.createDataFrame(
        [(b, prefix[b]) for b in range(n_buckets)], "pid int, pref long"
    )
    w = Window.partitionBy("pid").orderBy("doc_id")
    running = F.sum("new_words").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.join(F.broadcast(pref_df), "pid")
        .select(
            "doc_id",
            "new_words",
            (running + F.col("pref")).cast("long").alias("vocab_size"),
        )
    )


def vocab_growth_sql() -> str:
    """DuckDB twin of ``vocab_growth`` (single global window — the
    oracle can afford it)."""
    return """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS new_words
  FROM (SELECT word, MIN(doc_id) AS doc_id FROM w GROUP BY word)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.new_words, 0) AS new_words,
       CAST(SUM(COALESCE(p.new_words, 0)) OVER (
         ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING
         AND CURRENT ROW) AS BIGINT) AS vocab_size
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""".strip()
