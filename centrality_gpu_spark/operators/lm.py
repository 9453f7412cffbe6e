"""Distribution-aware corpus curation: corpus-trained unigram LM +
per-document perplexity (the CCNet filter, Wenzek et al. 2020), the
cross-document duplicated-n-gram fraction (the span-dedup signal of
Lee et al. 2022 at n-gram granularity), and DSIR-style importance
weights (Xie et al. 2023: hashed-n-gram bucket log-likelihood ratio
of a target distribution vs the raw corpus).

These complete the quality-signal family in ``operators.text`` with
the signals that need CORPUS-level statistics (an LM / a gram-count
table / a target distribution), not just per-document expressions.
Reference parity note: the reference engine (centrality-GPU) has no
text surface at all — these operators exist for the north rule's
training-data-pipeline axis, not for reference parity.

100 TB shape: every operator here is (explode grams) → one
hash-partitioned groupBy on the gram/bucket key → a join back of a
model table that is VOCABULARY-sized, not corpus-sized (unigram vocab
/ 4096 DSIR buckets broadcast; the duplicated-gram table is the one
corpus-sized join and it is a plain shuffle join on the gram key —
the same inverted-index profile as ``ngram_jaccard``). Per-document
folds are integer counts or sums of engine-identical doubles, so
every output is DuckDB-oracle-checkable at ROUND(.,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "unigram_lm",
    "perplexity",
    "duplicate_ngram_fraction",
    "dsir_weights",
    "unigram_lm_sql",
    "perplexity_oracle_sql",
    "duplicate_ngram_oracle_sql",
    "dsir_oracle_sql",
    "span_dedup",
    "span_dedup_oracle_sql",
]


def _words(t=None):
    # the shared word tokenizer of text.repetition_stats: lowercase,
    # split on whitespace, drop empties (DuckDB twin:
    # list_filter(regexp_split_to_array(lower(text), '\s+'), ...))
    t = F.col("text") if t is None else t
    return F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != F.lit(""))


def _grams(w, k: int):
    """Word k-grams of array column ``w`` (space-joined), [] if size<k."""
    if k == 1:
        return w
    idx = F.sequence(F.lit(1), F.size(w) - F.lit(k - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j) for j in range(k)]
    )
    return F.when(F.size(w) >= k, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


_WORDS_SQL = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"


def _grams_sql(w: str, k: int) -> str:
    if k == 1:
        return w
    join = " || ' ' || ".join(f"{w}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({w}) >= {k} THEN "
        f"list_transform(generate_series(1, len({w}) - {k - 1}), i -> {join}) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


# ------------------------------------------------------------ unigram LM


def unigram_lm(documents: DataFrame) -> DataFrame:
    """(token, cnt, logp) — add-one-smoothed unigram language model
    trained on the corpus itself: ``logp = ln((cnt+1) / (N+V))`` with
    ``N`` = total token occurrences and ``V`` = vocabulary size.

    One explode + one groupBy(token); the model is vocabulary-sized.
    ``cnt+1`` and ``N+V`` are exact integers, so ``logp`` is the same
    double in any engine.
    """
    toks = documents.select(F.explode(_words()).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_total"), F.count("*").alias("v_size")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "cnt",
        F.log((F.col("cnt") + 1) / (F.col("n_total") + F.col("v_size"))).alias(
            "logp"
        ),
    )


def perplexity(
    documents: DataFrame,
    lm: DataFrame | None = None,
    oov_logp: float | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, ppl) — per-document unigram perplexity
    ``exp(-Σ logp / n)`` under ``lm`` (default: the corpus's own
    :func:`unigram_lm` — the CCNet self-scored filter, where OOV is
    impossible). Scoring against an external LM requires ``oov_logp``
    (the smoothed unseen-token mass, ``ln(1/(N+V))`` of that LM).

    Unusually HIGH ppl under the corpus LM flags out-of-distribution
    noise; unusually LOW flags degenerate repetition. Empty documents
    get ``ppl = 0.0`` (no evidence), kept so the output is total.

    The LM join is vocabulary-sized (broadcast-able); the per-doc fold
    is one groupBy(doc_id) sum — rounded to 6, which absorbs the
    sub-1e-9 float-order slack (same contract as ``char_entropy``).
    """
    if lm is None:
        lm = unigram_lm(documents)
        miss = F.lit(None).cast("double")  # unreachable: self-scored
    elif oov_logp is None:
        raise ValueError("scoring against an external lm requires oov_logp")
    else:
        miss = F.lit(float(oov_logp))
    toks = documents.select(
        "doc_id", F.explode(_words()).alias("token")
    )
    scored = toks.join(lm.select("token", "logp"), "token", "left").select(
        "doc_id", F.coalesce("logp", miss).alias("logp")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum("logp").alias("s")
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(F.exp(-F.col("s") / F.col("n")), F.lit(0.0)), 6
            ).alias("ppl"),
        )
    )


def unigram_lm_sql(source: str = "documents", where: str = "TRUE") -> str:
    """DuckDB CTE chain ending in ``lm(token, cnt, logp)``."""
    return f"""
toks AS (
  SELECT unnest({_WORDS_SQL}) AS token FROM {source} WHERE {where}
),
vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
tot AS (SELECT SUM(cnt) AS n_total, COUNT(*) AS v_size FROM vocab),
lm AS (
  SELECT token, cnt, ln((cnt + 1.0) / (n_total + v_size)) AS logp
  FROM vocab CROSS JOIN tot
)""".strip()


def perplexity_oracle_sql() -> str:
    """Self-scored corpus perplexity, term-for-term with
    :func:`perplexity`: same tokenizer, same smoothing, same
    ``exp(-Σ/n)`` and ROUND(.,6)."""
    return f"""
WITH {unigram_lm_sql()},
dtoks AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS token FROM documents
),
per_doc AS (
  SELECT d.doc_id, COUNT(*) AS n, SUM(lm.logp) AS s
  FROM dtoks d JOIN lm USING (token) GROUP BY d.doc_id
)
SELECT doc.doc_id,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(exp(-p.s / p.n), 0.0), 6) AS ppl
FROM documents doc LEFT JOIN per_doc p ON p.doc_id = doc.doc_id
ORDER BY doc.doc_id
""".strip()


# --------------------------------------------- duplicated n-gram fraction


def duplicate_ngram_fraction(documents: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, n_grams, dup_grams, dup_frac) — for each document, the
    fraction of its word ``n``-gram positions whose gram occurs ≥ 2
    times in the WHOLE corpus (cross-document or repeated in-document):
    the n-gram-granularity form of the duplicated-span signal of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"). A high fraction means the document is mostly made of
    text that exists elsewhere — prime removal candidate even when no
    single whole-document near-dup match fires.

    Shape: explode grams with multiplicity → corpus gram counts (one
    groupBy on the gram — the inverted-index shuffle) → join each
    position back to its count → per-doc integer ratio (exact). At
    100 TB, replace the string gram key with ``xxhash64(gram)`` to cut
    the shuffle payload to 8 bytes/position (collisions only ever
    overcount duplication by ~2⁻⁶⁴ — acceptable for a filter signal);
    kept as the raw string here so the DuckDB twin is key-identical.
    """
    grams = documents.select(
        "doc_id", F.explode(_grams(_words(), n)).alias("g")
    )
    corpus = grams.groupBy("g").agg(F.count("*").alias("c"))
    per_doc = (
        grams.join(corpus, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias("dup_grams"),
        )
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("dup_grams", F.lit(0)).cast("long").alias("dup_grams"),
            F.round(
                F.coalesce(
                    F.col("dup_grams").cast("double") / F.col("n_grams"),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_frac"),
        )
    )


def duplicate_ngram_oracle_sql(n: int = 5) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
grams AS (
  SELECT doc_id, unnest({_grams_sql('w', n)}) AS g FROM base
),
corpus AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS dup_grams
  FROM grams JOIN corpus USING (g) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.dup_grams, 0) AS BIGINT) AS dup_grams,
       ROUND(COALESCE(CAST(p.dup_grams AS DOUBLE) / p.n_grams, 0.0), 6)
           AS dup_frac
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
""".strip()


# ------------------------------------------------- DSIR importance weights


DSIR_BUCKET_HEX = 3  # md5-prefix buckets: 16^3 = 4096, the DSIR default scale


def _bucket(col):
    return F.substring(F.md5(col), 1, DSIR_BUCKET_HEX)


def dsir_weights(documents: DataFrame, target: DataFrame) -> DataFrame:
    """(doc_id, n_feats, dsir_logratio) — Data Selection via Importance
    Resampling (Xie et al. 2023): features are word unigrams + bigrams
    hashed into 4096 buckets (md5 3-hex-char prefix — the same hash in
    Spark and DuckDB, which is why it is md5 and not xxhash64); bucket
    distributions are estimated on ``target`` (the wanted domain) and
    on ``documents`` (the raw pool), add-one smoothed over all 4096
    buckets; each document's weight is the MEAN per-feature
    log-likelihood ratio ``(Σ ln p_target(b) − ln p_raw(b)) / n``.
    Select by ranking on ``dsir_logratio`` (descending = most
    target-like). Mean (not sum) keeps the score length-invariant.

    Both bucket tables are 4096 rows → broadcast joins; the only
    corpus-sized operations are the two explodes and one
    groupBy(doc_id). Documents with no features score 0.0.
    """
    def feats(df: DataFrame) -> DataFrame:
        base = df.select("doc_id", _words().alias("w"))
        return base.select(
            "doc_id",
            F.explode(
                F.concat(F.col("w"), _grams(F.col("w"), 2))
            ).alias("g"),
        ).select("doc_id", _bucket(F.col("g")).alias("b"))

    n_buckets = 16 ** DSIR_BUCKET_HEX

    def dist(df: DataFrame, name: str) -> DataFrame:
        cnt = feats(df).groupBy("b").agg(F.count("*").alias("c"))
        tot = cnt.agg(F.sum("c").alias("t"))
        return cnt.crossJoin(F.broadcast(tot)).select(
            "b",
            F.log((F.col("c") + 1) / (F.col("t") + F.lit(n_buckets))).alias(
                f"logp_{name}"
            ),
            F.col("t").alias(f"_t_{name}"),
        )

    tgt = dist(target, "t")
    raw = dist(documents, "r")
    # unseen buckets still carry smoothed mass ln(1/(T+B)); realize it
    # by outer-joining the two 4096-row tables and filling the gaps.
    t_tot = tgt.select(F.first("_t_t")).first()[0] or 0
    r_tot = raw.select(F.first("_t_r")).first()[0] or 0
    import math

    miss_t = math.log(1.0 / (t_tot + n_buckets))
    miss_r = math.log(1.0 / (r_tot + n_buckets))
    model = (
        tgt.select("b", "logp_t")
        .join(raw.select("b", "logp_r"), "b", "full_outer")
        .select(
            "b",
            F.coalesce("logp_t", F.lit(miss_t)).alias("logp_t"),
            F.coalesce("logp_r", F.lit(miss_r)).alias("logp_r"),
        )
    )
    scored = feats(documents).join(F.broadcast(model), "b").select(
        "doc_id", (F.col("logp_t") - F.col("logp_r")).alias("lr")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum("lr").alias("s")
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_feats"),
            F.round(
                F.coalesce(F.col("s") / F.col("n"), F.lit(0.0)), 6
            ).alias("dsir_logratio"),
        )
    )


def dsir_oracle_sql(target_where: str) -> str:
    """DuckDB twin of :func:`dsir_weights` with ``target`` = documents
    rows satisfying ``target_where`` — same md5-prefix buckets, same
    smoothing, same mean log-ratio at ROUND(.,6)."""
    n_buckets = 16 ** DSIR_BUCKET_HEX
    feats = (
        "SELECT doc_id, substr(md5(g), 1, {h}) AS b FROM (\n"
        "  SELECT doc_id, unnest(list_concat(w, {bg})) AS g FROM (\n"
        "    SELECT doc_id, {w} AS w FROM documents WHERE {{where}}\n"
        "  )\n"
        ")"
    ).format(h=DSIR_BUCKET_HEX, bg=_grams_sql("w", 2), w=_WORDS_SQL)
    return f"""
WITH tgt_f AS ({feats.format(where=target_where)}),
raw_f AS ({feats.format(where='TRUE')}),
tgt_c AS (SELECT b, COUNT(*) AS c FROM tgt_f GROUP BY b),
raw_c AS (SELECT b, COUNT(*) AS c FROM raw_f GROUP BY b),
tgt_t AS (SELECT COALESCE(SUM(c), 0) AS t FROM tgt_c),
raw_t AS (SELECT COALESCE(SUM(c), 0) AS t FROM raw_c),
model AS (
  SELECT COALESCE(tc.b, rc.b) AS b,
         COALESCE(ln((tc.c + 1.0) / (tt.t + {n_buckets})),
                  ln(1.0 / (tt.t + {n_buckets}))) AS logp_t,
         COALESCE(ln((rc.c + 1.0) / (rt.t + {n_buckets})),
                  ln(1.0 / (rt.t + {n_buckets}))) AS logp_r
  FROM tgt_c tc FULL OUTER JOIN raw_c rc ON tc.b = rc.b
  CROSS JOIN tgt_t tt CROSS JOIN raw_t rt
),
per_doc AS (
  SELECT f.doc_id, COUNT(*) AS n, SUM(m.logp_t - m.logp_r) AS s
  FROM raw_f f JOIN model m USING (b) GROUP BY f.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n_feats,
       ROUND(COALESCE(p.s / p.n, 0.0), 6) AS dsir_logratio
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
""".strip()


# ------------------------------------------------ exact substring dedup


def span_dedup(documents: DataFrame, k: int = 20) -> DataFrame:
    """(doc_id, clean_text, n_tokens, n_removed) — EXACT duplicated-span
    REMOVAL: every maximal word span of length ≥ ``k`` that occurs more
    than once in the corpus (cross-document or repeated in-document)
    survives in exactly one place — its first occurrence by (doc_id,
    position) — and is deleted everywhere else. This is the actual
    dedup step of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", their ExactSubstr at word granularity);
    :func:`duplicate_ngram_fraction` only *measures* the signal and
    ``text.winnow_fingerprints`` only *fingerprints* it.

    Semantics (deterministic, engine-independent):

    1. tokens = the family's shared tokenizer (lowercase, split on
       whitespace, drop empties) — ``clean_text`` is rebuilt from the
       kept tokens space-joined, i.e. output text is normalized.
    2. every k-gram occurrence (doc_id, pos) whose gram value occurs
       elsewhere in the corpus is a *duplicate start* unless it is the
       gram's canonical occurrence: the minimum (doc_id, pos).
    3. a token is removed iff some duplicate start covers it — a
       duplicate start at q covers positions [q, q+k-1].

    Why this equals span semantics: a duplicated span of length
    L ≥ k is duplicated in ALL of its L−k+1 k-grams, whose non-first
    occurrences cover exactly the span's tokens at the losing sites;
    conversely no token outside a duplicated ≥k-span is covered by any
    duplicated k-gram. First-occurrence canonicalization keeps the
    whole span intact at its minimal (doc_id, pos) site (all its grams
    are canonical there), so exactly one copy survives.

    Scale shape: the suffix-array of the paper is replaced by the
    distributed-native equivalent — one posexplode of k-gram positions
    (O(total tokens) rows), one groupBy(gram) for the canonical
    occurrence (the inverted-index shuffle, same profile as
    ``duplicate_ngram_fraction``; at 100 TB swap the string key for
    ``xxhash64`` to shrink the shuffle payload), one join back, and a
    per-document rows-window of width k for coverage — no window ever
    spans more than one document. Hot grams (a boilerplate sentence
    duplicated a million times) hit the groupBy as one skewed key;
    the min() aggregate is algebraic (map-side partial), so the skew
    cost is a partial-agg fan-in, never a sort of the hot group.
    """
    w = _words()
    toks = documents.select(
        "doc_id", F.posexplode(w).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    occ = documents.select(
        "doc_id", F.posexplode(_grams(_words(), k)).alias("pos0", "g")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    mins = occ.groupBy("g").agg(
        F.min(F.struct("doc_id", "pos")).alias("mn"),
        F.count("*").alias("c"),
    )
    starts = (
        occ.join(mins, "g")
        .where(
            (F.col("c") > 1)
            & (F.struct("doc_id", "pos") != F.col("mn"))
        )
        .select("doc_id", "pos", F.lit(1).alias("dup_start"))
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(k - 1), 0)
    )
    flagged = (
        toks.join(starts, ["doc_id", "pos"], "left")
        .select(
            "doc_id",
            "pos",
            "token",
            F.max(F.coalesce("dup_start", F.lit(0))).over(win).alias("rm"),
        )
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("rm").alias("n_removed"),
        F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rm") == 0,
                                F.struct("pos", F.array("token").alias("t")),
                            ).otherwise(
                                F.struct(
                                    "pos",
                                    F.array().cast("array<string>").alias("t"),
                                )
                            )
                        )
                    ),
                    lambda s: s["t"],
                )
            ),
        ).alias("clean_text"),
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def span_dedup_oracle_sql(
    k: int = 20, source: str = "documents", extra_cte: str = ""
) -> str:
    """Term-for-term DuckDB twin of :func:`span_dedup`: same tokenizer,
    same 1-based gram positions, same min-(doc_id, pos) canonical rule,
    same width-k coverage window, same space-joined rebuild.

    ``extra_cte`` — an optional leading CTE body (e.g. an injected
    ``source``), spliced as ``WITH <extra_cte>, base AS ...``."""
    if extra_cte:
        extra_cte = extra_cte.rstrip().rstrip(",") + ",\n"
    return f"""
WITH {extra_cte}base AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM {source}
),
toks AS (
  SELECT doc_id, i AS pos, w[i] AS token
  FROM base, UNNEST(generate_series(1, len(w))) AS t(i)
),
occ AS (
  SELECT doc_id, i AS pos,
         array_to_string(w[i:i+{k - 1}], ' ') AS g
  FROM base, UNNEST(generate_series(1, len(w) - {k - 1})) AS t(i)
  WHERE len(w) >= {k}
),
ranked AS (
  SELECT doc_id, pos, g,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS c
  FROM occ
),
starts AS (
  SELECT doc_id, pos, 1 AS dup_start FROM ranked WHERE c > 1 AND rn > 1
),
flagged AS (
  SELECT t.doc_id, t.pos, t.token,
         MAX(COALESCE(s.dup_start, 0)) OVER (
           PARTITION BY t.doc_id ORDER BY t.pos
           ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW
         ) AS rm
  FROM toks t LEFT JOIN starts s ON s.doc_id = t.doc_id AND s.pos = t.pos
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(rm) AS n_removed,
         string_agg(token, ' ' ORDER BY pos) FILTER (WHERE rm = 0)
             AS clean_text
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.clean_text, '') AS clean_text,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_removed, 0) AS BIGINT) AS n_removed
FROM {source} d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
""".strip()
