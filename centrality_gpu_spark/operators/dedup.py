"""Deduplication operators over the ``documents`` table — exact,
MinHash+LSH, SimHash, and n-gram Jaccard. All hot paths are built-in
``pyspark.sql.functions`` over arrays (JVM, whole-stage codegen): the
shingle → minhash → band → bucket-join pipeline never leaves the JVM,
which is what makes it viable over 10⁹ documents.

Scale notes:
- banding turns the quadratic all-pairs problem into per-bucket
  self-joins; bucket sizes follow shingle collisions, so the bucket
  join is salted by AQE's skew handling (enabled in session.py);
- exact-verification joins re-attach shingle arrays only for candidate
  pairs (semi-join first, arrays later) to keep shuffle payloads thin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NGRAM = 3
DEFAULT_NUM_HASHES = 32
DEFAULT_BANDS = 8  # 8 bands × 4 rows


def normalized_text(col=None):
    c = F.col("text") if col is None else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


# ---------------------------------------------------------------- exact

def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) docs:
    (fp string, n_docs, doc_ids sorted array). md5 on purpose — the
    DuckDB oracle computes the identical digest."""
    fp = F.md5(normalized_text())
    return (
        documents.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


EXACT_DUP_SQL = """
fp AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, doc_id
  FROM documents
)
""".strip()


# -------------------------------------------------------------- shingles

def with_shingles(documents: DataFrame, n: int = DEFAULT_NGRAM) -> DataFrame:
    """(doc_id, shingles: array<string>) — word n-grams, distinct.

    Built with sequence+transform+slice: array ops in codegen, no UDF.
    Docs shorter than n words get their whole text as one shingle.
    """
    toks = F.split(normalized_text(), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return documents.select("doc_id", F.array_distinct(sh).alias("shingles"))


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.5, n: int = DEFAULT_NGRAM
) -> DataFrame:
    """All pairs with Jaccard(shingles) ≥ threshold:
    (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Exact (inverted-index join on shared shingles — only pairs sharing
    ≥1 shingle are ever materialized, the standard all-pairs pruning),
    used as the verifier behind MinHash and as its own oracle-checked
    operator.
    """
    sh = with_shingles(documents, n)
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = inv.select(F.col("shingle"), F.col("doc_id").alias("doc_a"))
    b = inv.select(F.col("shingle"), F.col("doc_id").alias("doc_b"))
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("sza") + F.col("szb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def ngram_jaccard_sql(threshold: float = 0.5, n: int = DEFAULT_NGRAM) -> str:
    """DuckDB twin of ngram_jaccard_pairs (same shingling)."""
    return f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(w) <= {n - 1} THEN [array_to_string(w, ' ')]
           ELSE [array_to_string(w[i:i+{n - 1}], ' ')
                 FOR i IN range(1, len(w) - {n - 2})] END
         ) AS shingles
  FROM toks
),
sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) >= {threshold}
ORDER BY doc_a, doc_b
""".strip()


# --------------------------------------------------------------- MinHash

def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """(doc_id, sig: array<long>) — sig[h] = min over shingles of
    xxhash64(shingle, h). All JVM array ops (array_min ∘ transform)."""
    sh = with_shingles(documents, n)
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(h)))
            )
            for h in range(num_hashes)
        ]
    )
    return sh.select("doc_id", sig.alias("sig"))


def minhash_candidates(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """LSH banding: (doc_a, doc_b, est_jaccard) for pairs sharing ≥1
    band bucket. est_jaccard = fraction of matching signature slots."""
    rows = num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes, n).persist()
    band_cols = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(*[F.col("sig")[bi * rows + r] for r in range(rows)]).alias(
                    "bucket"
                ),
            )
            for bi in range(bands)
        ]
    )
    buckets = sigs.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    pa = buckets.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    pb = buckets.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    cand = (
        pa.join(pb, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    est = (
        cand.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sa", "sb", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
    )
    return est


def minhash_dedup(
    documents: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Candidates filtered by *exact* Jaccard ≥ threshold (the
    verify-after-LSH pattern): (doc_a, doc_b, jaccard)."""
    cand = minhash_candidates(documents, num_hashes, bands, n).select("doc_a", "doc_b")
    sh = with_shingles(documents, n)
    j = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("shA")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("shB")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("shA", "shB"))
                / F.size(F.array_union("shA", "shB"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# --------------------------------------------------------------- SimHash

def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash:long) — sign-aggregated token hashes.

    Per token: xxhash64(token); bit i of the simhash is 1 iff
    Σ_tokens (2·bit_i(hash) − 1) > 0. Computed as 64 conditional sums
    in one aggregation — wide but single-pass, all codegen.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sh = F.lit(0).cast("long")
    for i in range(bits):
        sh = sh.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select("doc_id", sh.alias("simhash"))


def simhash_near_duplicates(
    documents: DataFrame, max_hamming: int = 8, bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within ``max_hamming`` bits,
    found by banding the 64-bit simhash into 16-bit chunks (a pair
    within distance d < bands must share ≥1 exact chunk)."""
    sh = simhash(documents).persist()
    width = 64 // bands
    mask = (1 << width) - 1
    chunk_cols = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("simhash"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sh.select("doc_id", F.explode(chunk_cols).alias("c")).select(
        "doc_id", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk")
    )
    pa = buckets.select("band", "chunk", F.col("doc_id").alias("doc_a"))
    pb = buckets.select("band", "chunk", F.col("doc_id").alias("doc_b"))
    cand = (
        pa.join(pb, ["band", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ham = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb")), "doc_b")
        .select("doc_a", "doc_b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
    return ham
