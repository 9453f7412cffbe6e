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
    documents: DataFrame,
    threshold: float = 0.5,
    n: int = DEFAULT_NGRAM,
    method: str = "prefix",
) -> DataFrame:
    """All pairs with Jaccard(shingles) ≥ threshold:
    (doc_a, doc_b, jaccard) with doc_a < doc_b. Both methods are EXACT
    (same output); they differ only in the candidate-generation plan:

    - ``"prefix"`` (default, the scale path): PPJoin/AllPairs prefix
      filtering. Each doc indexes only its first
      ``|sh| - ceil(t·|sh|) + 1`` shingles under a global
      rarest-first order (document frequency ascending) — any pair with
      J ≥ t must share a prefix shingle, and ubiquitous shingles sort
      to the never-indexed suffix, so no single hot shingle can make a
      bucket quadratic. Candidates are then verified with the full
      shingle arrays.
    - ``"index"``: plain inverted-index join on ALL shared shingles,
      counting intersections directly. Fewer passes on small corpora,
      but one shingle shared by k docs costs k² join rows.
    """
    sh = with_shingles(documents, n)
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if method == "prefix":
        from pyspark.sql import Window

        dfc = inv.groupBy("shingle").agg(F.count("*").alias("df"))
        w = Window.partitionBy("doc_id").orderBy("df", "shingle")
        pref = (
            inv.join(dfc, "shingle")
            .withColumn("rnk", F.row_number().over(w))
            .join(sizes, "doc_id")
            .where(
                # prefix length |sh| - ceil(t·|sh|) + 1; the 1e-9 guards
                # fp noise from rounding an exactly-integer t·|sh| UP
                # (which would shorten the prefix and could miss pairs —
                # rounding down only lengthens it, which is safe)
                F.col("rnk")
                <= F.col("sz")
                - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9))
                + 1
            )
            .select("doc_id", "shingle")
        )
        a = pref.select("shingle", F.col("doc_id").alias("doc_a"))
        b = pref.select("shingle", F.col("doc_id").alias("doc_b"))
        cand = (
            a.join(b, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        out = (
            cand.join(sh.select(F.col("doc_id").alias("doc_a"),
                                F.col("shingles").alias("shA")), "doc_a")
            .join(sh.select(F.col("doc_id").alias("doc_b"),
                            F.col("shingles").alias("shB")), "doc_b")
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
        return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    if method != "index":
        raise ValueError(f"method must be 'prefix' or 'index', got {method!r}")
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


def shingle_ctes(n: int = DEFAULT_NGRAM) -> str:
    """DuckDB CTEs (norm, toks, sh) reproducing ``with_shingles``."""
    return f"""norm AS (
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
)"""


def ngram_jaccard_sql(threshold: float = 0.5, n: int = DEFAULT_NGRAM) -> str:
    """DuckDB twin of ngram_jaccard_pairs (same shingling)."""
    return f"""
WITH {shingle_ctes(n)},
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

def _mh_slot(shingles_col, h: int, hash_mode: str):
    """One signature slot: min over shingles of hash_h(shingle).

    ``md5`` mode keeps the hash as a hex *string* (lexicographic min) —
    deliberately: DuckDB computes the identical digest, which is what
    makes the LSH pipeline driver-oracle-checkable. ``xx64`` is the
    faster JVM-native variant for hot paths that don't need an oracle.
    """
    if hash_mode == "md5":
        return F.array_min(
            F.transform(
                shingles_col, lambda s: F.md5(F.concat(F.lit(f"mh{h}:"), s))
            )
        )
    return F.array_min(F.transform(shingles_col, lambda s: F.xxhash64(s, F.lit(h))))


def _signatures_from_shingles(
    sh: DataFrame, num_hashes: int, hash_mode: str
) -> DataFrame:
    """Signature rows from an existing (doc_id, shingles) frame — lets
    a pipeline that also needs the shingles for verify share one
    normalization/tokenization pass instead of recomputing it."""
    sig = F.array(
        *[_mh_slot(F.col("shingles"), h, hash_mode) for h in range(num_hashes)]
    )
    return sh.select("doc_id", sig.alias("sig"))


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    n: int = DEFAULT_NGRAM,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, sig: array) — sig[h] = min over shingles of
    hash_h(shingle). All JVM array ops (array_min ∘ transform)."""
    return _signatures_from_shingles(
        with_shingles(documents, n), num_hashes, hash_mode
    )


def band_buckets(
    sigs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, band, bucket) — the LSH band index over signature rows
    from ``minhash_signatures``. The pair-independent half of the LSH
    join: batch dedup self-joins it; the streaming accumulator keeps it
    as its persistent index and probes it with each new batch."""
    rows = num_hashes // bands

    def bucket_of(bi):
        slots = [F.col("sig")[bi * rows + r] for r in range(rows)]
        if hash_mode == "md5":
            return F.md5(F.concat_ws("|", *slots))
        return F.xxhash64(*slots).cast("string")

    band_cols = F.array(
        *[
            F.struct(F.lit(bi).alias("band"), bucket_of(bi).alias("bucket"))
            for bi in range(bands)
        ]
    )
    return sigs.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_candidates(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
    hash_mode: str = "md5",
) -> DataFrame:
    """LSH banding: (doc_a, doc_b, est_jaccard) for pairs sharing ≥1
    band bucket. est_jaccard = fraction of matching signature slots."""
    sigs = minhash_signatures(documents, num_hashes, n, hash_mode).persist()
    buckets = band_buckets(sigs, num_hashes, bands, hash_mode)
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
    hash_mode: str = "md5",
) -> DataFrame:
    """Candidates filtered by *exact* Jaccard ≥ threshold (the
    verify-after-LSH pattern): (doc_a, doc_b, jaccard).

    Plan: candidate ids straight off the bucket self-join — the
    est_jaccard signature-array joins that ``minhash_candidates``
    layers on top are for callers who want the estimate, not needed
    when the exact verify follows anyway. Caching choice (measured):
    materialize the NARROW bucket table (eager localCheckpoint — a
    function-local persist would either be a no-op before the caller's
    first action or leak for the app lifetime) so the self-join's two
    sides don't re-run the shingle+signature chain; the wide shingles
    array is deliberately NOT cached — recomputing it inside
    whole-stage codegen on each verify branch is cheaper than
    materializing it."""
    sh = with_shingles(documents, n)
    sigs = _signatures_from_shingles(sh, num_hashes, hash_mode)
    buckets = band_buckets(sigs, num_hashes, bands, hash_mode).localCheckpoint(
        eager=True
    )
    pa = buckets.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    pb = buckets.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    cand = (
        pa.join(pb, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
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


def minhash_oracle_sql(
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
) -> str:
    """DuckDB twin of ``minhash_dedup(hash_mode='md5')`` — the *same*
    md5 signature slots, band buckets, candidate join, and exact-Jaccard
    verify, so the driver can value-hash the whole LSH pipeline (not
    just ground truth: identically-missed pairs are missed on both
    sides)."""
    rows = num_hashes // bands
    slots = ",\n         ".join(
        f"MIN(md5('mh{h}:' || shingle)) AS s{h}" for h in range(num_hashes)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {bi} AS band, "
        "md5(" + " || '|' || ".join(f"s{bi * rows + r}" for r in range(rows)) + ") "
        "AS bucket FROM sig"
        for bi in range(bands)
    )
    return f"""
WITH {shingle_ctes(n)},
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
sig AS (
  SELECT doc_id,
         {slots}
  FROM inv GROUP BY doc_id
),
buckets AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.shingles, sb.shingles))
           / len(list_distinct(sa.shingles || sb.shingles)) AS jaccard
  FROM cand c
  JOIN sh sa ON c.doc_a = sa.doc_id
  JOIN sh sb ON c.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
FROM verified WHERE jaccard >= {threshold}
ORDER BY doc_a, doc_b
""".strip()


# --------------------------------------------------------------- SimHash

MD5_SIMHASH_BITS = 60  # 15 hex chars of md5 → positive int64 on both engines


def simhash(documents: DataFrame, bits: int | None = None,
            hash_mode: str = "md5") -> DataFrame:
    """(doc_id, simhash:long) — sign-aggregated token hashes.

    Per token: hash(token); bit i of the simhash is 1 iff
    Σ_tokens (2·bit_i(hash) − 1) > 0. Computed as ``bits`` conditional
    sums in one aggregation — wide but single-pass, all codegen.

    ``md5`` mode derives a 60-bit token hash from the first 15 hex
    chars of md5 (``conv(hex, 16, 10)``) — reproducible in DuckDB
    (``('0x'||substr(md5(t),1,15))::BIGINT``), which is what makes the
    near-dup pipeline oracle-checkable. ``xx64`` keeps the faster
    64-bit JVM hash.
    """
    if bits is None:
        bits = MD5_SIMHASH_BITS if hash_mode == "md5" else 64
    if hash_mode == "md5":
        h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64("tok")
    toks = documents.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("tok")
    ).select("doc_id", h.alias("h"))
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
    documents: DataFrame, max_hamming: int = 8, bands: int = 4,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_a, doc_b, hamming) — near-dup pairs found by banding the
    simhash into ``bands`` equal chunks and verifying
    ``bit_count(xor) <= max_hamming`` on bucket-mates.

    **Recall gap (documented, like lsh_topk):** the pigeonhole guarantee
    only covers pairs with hamming < ``bands`` — a pair at distance
    bands..max_hamming can differ in every chunk and be missed. With
    the defaults (4 bands of 15/16 bits) this is the standard
    precision/recall/cost trade; pass ``bands=max_hamming+1`` for full
    recall at the price of much smaller (busier) buckets. The DuckDB
    oracle implements the identical banding, so missed pairs are missed
    on both sides and the driver hash still matches."""
    sh = simhash(documents, hash_mode=hash_mode).persist()
    total_bits = MD5_SIMHASH_BITS if hash_mode == "md5" else 64
    width = total_bits // bands
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


def simhash_oracle_sql(max_hamming: int = 8, bands: int = 4) -> str:
    """DuckDB twin of ``simhash_near_duplicates(hash_mode='md5')`` —
    identical 60-bit md5-derived token hashes, bit-sign aggregation,
    chunk banding, and hamming verify (same candidate set, same
    misses — see the recall note on the operator)."""
    bits = MD5_SIMHASH_BITS
    width = bits // bands
    mask = (1 << width) - 1
    bsums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    fp_expr = " | ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(bits)
    )
    chunk_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {bi} AS band, (simhash >> {bi * width}) & {mask} AS chunk "
        "FROM fps"
        for bi in range(bands)
    )
    return f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok
),
bsum AS (
  SELECT doc_id,
         {bsums}
  FROM th GROUP BY doc_id
),
fps AS (SELECT doc_id, {fp_expr} AS simhash FROM bsum),
chunks AS (
  {chunk_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a
  JOIN chunks b ON a.band = b.band AND a.chunk = b.chunk
               AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, bit_count(xor(fa.simhash, fb.simhash)) AS hamming
FROM cand c
JOIN fps fa ON c.doc_a = fa.doc_id
JOIN fps fb ON c.doc_b = fb.doc_id
WHERE bit_count(xor(fa.simhash, fb.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
""".strip()


# ------------------------------------------------------------- clustering

def dedup_clusters(
    documents: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, cluster, keep) — the dedup DECISION, not just the pairs:
    connected components over the verified near-dup pair graph, with the
    min doc_id of each cluster kept as the representative.

    This is the standard corpus-dedup shape (pairs alone don't say which
    doc to drop — a chain a~b~c must keep exactly one even though (a, c)
    never matched). Composes the LSH pipeline with the hash-min
    components operator: both stages are the engine's own scale paths
    (banded bucket join; O(log d) pointer-jumping supersteps), so the
    cluster assignment inherits their 100×-scale properties. Docs with
    no near-dup form singleton clusters (cluster = own id, keep = true).
    """
    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.components import connected_components

    # materialize the (tiny) verified pair set before handing it to the
    # iterative CC operator — its supersteps would otherwise re-derive
    # the whole LSH lineage (shingle → signature → bucket join →
    # verify) on every pointer-jumping round; eager localCheckpoint so
    # nothing is left pinned after the frames go out of scope
    pairs = minhash_dedup(
        documents, threshold, num_hashes, bands, n, hash_mode
    ).localCheckpoint(eager=True)
    pair_graph = Graph.from_undirected_edges(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    comp = connected_components(pair_graph)  # (id, component) — min id label
    return (
        documents.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster"),
            (F.coalesce("component", F.col("doc_id")) == F.col("doc_id"))
            .cast("int")
            .alias("keep"),  # int not bool: engine-portable value hashing
        )
    )


def dedup_clusters_oracle_sql(
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
) -> str:
    """DuckDB twin of ``dedup_clusters``: the full md5 LSH pipeline
    (minhash_oracle_sql's CTEs) + a recursive min-label closure over the
    verified pairs — same clusters, same representatives."""
    pair_sql = minhash_oracle_sql(threshold, num_hashes, bands, n)
    # strip the trailing SELECT (everything after the final CTE) and
    # rebuild on top of `verified`
    body = pair_sql[: pair_sql.rindex("SELECT doc_a")]
    return f"""
WITH RECURSIVE {body.removeprefix("WITH ").rstrip().rstrip(",")},
pairs AS (
  SELECT doc_a, doc_b FROM verified WHERE jaccard >= {threshold}
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(id, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.b, r.l FROM reach r JOIN sym s ON s.a = r.id
),
clus AS (SELECT id AS doc_id, MIN(l) AS cluster FROM reach GROUP BY id)
SELECT doc_id, cluster, CAST(doc_id = cluster AS INTEGER) AS keep
FROM clus ORDER BY doc_id
""".strip()
