"""Similarity search over the ``embeddings`` table
(vec_id:long, embedding:array<float>, label:int).

- ``cosine_topk_sql``: brute-force top-k, pure DataFrame higher-order
  functions (zip_with/aggregate dot products) — the oracle-checkable
  baseline (DuckDB: list_cosine_similarity).
- ``cosine_topk_gemm``: brute-force top-k, broadcast query matrix +
  per-partition numpy GEMM inside mapInPandas — the throughput
  baseline (vectorized BLAS beats per-row array ops ~100×).
- ``lsh_topk``: random-hyperplane LSH buckets → exact re-rank within
  bucket — the scale path (candidates ∝ bucket size, not corpus).
  Recall < 1 by design; measured in tests.
- ``embedding_near_duplicates``: cosine ≥ threshold pairs via the same
  LSH bucketing — embedding near-dup dedup.

At 100 TB the corpus side streams partition-by-partition against a
broadcast query set (or IVF cells). The one collect in this module is
the *query* matrix of ``cosine_topk_gemm`` — when no explicit query set
is given it defaults to the corpus itself, so a row-count guard
(``MAX_QUERY_COLLECT_ROWS``) refuses to silently pull a huge corpus to
the driver and points at ``lsh_topk`` instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def with_unit_vectors(embeddings: DataFrame) -> DataFrame:
    """(vec_id, unit: array<double>) — L2-normalized, JVM-side."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    n = _norm_col(v)
    unit = F.transform(v, lambda x: x / n)
    return embeddings.select("vec_id", unit.alias("unit"))


def cosine_topk_sql(
    embeddings: DataFrame, queries: DataFrame | None = None, k: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, cos, rk) — brute force, built-ins only.

    ``queries`` defaults to the corpus itself (self-join, excluding the
    identity pair). Deterministic tie-break: (cos desc, neighbor asc).
    """
    corpus = with_unit_vectors(embeddings)
    qs = with_unit_vectors(queries) if queries is not None else corpus
    q = qs.select(F.col("vec_id").alias("query_id"), F.col("unit").alias("qu"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("unit").alias("cu"))
    dot = F.aggregate(
        F.zip_with("qu", "cu", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )


MAX_QUERY_COLLECT_ROWS = 1_000_000


def cosine_topk_gemm(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    max_query_rows: int = MAX_QUERY_COLLECT_ROWS,
) -> DataFrame:
    """Same contract as cosine_topk_sql; numpy GEMM per corpus partition
    against a broadcast query matrix, partial top-k per partition
    (np.argpartition), final top-k via window. Shuffle = P·Q·k rows.

    The query side is collected and broadcast, so it must be small;
    ``queries=None`` means all-pairs over the corpus — guarded by
    ``max_query_rows`` so a big corpus errors with a pointer to
    ``lsh_topk`` instead of OOMing the driver."""
    spark = embeddings.sparkSession
    qdf = queries if queries is not None else embeddings
    n_q = qdf.count()
    if n_q > max_query_rows:
        side = "corpus (queries=None means all-pairs)" if queries is None else "query set"
        raise ValueError(
            f"cosine_topk_gemm would collect a {side} of {n_q} rows "
            f"(> {max_query_rows}); pass a small explicit `queries` DF, "
            "or use lsh_topk for approximate all-pairs at scale"
        )
    qpd = with_unit_vectors(qdf).toPandas()
    qids = qpd["vec_id"].to_numpy()
    qmat = np.stack(qpd["unit"].to_numpy())
    bq = spark.sparkContext.broadcast((qids, qmat))

    corpus = with_unit_vectors(embeddings)

    def gemm(batches):
        qids_, qmat_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["vec_id"].to_numpy()
            cmat = np.stack(pdf["unit"].to_numpy())
            sims = qmat_ @ cmat.T  # (Q, C)
            kk = min(k + 1, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(np.arange(len(qids_)), kk)
            ci = top.ravel()
            yield pd.DataFrame(
                {
                    "query_id": qids_[qi],
                    "neighbor_id": cids[ci],
                    "cos": sims[qi, ci],
                }
            )

    partial = corpus.mapInPandas(gemm, "query_id long, neighbor_id long, cos double")
    partial = partial.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )


def cosine_topk_oracle_sql(k: int = 5, where: str = "TRUE") -> str:
    """DuckDB twin of the brute-force top-k (same normalization, dot
    product in double, same (cos desc, neighbor asc) tie-break)."""
    return f"""
WITH src AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS embedding
  FROM embeddings WHERE {where}
),
unit AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN embedding])) FOR x IN embedding] AS u
  FROM src
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum([q.u[i] * c.u[i] FOR i IN range(1, len(q.u) + 1)]) AS cos
  FROM unit q JOIN unit c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rk
FROM ranked WHERE rk <= {k} ORDER BY query_id, rk
""".strip()


# ------------------------------------------------------------------- LSH

def random_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def signed_planes(dim: int, n_planes: int, table: int, seed: int = 7) -> list[list[float]]:
    """±1 hyperplanes derived from md5 — deterministic and
    engine-independent, so the *same* constants can be embedded as
    literals in both the Spark plan and the DuckDB oracle (random-sign
    projections are a standard cosine-LSH family)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"lsh:{seed}:{table}:{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _bucket_expr(emb_col, planes: list[list[float]]):
    """bucket = Σ_p (dot_p > 0)·2^p, dot as a *sequential* fold — the
    ±1 multiplies are exact and both engines sum left-to-right, so the
    sign (hence the bucket) is bit-identical to DuckDB's list_sum."""
    bits = []
    for p, row in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in row])
        prod = F.zip_with(emb_col, arr, lambda x, s: x.cast("double") * s)
        dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(
            F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    b = bits[0]
    for x in bits[1:]:
        b = b + x
    return b


def lsh_buckets_expr(
    embeddings: DataFrame, n_planes: int = 12, seed: int = 7, n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, table, bucket) — pure-codegen variant of lsh_buckets
    using the deterministic ±1 planes (oracle-checkable, no Python)."""
    if dim is None:
        dim = len(embeddings.select("embedding").first()["embedding"])
    tables_col = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                _bucket_expr(
                    F.col("embedding"), signed_planes(dim, n_planes, t, seed)
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return embeddings.select(
        "vec_id", F.explode(tables_col).alias("tb")
    ).select("vec_id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def lsh_buckets(
    embeddings: DataFrame, n_planes: int = 12, seed: int = 7, n_tables: int = 4
) -> DataFrame:
    """(vec_id, table, bucket) — sign-pattern bucket per hash table."""
    spark = embeddings.sparkSession
    dim = len(embeddings.select("embedding").first()["embedding"])
    planes = [random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    bp = spark.sparkContext.broadcast(planes)

    def bucketize(batches):
        planes_ = bp.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out_v, out_t, out_b = [], [], []
            for t, pl in enumerate(planes_):
                signs = (mat @ pl.T) > 0  # (N, n_planes)
                bits = signs @ (1 << np.arange(signs.shape[1]))
                out_v.append(pdf["vec_id"].to_numpy())
                out_t.append(np.full(len(pdf), t))
                out_b.append(bits)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_v),
                    "table": np.concatenate(out_t),
                    "bucket": np.concatenate(out_b),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        bucketize, "vec_id long, table int, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    method: str = "expr",
) -> DataFrame:
    """ANN top-k: candidates share an LSH bucket in ≥1 table, exact
    cosine re-rank. (query_id, neighbor_id, cos, rk).

    ``method='expr'`` (default): deterministic ±1 planes evaluated in
    whole-stage codegen — reproducible in DuckDB (``lsh_oracle_sql``).
    ``method='numpy'``: Gaussian planes via the Arrow bucketizer."""
    if method == "expr":
        b = lsh_buckets_expr(embeddings, n_planes, seed, n_tables).persist()
    else:
        b = lsh_buckets(embeddings, n_planes, seed, n_tables).persist()
    pa = b.select("table", "bucket", F.col("vec_id").alias("query_id"))
    pb = b.select("table", "bucket", F.col("vec_id").alias("neighbor_id"))
    cand = (
        pa.join(pb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    unit = with_unit_vectors(embeddings)
    dot = F.aggregate(
        F.zip_with("qu", "cu", lambda a, b_: a * b_), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        cand.join(unit.select(F.col("vec_id").alias("query_id"), F.col("unit").alias("qu")), "query_id")
        .join(unit.select(F.col("vec_id").alias("neighbor_id"), F.col("unit").alias("cu")), "neighbor_id")
        .select("query_id", "neighbor_id", dot.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 7,
    method: str = "expr",
) -> DataFrame:
    """(vec_a, vec_b, cos) — LSH candidates with exact cosine ≥ threshold."""
    top = lsh_topk(
        embeddings, k=50, n_planes=n_planes, n_tables=n_tables, seed=seed,
        method=method,
    )
    return (
        top.where((F.col("cos") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(
            F.col("query_id").alias("vec_a"),
            F.col("neighbor_id").alias("vec_b"),
            "cos",
        )
    )


# ------------------------------------------------- LSH oracle (DuckDB)

EMBED_DIM = 64  # testdata embeddings dimension (TESTDATA.md)


def _lsh_common_sql(
    n_planes: int, n_tables: int, seed: int, dim: int, where: str
) -> str:
    """Shared CTEs: literal ±1 planes → dots → buckets → candidates →
    exact-cosine scoring with the same sequential-fold dot products as
    the Spark expressions."""
    rows = []
    for t in range(n_tables):
        for p, row in enumerate(signed_planes(dim, n_planes, t, seed)):
            lst = "[" + ", ".join(f"{v:.1f}" for v in row) + "]"
            rows.append(f"({t}, {p}, {lst})")
    planes_values = ",\n    ".join(rows)
    return f"""
WITH src AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb
  FROM embeddings WHERE {where}
),
plane_defs AS (
  SELECT * FROM (VALUES
    {planes_values}
  ) pd(tbl, p, s)
),
dots AS (
  SELECT e.vec_id, pd.tbl, pd.p,
         list_sum([e.emb[i] * pd.s[i] FOR i IN range(1, {dim + 1})]) AS dot
  FROM src e CROSS JOIN plane_defs pd
),
buckets AS (
  SELECT vec_id, tbl,
         SUM(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END) AS bucket
  FROM dots GROUP BY vec_id, tbl
),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM buckets a
  JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
               AND a.vec_id <> b.vec_id
),
unit AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN emb])) FOR x IN emb] AS u
  FROM src
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_sum([q.u[i] * n.u[i] FOR i IN range(1, {dim + 1})]) AS cos
  FROM cand c
  JOIN unit q ON c.query_id = q.vec_id
  JOIN unit n ON c.neighbor_id = n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM scored
)""".strip()


def lsh_oracle_sql(
    k: int = 5, n_planes: int = 12, n_tables: int = 4, seed: int = 7,
    dim: int = EMBED_DIM, where: str = "TRUE",
) -> str:
    """DuckDB twin of ``lsh_topk(method='expr')`` — identical buckets
    (same literal planes, same fold order), identical re-rank."""
    return (
        _lsh_common_sql(n_planes, n_tables, seed, dim, where)
        + f"\nSELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rk"
        f"\nFROM ranked WHERE rk <= {k} ORDER BY query_id, rk"
    )


def embedding_near_dups_oracle_sql(
    threshold: float = 0.95, n_planes: int = 10, n_tables: int = 6,
    seed: int = 7, dim: int = EMBED_DIM, where: str = "TRUE",
) -> str:
    """DuckDB twin of ``embedding_near_duplicates(method='expr')``
    (k=50 re-rank, then the rounded-cos threshold and a<b filter, in
    that order — mirroring the Spark plan)."""
    return (
        _lsh_common_sql(n_planes, n_tables, seed, dim, where)
        + f"""
SELECT query_id AS vec_a, neighbor_id AS vec_b, ROUND(cos, 6) AS cos
FROM ranked
WHERE rk <= 50 AND ROUND(cos, 6) >= {threshold} AND query_id < neighbor_id
ORDER BY vec_a, vec_b"""
    )


# ---------------------------------------------------------------- IVF

IVF_MAX_TRAIN_ROWS = 200_000


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample_rows: int = IVF_MAX_TRAIN_ROWS,
    iterations: int = 5,
    seed: int = 7,
) -> np.ndarray:
    """(n_cells, dim) float64 unit centroids — spherical k-means on a
    bounded deterministic sample.

    The quantizer is a MODEL, not data: training pulls at most
    ``sample_rows`` hash-selected vectors to the driver (like the LSH
    planes, the model is then broadcast); the corpus itself is never
    collected. Deterministic end to end: hash-ordered sample, first
    ``n_cells`` sample vectors as init (k-means|| would add RNG for no
    testability win), fixed Lloyd iteration count, max-dot assignment
    with min-index tie-break. The sample order hashes with md5 (not
    xxhash64) so ``ivf_oracle_sql`` can reproduce it in DuckDB — the
    same trick as the MinHash/SimHash oracles.
    """
    pdf = (
        embeddings.select("vec_id", "embedding")
        .orderBy(
            F.md5((F.col("vec_id") + F.lit(seed)).cast("string")), "vec_id"
        )
        .limit(sample_rows)
        .toPandas()
    )
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    if len(mat) < n_cells:
        raise ValueError(f"need ≥ {n_cells} sample vectors, got {len(mat)}")
    cent = mat[:n_cells].copy()
    for _ in range(iterations):
        assign = np.argmax(mat @ cent.T, axis=1)  # argmax breaks ties low
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _ivf_assign(embeddings: DataFrame, cent_bc, nprobe: int) -> DataFrame:
    """(vec_id, cell) — each vector's ``nprobe`` nearest cells by
    cosine, via one GEMM per Arrow batch against the broadcast
    centroids."""

    def assign(batches):
        cent = cent_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            dots = mat @ cent.T  # (N, n_cells)
            top = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), nprobe),
                    "cell": top.ravel().astype(np.int32),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell int"
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    train_iterations: int = 5,
    seed: int = 7,
) -> DataFrame:
    """IVF ANN top-k: (query_id, neighbor_id, cos, rk).

    The inverted-file scale path next to ``lsh_topk``: corpus vectors
    live in their single nearest cell; each query probes its ``nprobe``
    nearest cells and re-ranks exactly within them. Candidate count per
    query ≈ nprobe·|corpus|/n_cells — tune n_cells ∝ √|corpus| and the
    cell join stays linear-ish; cell skew (popular regions of the
    embedding space) is handled by the session's AQE skew-join like the
    LSH bucket join. Self-search (query set = corpus), mirroring
    ``lsh_topk``; recall is measured in tests, not promised.
    """
    spark = embeddings.sparkSession
    cent = train_ivf_centroids(
        embeddings, n_cells, iterations=train_iterations, seed=seed
    )
    cent_bc = spark.sparkContext.broadcast(cent)
    corpus_cells = _ivf_assign(embeddings, cent_bc, nprobe=1).persist()
    query_cells = (
        _ivf_assign(embeddings, cent_bc, nprobe=nprobe)
        if nprobe > 1
        else corpus_cells
    )
    cand = (
        query_cells.select("cell", F.col("vec_id").alias("query_id"))
        .join(corpus_cells.select("cell", F.col("vec_id").alias("neighbor_id")), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    unit = with_unit_vectors(embeddings)
    dot = F.aggregate(
        F.zip_with("qu", "cu", lambda a, b_: a * b_), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        cand.join(unit.select(F.col("vec_id").alias("query_id"), F.col("unit").alias("qu")), "query_id")
        .join(unit.select(F.col("vec_id").alias("neighbor_id"), F.col("unit").alias("cu")), "neighbor_id")
        .select("query_id", "neighbor_id", dot.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )


# ------------------------------------------------- IVF oracle (DuckDB)


def kmeans_assign(
    embeddings: DataFrame,
    n_cells: int = 8,
    iterations: int = 5,
    seed: int = 7,
) -> DataFrame:
    """(vec_id, cluster) — spherical k-means cluster of every corpus
    vector: the IVF quantizer exposed as a first-class curation
    operator (semantic bucketing for dedup-by-cluster, per-cluster
    stratified sampling, corpus composition reports). Training pulls a
    bounded deterministic sample to the driver (see
    ``train_ivf_centroids``); assignment is one broadcast GEMM per
    Arrow batch over the full corpus — nothing corpus-sized ever
    leaves the executors."""
    spark = embeddings.sparkSession
    cent = train_ivf_centroids(
        embeddings, n_cells, iterations=iterations, seed=seed
    )
    cent_bc = spark.sparkContext.broadcast(cent)
    return _ivf_assign(embeddings, cent_bc, nprobe=1).select(
        "vec_id", F.col("cell").alias("cluster")
    )


def _kmeans_ctes(
    n_cells: int,
    iterations: int,
    seed: int,
    sample_rows: int,
    dim: int,
    where: str,
) -> list[str]:
    """Shared CTE chain: md5-ordered sample → first-``n_cells`` init →
    ``iterations`` unrolled Lloyd steps → ``corpus_cells(vec_id,
    cell)`` (every vector's single nearest final centroid)."""
    dot_sv = f"list_sum([s.v[i] * c.v[i] FOR i IN range(1, {dim + 1})])"
    dot_uv = f"list_sum([u.v[i] * c.v[i] FOR i IN range(1, {dim + 1})])"
    parts = [
        f"""
WITH src AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb
  FROM embeddings WHERE {where}
),
u AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN emb])) FOR x IN emb] AS v
  FROM src
),
samp AS (
  SELECT vec_id, v FROM (
    SELECT vec_id, v,
           ROW_NUMBER() OVER (
             ORDER BY md5(CAST(vec_id + {seed} AS VARCHAR)), vec_id
           ) AS rk
    FROM u
  ) WHERE rk <= {sample_rows}
),
cent0 AS (
  SELECT rk - 1 AS cell, v FROM (
    SELECT v, ROW_NUMBER() OVER (
      ORDER BY md5(CAST(vec_id + {seed} AS VARCHAR)), vec_id
    ) AS rk FROM u
  ) WHERE rk <= {n_cells}
)""".strip()
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f"""assign{i} AS (
  SELECT vec_id, v, cell FROM (
    SELECT s.vec_id, s.v, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY {dot_sv} DESC, c.cell ASC
           ) AS r
    FROM samp s CROSS JOIN cent{p} c
  ) WHERE r = 1
),
sums{i} AS (
  SELECT cell, pos, SUM(val) AS sv FROM (
    SELECT cell, UNNEST(v) AS val, UNNEST(range(1, {dim + 1})) AS pos
    FROM assign{i}
  ) GROUP BY cell, pos
),
newc{i} AS (
  SELECT cell, list(sv ORDER BY pos) AS s FROM sums{i} GROUP BY cell
),
cent{i} AS (
  SELECT c.cell,
         CASE WHEN n.cell IS NULL THEN c.v
              ELSE [x / greatest(sqrt(list_sum([y * y FOR y IN n.s])), 1e-12)
                    FOR x IN n.s]
         END AS v
  FROM cent{p} c LEFT JOIN newc{i} n ON c.cell = n.cell
)"""
        )
    parts.append(
        f"""corpus_cells AS (
  SELECT vec_id, cell FROM (
    SELECT u.vec_id, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY u.vec_id
             ORDER BY {dot_uv} DESC, c.cell ASC
           ) AS r
    FROM u CROSS JOIN cent{iterations} c
  ) WHERE r = 1
)"""
    )
    return parts


def kmeans_oracle_sql(
    n_cells: int = 8,
    iterations: int = 5,
    seed: int = 7,
    sample_rows: int = IVF_MAX_TRAIN_ROWS,
    dim: int = EMBED_DIM,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of ``kmeans_assign``. Output (vec_id, cluster)
    ordered by vec_id."""
    parts = _kmeans_ctes(n_cells, iterations, seed, sample_rows, dim, where)
    return (
        ",\n".join(parts)
        + "\nSELECT vec_id, CAST(cell AS INTEGER) AS cluster"
        + "\nFROM corpus_cells ORDER BY vec_id"
    )


def ivf_oracle_sql(
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    iterations: int = 5,
    seed: int = 7,
    sample_rows: int = IVF_MAX_TRAIN_ROWS,
    dim: int = EMBED_DIM,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of ``ivf_topk`` — the full pipeline in SQL: the
    md5-ordered training sample, first-``n_cells`` init, ``iterations``
    unrolled Lloyd steps (assign = max-dot / min-cell tie-break; update
    = per-dim mean renormalized, empty cells keep their previous
    centroid), nprobe-cell probing, exact-cosine re-rank.

    Float parity note: the engine's training/assignment dots run
    through numpy BLAS (pairwise summation) while SQL folds
    sequentially — identical to ~1e-15, which only matters on exact
    argmax ties; the *scored* cosine uses the same sequential fold as
    the Spark ``aggregate`` expression (proven by the ann_topk/ann_lsh
    oracles) and is rounded to 6 dp on both sides.
    """
    parts = _kmeans_ctes(n_cells, iterations, seed, sample_rows, dim, where)
    dot_uv = f"list_sum([u.v[i] * c.v[i] FOR i IN range(1, {dim + 1})])"
    parts.append(
        f"""query_cells AS (
  SELECT vec_id, cell FROM (
    SELECT u.vec_id, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY u.vec_id
             ORDER BY {dot_uv} DESC, c.cell ASC
           ) AS r
    FROM u CROSS JOIN cent{iterations} c
  ) WHERE r <= {nprobe}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM query_cells q
  JOIN corpus_cells b ON q.cell = b.cell AND q.vec_id <> b.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_sum([q.v[i] * n.v[i] FOR i IN range(1, {dim + 1})]) AS cos
  FROM cand c
  JOIN u q ON c.query_id = q.vec_id
  JOIN u n ON c.neighbor_id = n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM scored
)"""
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rk"
        f"\nFROM ranked WHERE rk <= {k} ORDER BY query_id, rk"
    )


# --------------------------------------------------------------- SemDeDup

def semantic_near_duplicates(
    embeddings: DataFrame,
    tau: float = 0.7,
    n_cells: int = 8,
    iterations: int = 5,
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """(vec_id_a, vec_id_b, cluster, cos) — SemDeDup-style semantic
    near-duplicate pairs (Abbas et al. 2023): spherical k-means buckets
    the corpus into ``n_cells`` semantic cells, then exact pairwise
    cosine runs ONLY within each cell and keeps pairs with
    ``cos ≥ tau``.

    The cluster step is what makes this the 100 TB shape: the pair join
    is per-cell (Σ|c|² work instead of |corpus|², and each cell is an
    independent join partition), with ``n_cells`` scaled so cells stay
    task-sized — the same cost argument as the LSH/IVF buckets, but
    with semantically meaningful cells so the τ filter has high
    within-bucket yield. Everything JVM-side except the broadcast-GEMM
    cell assignment; nothing corpus-sized reaches the driver.

    Feed the output to ``operators.dedup.dedup_clusters`` to turn pairs
    into keep/drop decisions (min-id representative per dup group).
    """
    clusters = kmeans_assign(
        embeddings, n_cells=n_cells, iterations=iterations, seed=seed
    )
    unit = with_unit_vectors(embeddings).join(clusters, "vec_id")
    a = unit.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_id_a"),
        F.col("unit").alias("ua"),
    )
    b = unit.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_id_b"),
        F.col("unit").alias("ub"),
    )
    dot = F.aggregate(
        F.zip_with("ua", "ub", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "cluster")
        .where(F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            "cluster",
            F.round(dot, round_digits).alias("cos"),
        )
        .where(F.col("cos") >= tau)
    )


def semantic_near_dups_oracle_sql(
    tau: float = 0.7,
    n_cells: int = 8,
    iterations: int = 5,
    seed: int = 7,
    sample_rows: int = IVF_MAX_TRAIN_ROWS,
    dim: int = EMBED_DIM,
    round_digits: int = 6,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of ``semantic_near_duplicates``: the shared unrolled
    k-means CTE chain → within-cell pairs → same double dot product →
    identical τ filter after ROUND. Output ordered (vec_id_a,
    vec_id_b)."""
    parts = _kmeans_ctes(n_cells, iterations, seed, sample_rows, dim, where)
    return (
        ",\n".join(parts)
        + f""",
pairs AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         CAST(a.cell AS INTEGER) AS cluster,
         ROUND(list_sum([ua.v[i] * ub.v[i] FOR i IN range(1, {dim + 1})]),
               {round_digits}) AS cos
  FROM corpus_cells a
  JOIN corpus_cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN u ua ON ua.vec_id = a.vec_id
  JOIN u ub ON ub.vec_id = b.vec_id
)
SELECT vec_id_a, vec_id_b, cluster, cos
FROM pairs WHERE cos >= {tau}
ORDER BY vec_id_a, vec_id_b"""
    )


# ------------------------------------------------------------ kNN graph

def knn_graph(
    embeddings: DataFrame,
    k: int = 10,
    mutual: bool = False,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    method: str = "expr",
) -> DataFrame:
    """(src, dst, cos) — the undirected kNN GRAPH over the embedding
    corpus: an edge per pair where at least one endpoint lists the other
    in its ANN top-k (``mutual=True`` demands both — the classic
    mutual-kNN sparsifier that keeps hub vectors from gluing clusters
    together). src < dst, one row per pair.

    This is the bridge from the embedding half of the engine into the
    graph half: the output feeds Graph.from_undirected_edges and from
    there every graph operator (components = clusters, degrees = local
    density, betweenness = boundary docs, ...). Built on ``lsh_topk``,
    so the construction cost is the bucketed ANN pass — never the N²
    all-pairs join.
    """
    top = lsh_topk(embeddings, k, n_planes, n_tables, seed, method)
    e = top.select(
        F.least("query_id", "neighbor_id").alias("src"),
        F.greatest("query_id", "neighbor_id").alias("dst"),
        "cos",
    )
    # cos is symmetric (same rounded dot both directions): max = the value
    agg = e.groupBy("src", "dst").agg(
        F.count("*").alias("n_dir"), F.max("cos").alias("cos")
    )
    if mutual:
        agg = agg.where(F.col("n_dir") == 2)
    return agg.select("src", "dst", "cos")


def knn_graph_oracle_sql(
    k: int = 10,
    mutual: bool = False,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    dim: int = EMBED_DIM,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of ``knn_graph(method='expr')``."""
    mutual_pred = "WHERE n_dir = 2" if mutual else ""
    return (
        _lsh_common_sql(n_planes, n_tables, seed, dim, where)
        + f""",
e AS (
  SELECT LEAST(query_id, neighbor_id) AS src,
         GREATEST(query_id, neighbor_id) AS dst,
         ROUND(cos, 6) AS cos
  FROM ranked WHERE rk <= {k}
),
g AS (
  SELECT src, dst, COUNT(*) AS n_dir, MAX(cos) AS cos
  FROM e GROUP BY src, dst
)
SELECT src, dst, cos FROM g {mutual_pred} ORDER BY src, dst"""
    )


def embedding_clusters(
    embeddings: DataFrame,
    threshold: float = 0.5,
    k: int = 10,
    mutual: bool = False,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    method: str = "expr",
) -> DataFrame:
    """(vec_id, cluster) — connected components over the kNN graph
    restricted to edges with cos ≥ threshold; cluster = min vec_id
    (vectors with no qualifying edge form singletons).

    The graph-based sibling of ``semantic_near_duplicates``: instead of
    k-means cells, transitive closure over strong ANN edges — the
    standard agglomerative corpus-clustering step of an embedding-dedup
    pipeline. Both stages are the engine's own scale paths (bucketed
    ANN + pointer-jumping CC).
    """
    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.operators.components import connected_components

    edges = knn_graph(
        embeddings, k, mutual, n_planes, n_tables, seed, method
    ).where(F.col("cos") >= threshold)
    comp = connected_components(
        Graph.from_undirected_edges(edges.select("src", "dst"))
    )
    return (
        embeddings.select("vec_id")
        .join(comp.withColumnRenamed("id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).alias("cluster"),
        )
    )


def embedding_clusters_oracle_sql(
    threshold: float = 0.5,
    k: int = 10,
    mutual: bool = False,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    dim: int = EMBED_DIM,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of ``embedding_clusters``: the knn_graph CTEs + a
    recursive min-label closure over the thresholded edges."""
    mutual_pred = "AND n_dir = 2" if mutual else ""
    common = _lsh_common_sql(n_planes, n_tables, seed, dim, where)
    assert common.startswith("WITH ")
    return (
        "WITH RECURSIVE "
        + common.removeprefix("WITH ")
        + f""",
e AS (
  SELECT LEAST(query_id, neighbor_id) AS src,
         GREATEST(query_id, neighbor_id) AS dst,
         ROUND(cos, 6) AS cos
  FROM ranked WHERE rk <= {k}
),
g AS (
  SELECT src, dst, COUNT(*) AS n_dir, MAX(cos) AS cos
  FROM e GROUP BY src, dst
),
pairs AS (SELECT src, dst FROM g WHERE cos >= {threshold} {mutual_pred}),
sym AS (
  SELECT src AS a, dst AS b FROM pairs
  UNION ALL SELECT dst, src FROM pairs
),
reach(id, l) AS (
  SELECT vec_id, vec_id FROM src
  UNION
  SELECT s.b, r.l FROM reach r JOIN sym s ON s.a = r.id
)
SELECT id AS vec_id, MIN(l) AS cluster FROM reach GROUP BY id
ORDER BY vec_id"""
    )


# ---------------------------------------- GNN-style mean aggregation

def neighbor_mean_embedding(
    embeddings: DataFrame,
    k: int = 10,
    mutual: bool = False,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    method: str = "expr",
    round_digits: int = 6,
) -> DataFrame:
    """(vec_id, n_nbrs, pooled) — one GraphSAGE-style mean-aggregation
    round over the kNN graph: each vector's pooled feature is the
    element-wise mean of its graph neighbors' UNIT vectors (vectors
    with no kNN edge get n_nbrs = 0 and a NULL pooled).

    Float determinism: neighbor vectors are folded in ascending
    neighbor-id order (collect → array_sort → one F.aggregate fold), so
    the sums are bit-identical run to run AND engine to engine — the
    DuckDB twin folds in the same order. That is what makes a float
    aggregation over an unordered groupBy oracle-checkable.

    Scale shape: the kNN edges come from the bucketed ANN pass; the
    aggregation is one groupBy(vec_id) whose per-group state is k
    vectors (bounded by construction). The sorted fold is O(k·dim)
    per vertex, all JVM-side.
    """
    edges = knn_graph(embeddings, k, mutual, n_planes, n_tables, seed, method)
    sym = edges.select(
        F.col("src").alias("vec_id"), F.col("dst").alias("nbr")
    ).unionByName(
        edges.select(F.col("dst").alias("vec_id"), F.col("src").alias("nbr"))
    )
    unit = with_unit_vectors(embeddings).select(
        F.col("vec_id").alias("nbr"), F.col("unit").alias("nvec")
    )
    gathered = sym.join(unit, "nbr").groupBy("vec_id").agg(
        F.count("*").alias("n_nbrs"),
        F.array_sort(
            F.collect_list(F.struct(F.col("nbr"), F.col("nvec")))
        ).alias("nbrs"),
    )
    dim_expr = F.size(F.element_at(F.col("nbrs"), 1)["nvec"])
    zero = F.transform(
        F.sequence(F.lit(1), dim_expr), lambda _: F.lit(0.0)
    )
    summed = F.aggregate(
        F.col("nbrs"),
        zero,
        lambda acc, s: F.zip_with(acc, s["nvec"], lambda a, b: a + b),
    )
    pooled = F.transform(
        summed, lambda x: F.round(x / F.col("n_nbrs"), round_digits)
    )
    out = gathered.select(
        "vec_id", F.col("n_nbrs").cast("long").alias("n_nbrs"),
        pooled.alias("pooled"),
    )
    return (
        embeddings.select("vec_id")
        .join(out, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("n_nbrs", F.lit(0)).cast("long").alias("n_nbrs"),
            "pooled",
        )
    )


def neighbor_mean_oracle_sql(
    k: int = 10,
    mutual: bool = False,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    dim: int = EMBED_DIM,
    where: str = "TRUE",
    round_digits: int = 6,
) -> str:
    """DuckDB twin of ``neighbor_mean_embedding`` — the same
    ascending-neighbor-id fold order (list_sort on (nbr, vec) structs,
    then an index-wise sum), so the double sums match bit for bit
    before rounding."""
    mutual_pred = "WHERE n_dir = 2" if mutual else ""
    return (
        _lsh_common_sql(n_planes, n_tables, seed, dim, where)
        + f""",
e AS (
  SELECT LEAST(query_id, neighbor_id) AS src,
         GREATEST(query_id, neighbor_id) AS dst
  FROM ranked WHERE rk <= {k}
),
g AS (
  SELECT src, dst, COUNT(*) AS n_dir FROM e GROUP BY src, dst
),
ke AS (SELECT src, dst FROM g {mutual_pred}),
sym AS (
  SELECT src AS vec_id, dst AS nbr FROM ke
  UNION ALL SELECT dst, src FROM ke
),
gath AS (
  SELECT s.vec_id, COUNT(*) AS n_nbrs,
         list_sort(list({{'nbr': s.nbr, 'nvec': u.u}})) AS nbrs
  FROM sym s JOIN unit u ON s.nbr = u.vec_id
  GROUP BY s.vec_id
),
pooled AS (
  SELECT vec_id, n_nbrs,
         [ROUND(list_sum([nbrs[j].nvec[i] FOR j IN range(1, len(nbrs) + 1)])
                / n_nbrs, {round_digits})
          FOR i IN range(1, {dim + 1})] AS pooled
  FROM gath
)
SELECT s.vec_id,
       CAST(COALESCE(p.n_nbrs, 0) AS BIGINT) AS n_nbrs,
       p.pooled
FROM src s LEFT JOIN pooled p USING (vec_id)
ORDER BY s.vec_id"""
    )


def neighbor_mean_exploded(
    embeddings: DataFrame, **kwargs
) -> DataFrame:
    """(vec_id, n_nbrs, pos, v) — ``neighbor_mean_embedding`` with the
    pooled vector exploded to one row per dimension (array cells
    stringify differently across engines, so the hash gate compares
    scalar rows; vectors with no neighbors contribute no rows)."""
    pooled = neighbor_mean_embedding(embeddings, **kwargs)
    return pooled.where(F.col("pooled").isNotNull()).select(
        "vec_id",
        "n_nbrs",
        F.posexplode("pooled").alias("pos", "v"),
    ).select("vec_id", "n_nbrs", F.col("pos").cast("long").alias("pos"), "v")


def neighbor_mean_exploded_sql(
    k: int = 10,
    mutual: bool = False,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    dim: int = EMBED_DIM,
    where: str = "TRUE",
    round_digits: int = 6,
) -> str:
    """DuckDB twin of ``neighbor_mean_exploded``."""
    base = neighbor_mean_oracle_sql(
        k, mutual, n_planes, n_tables, seed, dim, where, round_digits
    )
    cut = base.rindex("SELECT s.vec_id,")
    return (
        base[:cut]
        + f"""SELECT vec_id, CAST(n_nbrs AS BIGINT) AS n_nbrs,
       CAST(UNNEST(generate_series(1, {dim})) - 1 AS BIGINT) AS pos,
       UNNEST(pooled) AS v
FROM pooled
ORDER BY vec_id, pos"""
    )
