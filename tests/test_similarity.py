"""Similarity search: GEMM and LSH modes vs the SQL brute-force
baseline and a direct numpy computation."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.similarity import (
    cosine_topk_gemm,
    cosine_topk_sql,
    embedding_near_duplicates,
    lsh_topk,
)

from tests.conftest import SF_MED


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF_MED}/embeddings.parquet").limit(200).persist()
    df.count()
    yield df
    df.unpersist()


def np_topk(pdf, k=5):
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    out = {}
    for i, q in enumerate(ids):
        order = sorted(
            ((float(sims[i, j]), int(ids[j])) for j in range(len(ids)) if j != i),
            key=lambda t: (-t[0], t[1]),
        )
        out[int(q)] = [(nid, cos) for cos, nid in order[:k]]
    return out


def test_cosine_topk_sql_vs_numpy(spark, embeddings):
    exp = np_topk(embeddings.toPandas(), k=5)
    got = {}
    for r in cosine_topk_sql(embeddings, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rk, r.neighbor_id, r.cos))
    for q, rows in got.items():
        rows.sort()
        for (rk, nid, cos), (enid, ecos) in zip(rows, exp[q]):
            assert nid == enid
            assert cos == pytest.approx(ecos, abs=1e-5)


def test_gemm_matches_sql(spark, embeddings):
    a = {(r.query_id, r.rk): (r.neighbor_id, r.cos)
         for r in cosine_topk_sql(embeddings, k=5).collect()}
    b = {(r.query_id, r.rk): (r.neighbor_id, r.cos)
         for r in cosine_topk_gemm(embeddings, k=5).collect()}
    assert set(a) == set(b)
    for key in a:
        assert a[key][0] == b[key][0]
        assert a[key][1] == pytest.approx(b[key][1], abs=1e-6)


def test_lsh_recall_clustered(spark):
    """LSH recall@1 on clustered data (its design regime: near
    neighbors at small angles). On uniform random vectors the true NN
    is near-orthogonal and *no* hyperplane LSH can find it — that case
    is covered by the brute-force modes instead."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(20):
        center = rng.standard_normal(64)
        center /= np.linalg.norm(center)
        for _ in range(10):
            # per-component σ=0.03 → noise norm ≈ 0.24 ≪ ‖center‖=1,
            # i.e. intra-cluster cosine ≈ 0.97 (genuinely clustered)
            v = center + 0.03 * rng.standard_normal(64)
            rows.append((vid, v.astype("float32").tolist(), c))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    truth = {r.query_id: r.neighbor_id for r in cosine_topk_sql(df, k=1).collect()}
    got = {r.query_id: r.neighbor_id
           for r in lsh_topk(df, k=1, n_planes=8, n_tables=8).collect()}
    hits = sum(1 for q in truth if got.get(q) == truth[q])
    assert hits / len(truth) > 0.9, f"recall@1 = {hits/len(truth):.2f}"


def test_embedding_near_duplicates(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(64)
    rows = [
        (0, (base).astype("float32").tolist(), 0),
        (1, (base + 0.01 * rng.standard_normal(64)).astype("float32").tolist(), 0),
        (2, rng.standard_normal(64).astype("float32").tolist(), 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r.vec_a, r.vec_b): r.cos
             for r in embedding_near_duplicates(df, threshold=0.95).collect()}
    assert (0, 1) in pairs
    assert all(k == (0, 1) for k in pairs)


def test_gemm_query_collect_guard(embeddings):
    with pytest.raises(ValueError, match="lsh_topk"):
        cosine_topk_gemm(embeddings, max_query_rows=3).count()


def test_lsh_numpy_method_recall_clustered(spark):
    """The Gaussian/numpy bucketizer (legacy method) must keep its
    recall in the clustered regime now that 'expr' is the default."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(20):
        center = rng.standard_normal(64)
        center /= np.linalg.norm(center)
        for _ in range(10):
            v = center + 0.03 * rng.standard_normal(64)
            rows.append((vid, v.astype("float32").tolist(), c))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    truth = {r.query_id: r.neighbor_id for r in cosine_topk_sql(df, k=1).collect()}
    got = {r.query_id: r.neighbor_id
           for r in lsh_topk(df, k=1, n_planes=8, n_tables=8,
                             method="numpy").collect()}
    hits = sum(1 for q in truth if got.get(q) == truth[q])
    assert hits / len(truth) > 0.9, f"recall@1 = {hits/len(truth):.2f}"


def _clustered_df(spark, seed=11, n_clusters=20, per=10, sigma=0.03):
    rng = np.random.default_rng(seed)
    rows, vid = [], 0
    for c in range(n_clusters):
        center = rng.standard_normal(64)
        center /= np.linalg.norm(center)
        for _ in range(per):
            v = center + sigma * rng.standard_normal(64)
            rows.append((vid, v.astype("float32").tolist(), c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_ivf_recall_clustered(spark):
    """IVF recall@1 in its design regime (clustered data): with
    n_cells ≈ n_clusters and nprobe=2 the true NN shares a probed cell
    almost surely."""
    from centrality_gpu_spark.operators.similarity import ivf_topk

    df = _clustered_df(spark)
    truth = {r.query_id: r.neighbor_id for r in cosine_topk_sql(df, k=1).collect()}
    got = {r.query_id: r.neighbor_id
           for r in ivf_topk(df, k=1, n_cells=16, nprobe=2).collect()}
    hits = sum(1 for q in truth if got.get(q) == truth[q])
    assert hits / len(truth) > 0.9, f"recall@1 = {hits/len(truth):.2f}"


def test_ivf_deterministic_and_bounded(spark):
    """Same input twice → identical results (hash sample + fixed init,
    no RNG at assign time); candidate set ≤ nprobe/n_cells fraction."""
    from centrality_gpu_spark.operators.similarity import ivf_topk, train_ivf_centroids

    df = _clustered_df(spark, seed=5)
    a = sorted(map(tuple, ivf_topk(df, k=3, n_cells=8, nprobe=2).collect()))
    b = sorted(map(tuple, ivf_topk(df, k=3, n_cells=8, nprobe=2).collect()))
    assert a == b
    cent = train_ivf_centroids(df, n_cells=8)
    assert cent.shape == (8, 64)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)


def test_ivf_oracle_parity(spark):
    """ivf_topk vs its DuckDB twin (ivf_oracle_sql) on the real
    embeddings table — the full pipeline: md5-ordered sample,
    first-n init, unrolled Lloyd, nprobe probing, exact re-rank."""
    import duckdb

    from centrality_gpu_spark.operators.similarity import (
        ivf_oracle_sql,
        ivf_topk,
    )

    df = spark.read.parquet(f"{SF_MED}/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    got = sorted(tuple(r) for r in ivf_topk(df, k=5, n_cells=8, nprobe=2).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{SF_MED}/embeddings.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            ivf_oracle_sql(k=5, n_cells=8, nprobe=2, where="vec_id < 200")
        ).fetchall()
    )
    assert got == want


def test_kmeans_assign_matches_numpy_reference(spark):
    """Public kmeans_assign == train centroids + argmax assignment done
    entirely in numpy on the collected corpus."""
    import numpy as np

    from centrality_gpu_spark.operators.similarity import (
        kmeans_assign,
        train_ivf_centroids,
    )

    df = spark.read.parquet(f"{SF_MED}/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    got = {r.vec_id: r.cluster for r in kmeans_assign(df, n_cells=8).collect()}
    cent = train_ivf_centroids(df, 8)
    pdf = df.select("vec_id", "embedding").toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    exp = dict(
        zip(pdf["vec_id"].to_numpy(), np.argmax(mat @ cent.T, axis=1))
    )
    assert got == exp
    assert set(got.values()) <= set(range(8))
    # deterministic across invocations
    again = {r.vec_id: r.cluster for r in kmeans_assign(df, n_cells=8).collect()}
    assert again == got


def test_semantic_near_duplicates_clustered(spark):
    """SemDeDup on planted clusters: the output must be EXACTLY the
    co-cell >=tau pair set (the operator's contract), with cosines
    matching numpy, and must recover at least one full planted
    cluster's pairs (recall floor — the semantic cells exist to give
    the tau filter high within-bucket yield)."""
    from centrality_gpu_spark.operators.similarity import (
        kmeans_assign,
        semantic_near_duplicates,
    )

    rng = np.random.default_rng(23)
    rows = []
    vid = 0
    for c in range(4):
        center = rng.standard_normal(64)
        center /= np.linalg.norm(center)
        for _ in range(6):
            v = center + 0.02 * rng.standard_normal(64)
            rows.append((vid, v.astype("float32").tolist(), c))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    tau = 0.9
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    cells = {r.vec_id: r.cluster
             for r in kmeans_assign(df, n_cells=4).collect()}
    expected = {
        (i, j): sims[i, j]
        for i in range(vid)
        for j in range(i + 1, vid)
        if round(sims[i, j], 6) >= tau and cells[i] == cells[j]
    }

    got = {
        (r.vec_id_a, r.vec_id_b): r.cos
        for r in semantic_near_duplicates(df, tau=tau, n_cells=4).collect()
    }
    assert set(got) == set(expected)
    for k, cos in got.items():
        assert cos == pytest.approx(expected[k], abs=1e-5)
    # recall floor: >=2 of the 4 planted clusters land intact in one
    # cell each (15 pairs per intact cluster of 6)
    assert len(got) >= 30


def test_semantic_near_duplicates_no_cross_cell_pairs(spark, embeddings):
    """Pairs only ever form within a cell, and every reported pair
    clears tau — the per-cell join is the contract that keeps the
    pair join sub-quadratic at scale."""
    from centrality_gpu_spark.operators.similarity import (
        kmeans_assign,
        semantic_near_duplicates,
    )

    cells = {r.vec_id: r.cluster
             for r in kmeans_assign(embeddings, n_cells=8).collect()}
    out = semantic_near_duplicates(embeddings, tau=0.2, n_cells=8).collect()
    assert out, "tau=0.2 on sf0.01 embeddings should yield pairs"
    for r in out:
        assert r.vec_id_a < r.vec_id_b
        assert cells[r.vec_id_a] == cells[r.vec_id_b] == r.cluster
        assert r.cos >= 0.2


# ------------------------------------------------------------ kNN graph

from centrality_gpu_spark.operators.similarity import (
    embedding_clusters,
    embedding_clusters_oracle_sql,
    knn_graph,
    knn_graph_oracle_sql,
)

KNN_KW = dict(k=10, n_planes=8, n_tables=6)


def test_knn_graph_structure(spark, embeddings):
    union = knn_graph(embeddings, **KNN_KW)
    mutual = knn_graph(embeddings, mutual=True, **KNN_KW)
    u = {(r.src, r.dst): r.cos for r in union.collect()}
    m = {(r.src, r.dst): r.cos for r in mutual.collect()}
    assert len(u) > 0 and len(m) > 0
    # src < dst, one row per pair, mutual edge-set is a subset of union
    assert all(a < b for a, b in u)
    assert set(m) < set(u)
    assert all(u[p] == m[p] for p in m)
    # every mutual edge means BOTH endpoints ranked the other in top-k:
    # check via the underlying top-k lists
    from centrality_gpu_spark.operators.similarity import lsh_topk

    top = lsh_topk(embeddings, k=10, n_planes=8, n_tables=6)
    lists = {(r.query_id, r.neighbor_id) for r in top.collect()}
    for a, b in m:
        assert (a, b) in lists and (b, a) in lists
    for a, b in set(u) - set(m):
        assert ((a, b) in lists) != ((b, a) in lists)


def test_embedding_clusters_partition(spark, embeddings):
    cl = embedding_clusters(embeddings, threshold=0.3, **KNN_KW)
    rows = {r.vec_id: r.cluster for r in cl.collect()}
    assert len(rows) == embeddings.count()  # every vector labeled
    # cluster label = min member id
    by_cluster = {}
    for v, c in rows.items():
        by_cluster.setdefault(c, []).append(v)
    assert all(c == min(vs) for c, vs in by_cluster.items())
    # edges with cos >= threshold connect same-cluster endpoints
    strong = knn_graph(embeddings, **KNN_KW).where("cos >= 0.3")
    for r in strong.collect():
        assert rows[r.src] == rows[r.dst]


@pytest.mark.parametrize(
    "spark_fn,sql",
    [
        (
            lambda d: knn_graph(d, **KNN_KW),
            knn_graph_oracle_sql(
                k=10, n_planes=8, n_tables=6, where="vec_id < 200"
            ),
        ),
        (
            lambda d: knn_graph(d, mutual=True, **KNN_KW),
            knn_graph_oracle_sql(
                k=10, mutual=True, n_planes=8, n_tables=6,
                where="vec_id < 200",
            ),
        ),
        (
            lambda d: embedding_clusters(d, threshold=0.3, **KNN_KW),
            embedding_clusters_oracle_sql(
                threshold=0.3, k=10, n_planes=8, n_tables=6,
                where="vec_id < 200",
            ),
        ),
    ],
    ids=["knn_union", "knn_mutual", "embedding_clusters"],
)
def test_knn_oracle_parity(spark, spark_fn, sql):
    df = spark.read.parquet(f"{SF_MED}/embeddings.parquet").where(
        "vec_id < 200"
    )
    got = sorted(
        tuple(str(x) for x in row)
        for row in spark_fn(df).toPandas().itertuples(index=False, name=None)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{SF_MED}/embeddings.parquet')"
    )
    want = sorted(
        tuple(str(x) for x in row)
        for row in con.execute(sql).df().itertuples(index=False, name=None)
    )
    assert got == want


def test_neighbor_mean_semantics_and_parity(spark, embeddings):
    import numpy as np

    from centrality_gpu_spark.operators.similarity import (
        knn_graph,
        neighbor_mean_embedding,
        neighbor_mean_exploded,
        neighbor_mean_exploded_sql,
    )

    pooled = {
        r.vec_id: (r.n_nbrs, r.pooled)
        for r in neighbor_mean_embedding(embeddings, **KNN_KW).collect()
    }
    # numpy reference: mean of unit vectors over the symmetrized edges
    edges = knn_graph(embeddings, **KNN_KW).collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in embeddings.collect()
    }
    unit = {k: v / np.sqrt((v * v).sum()) for k, v in vecs.items()}
    nbrs = {}
    for r in edges:
        nbrs.setdefault(r.src, []).append(r.dst)
        nbrs.setdefault(r.dst, []).append(r.src)
    for vid, (n, arr) in pooled.items():
        if n == 0:
            assert arr is None and vid not in nbrs
            continue
        want = np.mean([unit[x] for x in sorted(nbrs[vid])], axis=0)
        assert n == len(nbrs[vid])
        assert np.allclose(np.asarray(arr), want, atol=1e-6)
    # exploded twin parity (bit-exact: same ascending-id fold order)
    got = sorted(
        tuple(str(x) for x in row)
        for row in neighbor_mean_exploded(embeddings, **KNN_KW)
        .toPandas().itertuples(index=False, name=None)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{SF_MED}/embeddings.parquet')"
    )
    want_rows = sorted(
        tuple(str(x) for x in row)
        for row in con.execute(
            neighbor_mean_exploded_sql(
                k=10, n_planes=8, n_tables=6, where="vec_id < 200"
            )
        ).df().itertuples(index=False, name=None)
    )
    assert got == want_rows
