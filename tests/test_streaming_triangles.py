"""Streaming triangle counting: batch-chunked accumulation must equal
the batch compact-forward count in any batch order, with duplicate
edges replayed across batches deduped."""

import shutil
import time

import networkx as nx
import numpy as np
import pytest

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.operators.triangles import triangle_count
from centrality_gpu_spark.streaming.triangles import (
    StreamingTriangles,
    run_triangles_stream,
)


def _random_edges(seed, n=30, m=120):
    nxg = nx.gnm_random_graph(n, m, seed=seed)
    return [(int(u), int(v)) for u, v in nxg.edges()]


def _batch_count(spark, edges):
    g = Graph.from_undirected_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )
    return triangle_count(g).collect()[0].n_triangles


@pytest.mark.parametrize("seed,perm_seed", [(4, None), (8, 17)])
def test_chunked_count_equals_batch(spark, seed, perm_seed):
    edges = _random_edges(seed)
    if perm_seed is not None:
        rng = np.random.default_rng(perm_seed)
        edges = [edges[i] for i in rng.permutation(len(edges))]
    exp = _batch_count(spark, edges)
    acc = StreamingTriangles(spark)
    for chunk in np.array_split(np.arange(len(edges)), 5):
        acc.update(
            spark.createDataFrame(
                [edges[i] for i in chunk], "src long, dst long"
            )
        )
    assert acc.total == exp


def test_all_new_and_mixed_triangles(spark):
    """Exercise every j-new-edges class: batch 1 = an all-new triangle
    (j=3); batch 2 closes a wedge with one new edge (j=1); batch 3 adds
    two edges of a fresh triangle onto an old edge (j=2)."""
    acc = StreamingTriangles(spark)
    acc.update(spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long"))
    assert acc.total == 1
    acc.update(spark.createDataFrame([(1, 4), (3, 4)], "src long, dst long"))
    # (1,3,4): new edges (1,4),(3,4) over old (1,3) — j=2
    assert acc.total == 2
    acc.update(spark.createDataFrame([(4, 5), (1, 5)], "src long, dst long"))
    # (1,4,5): new edges (4,5),(1,5) over old (1,4) — j=2
    assert acc.total == 3
    acc.update(spark.createDataFrame([(4, 2)], "src long, dst long"))
    # one new edge closes TWO old wedges: (1,2,4) via (1,2),(1,4) and
    # (2,3,4) via (2,3),(3,4) — both j=1
    assert acc.total == 5


def test_duplicate_and_reversed_edges_are_noops(spark):
    acc = StreamingTriangles(spark)
    acc.update(spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long"))
    assert acc.total == 1
    acc.update(spark.createDataFrame([(2, 1), (3, 1), (2, 3)], "src long, dst long"))
    assert acc.total == 1


def test_real_stream_equals_batch(spark, tmp_path):
    edges = _random_edges(12, n=20, m=80)
    exp = _batch_count(spark, edges)
    in_dir = str(tmp_path / "edges_in")
    half = len(edges) // 2
    for part in (edges[:half], edges[half:]):
        spark.createDataFrame(part, "src long, dst long").coalesce(
            1
        ).write.mode("append").parquet(in_dir)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    acc = StreamingTriangles(spark)
    q = run_triangles_stream(stream, acc, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert acc.total == exp
    shutil.rmtree(tmp_path, ignore_errors=True)
