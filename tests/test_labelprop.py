"""Label propagation vs a small numpy reference of the identical
deterministic variant (self-vote, min-label tie-break)."""

import numpy as np

from centrality_gpu_spark.operators.labelprop import label_propagation
from centrality_gpu_spark.sources.edgelist import read_edge_list_local

from tests.conftest import SAMPLE_DIR, read_sample_edges


def np_lpa(edges, max_iter=20):
    ids = sorted({u for e in edges for u in e})
    nbrs = {v: set() for v in ids}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    labels = {v: v for v in ids}
    for _ in range(max_iter):
        new = {}
        for v in ids:
            votes = {}
            for u in list(nbrs[v]) + [v]:  # self-vote
                l = labels[u]
                votes[l] = votes.get(l, 0) + 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


def test_lpa_samples(spark, sample_name):
    g = read_edge_list_local(spark, f"{SAMPLE_DIR}/{sample_name}.txt")
    got = {r.id: r.label for r in label_propagation(g).collect()}
    assert got == np_lpa(read_sample_edges(sample_name))


def test_weighted_lpa_flips_majority(spark):
    """A heavy edge must outvote two light ones; unweighted LPA ties
    and breaks to the smallest label instead."""
    from centrality_gpu_spark.graph import Graph

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 3.0)], "src long, dst long, weight double"
    )
    g = Graph.from_undirected_edges(edges, weight_col="weight")
    unw = {
        r.id: r.label
        for r in label_propagation(g, max_iterations=1).collect()
    }
    wtd = {
        r.id: r.label
        for r in label_propagation(g, max_iterations=1, weighted=True).collect()
    }
    # vertex 2 sees votes {1: w1, 3: w3, self 2: 1}: unweighted ties
    # 1/2/3 -> smallest label 1; weighted -> 3 (w=3 beats 1)
    assert unw[2] == 1
    assert wtd[2] == 3
