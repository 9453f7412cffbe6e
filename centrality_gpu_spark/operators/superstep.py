"""The SpMV superstep primitive: partition-local CSR gather-scatter.

This is the engine's physical core (SURVEY.md §2.10 G13, §7 step 2) —
the Spark re-expression of the reference's CSR kernels: counting-sort
CSR build (``graph_ear_decompos.h:36-101``), edge-parallel gather
(``kernels_free.cu:288-336``) and atomic scatter-add
(``kernels_free.cu:301-304``).

Physical design, and why it scales:

- Edges are hash-partitioned ONCE into ``n_blocks`` buckets by ``src``
  and cached (``block_edges``). ``n_blocks`` equals
  ``spark.sql.shuffle.partitions`` so the cogroup below reuses the
  cached partitioning (exchange elimination) instead of reshuffling
  the edge table every superstep — the per-iteration shuffle volume is
  O(V) (the value vector + partial sums), never O(E).
- Each superstep cogroups the edge blocks with the co-partitioned
  value vector and runs a vectorized numpy kernel per block
  (``applyInPandas`` over cogrouped data — Arrow batches, no per-row
  Python): gather ``val[src]``, multiply per-edge, partial-aggregate
  by ``dst`` with ``np.bincount``. The partial aggregate is the
  map-side combine — the analog of the reference's intra-block atomics
  before the cross-block atomicAdd — so the final shuffle carries at
  most |distinct dst per block| rows.
- **Hub skew (power-law)**: a vertex with degree ≫ average would put
  all its edges in one bucket. Vertices above ``hub_threshold`` get
  their edges *salted* across buckets by ``hash(src,dst)`` and their
  value rows replicated to every bucket (hubs are few by definition,
  so replication is ≤ |hubs|·n_blocks rows ≈ broadcast-sized). This is
  explicit salting on top of AQE skew-join handling.
"""

from __future__ import annotations

import collections
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph


@dataclass
class BlockedEdges:
    """Edges hash-bucketed by src (salted for hubs), cached.

    ``edges`` has columns (block:int, src, dst, weight, src_degree).
    ``hubs`` is a small DF (id) of salted high-degree vertices.
    ``path`` (optional): directory holding the same edges written as
    ``block=N/`` parquet — enables the worker-cached CSR fast path
    (supersteps ship only the value vector, never the edges).
    """

    edges: DataFrame
    hubs: DataFrame
    n_blocks: int
    path: str | None = None

    def unpersist(self) -> None:
        self.edges.unpersist()


def block_edges(
    graph: Graph,
    n_blocks: int | None = None,
    hub_threshold: int | None = None,
    scratch_dir: str | None = None,
) -> BlockedEdges:
    """Bucket + cache the edge table for repeated supersteps.

    ``scratch_dir``: if given, additionally materialize the buckets as
    ``{scratch_dir}/block=N/*.parquet``. Python workers then build each
    block's CSR structures ONCE (on first touch), keep them in a
    process-local LRU (workers are long-lived, ``spark.python.worker
    .reuse``), and subsequent supersteps move only (id, val) rows over
    Arrow — the DataFrame analog of the reference keeping CSR resident
    on the GPU across sources (``kernels_free.cu:43-79``). On a
    cluster the dir must be shared storage (HDFS/S3/NFS); re-reads
    after cache misses are columnar parquet scans of one block.
    """
    spark = graph.spark
    if n_blocks is None:
        n_blocks = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if hub_threshold is None:
        # a vertex is a hub if its edges alone would fill ~1/4 of a block
        hub_threshold = 10_000

    deg = graph.degrees().select(
        F.col("id").alias("src"), F.col("degree").alias("src_degree")
    )
    e = graph.edges.join(deg, "src")
    is_hub = F.col("src_degree") > hub_threshold
    block = F.when(
        is_hub, F.pmod(F.xxhash64("src", "dst"), F.lit(n_blocks))
    ).otherwise(F.pmod(F.xxhash64("src"), F.lit(n_blocks))).cast("int")
    blocked = (
        e.select(block.alias("block"), "src", "dst", "weight", "src_degree")
        .repartition(n_blocks, "block")
        .persist()
    )
    hubs = (
        blocked.where(F.col("src_degree") > hub_threshold)
        .select(F.col("src").alias("id"))
        .distinct()
        .persist()
    )
    blocked.count()  # materialize cache
    path = None
    if scratch_dir is not None:
        path = os.path.join(scratch_dir, "edges_blocked")
        (
            blocked.select(
                "block", "src", "dst", "weight",
                (F.lit(1.0) / F.col("src_degree")).alias("src_inv_deg"),
            )
            .write.mode("overwrite")
            .partitionBy("block")
            .parquet(path)
        )
    return BlockedEdges(blocked, hubs, n_blocks, path)


# ---------------------------------------------------------------------------
# Worker-resident CSR block cache (the "device memory" of this engine).
# Keyed by (path, block); bounded LRU since Spark does not pin blocks to
# workers across stages.

_CSR_CACHE: "collections.OrderedDict[tuple, dict]" = collections.OrderedDict()
_CSR_CACHE_MAX = 64


def _load_csr_block(path: str, block: int) -> dict:
    key = (path, block)
    hit = _CSR_CACHE.get(key)
    if hit is not None:
        _CSR_CACHE.move_to_end(key)
        return hit
    import pyarrow.parquet as pq

    bdir = os.path.join(path, f"block={block}")
    if not os.path.isdir(bdir):
        blk = {"empty": True}
    else:
        t = pq.read_table(bdir, columns=["src", "dst", "weight", "src_inv_deg"])
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        w = t.column("weight").to_numpy()
        # dense local codes for src and dst: the per-block CSR relabel
        src_u, src_inv = np.unique(src, return_inverse=True)
        dst_u, dst_inv = np.unique(dst, return_inverse=True)
        blk = {
            "empty": len(src) == 0,
            "src_u": src_u,      # sorted unique srcs in this block
            "src_inv": src_inv,  # per-edge code into src_u
            "dst_u": dst_u,
            "dst_inv": dst_inv,
            "w": w.astype(np.float64),
            "inv_deg": t.column("src_inv_deg").to_numpy().astype(np.float64),
        }
    _CSR_CACHE[key] = blk
    if len(_CSR_CACHE) > _CSR_CACHE_MAX:
        _CSR_CACHE.popitem(last=False)
    return blk


def _route_values(blocked: BlockedEdges, values: DataFrame) -> DataFrame:
    """Co-partition the value vector with the edge buckets.

    Normal vertices go to their single bucket; hub vertices are
    replicated to all buckets (their edges are salted everywhere).
    """
    nb = blocked.n_blocks
    normal = values.join(blocked.hubs, "id", "left_anti").select(
        F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int").alias("block"),
        "id",
        "val",
    )
    all_blocks = blocked.edges.sparkSession.range(nb).select(
        F.col("id").cast("int").alias("block")
    )
    hub_vals = (
        values.join(blocked.hubs, "id").crossJoin(F.broadcast(all_blocks))
        .select("block", "id", "val")
    )
    return normal.unionByName(hub_vals)


def _spmv_kernel(key, edge_pdf: pd.DataFrame, val_pdf: pd.DataFrame,
                 weighted: bool = True,
                 divide_by_src_degree: bool = False) -> pd.DataFrame:
    """Per-block CSR gather-scatter in numpy (runs inside Arrow batches).

    gather: msg[e] = val[src[e]] * weight[e]   (weight ≡ 1 if unweighted)
    partial scatter-add by dst (map-side combine): np.bincount.
    """
    import numpy as np

    if len(edge_pdf) == 0 or len(val_pdf) == 0:
        return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                             "partial": pd.Series([], dtype="float64")})
    src = edge_pdf["src"].to_numpy()
    dst = edge_pdf["dst"].to_numpy()
    w = edge_pdf["weight"].to_numpy() if weighted else 1.0
    if divide_by_src_degree:
        w = w / edge_pdf["src_degree"].to_numpy()
    vid = val_pdf["id"].to_numpy()
    vval = val_pdf["val"].to_numpy(dtype="float64")

    # CSR-style gather: position of each edge's src in the value vector.
    order = np.argsort(vid, kind="stable")
    vid_sorted, vval_sorted = vid[order], vval[order]
    pos = np.searchsorted(vid_sorted, src)
    # guard: srcs without a value row contribute 0 (e.g. inactive frontier)
    valid = (pos < len(vid_sorted)) & (vid_sorted[np.minimum(pos, len(vid_sorted) - 1)] == src)
    msg = np.where(valid, vval_sorted[np.minimum(pos, len(vid_sorted) - 1)], 0.0) * w

    # partial aggregate by dst — the map-side combine
    dst_u, inv = np.unique(dst, return_inverse=True)
    partial = np.bincount(inv, weights=msg, minlength=len(dst_u))
    out = pd.DataFrame({"id": dst_u, "partial": partial})
    return out[out["partial"] != 0.0]


def spmv(
    blocked: BlockedEdges,
    values: DataFrame,
    weighted: bool = True,
    divide_by_src_degree: bool = False,
) -> DataFrame:
    """y = Aᵀ·x over the blocked edge table.

    ``values``: DF (id:long, val:double). Returns (id:long, msg:double)
    where msg(v) = Σ_{(u,v)∈E} val(u)·weight(u,v) (weight ≡ 1 when
    ``weighted=False``, e.g. PageRank). Vertices receiving nothing are
    absent (caller joins/coalesces as needed).

    Physical strategy: if the blocked edges were materialized to disk
    (``block_edges(..., scratch_dir=...)``), each superstep ships ONLY
    the routed value vector to Python; the edge block's CSR structures
    come from the worker-resident cache. Otherwise falls back to
    cogrouping edges+values (edges cross the Arrow boundary each call).
    """
    routed = _route_values(blocked, values)
    if blocked.path is not None:
        path = blocked.path

        def cached_kernel(key, val_pdf):
            blk = _load_csr_block(path, int(key[0]))
            if blk.get("empty") or len(val_pdf) == 0:
                return pd.DataFrame(
                    {"id": pd.Series([], dtype="int64"),
                     "partial": pd.Series([], dtype="float64")}
                )
            vid = val_pdf["id"].to_numpy()
            vval = val_pdf["val"].to_numpy(dtype="float64")
            # scatter incoming values onto this block's src slots
            src_u = blk["src_u"]
            lookup = np.zeros(len(src_u))
            pos = np.searchsorted(src_u, vid)
            ok = (pos < len(src_u)) & (src_u[np.minimum(pos, len(src_u) - 1)] == vid)
            lookup[pos[ok]] = vval[ok]
            msg = lookup[blk["src_inv"]]
            if weighted:
                msg = msg * blk["w"]
            if divide_by_src_degree:
                msg = msg * blk["inv_deg"]
            partial = np.bincount(
                blk["dst_inv"], weights=msg, minlength=len(blk["dst_u"])
            )
            nz = partial != 0.0
            return pd.DataFrame({"id": blk["dst_u"][nz], "partial": partial[nz]})

        partials = routed.groupBy("block").applyInPandas(
            cached_kernel, "id long, partial double"
        )
    else:

        def kernel(key, edge_pdf, val_pdf):
            return _spmv_kernel(
                key, edge_pdf, val_pdf,
                weighted=weighted, divide_by_src_degree=divide_by_src_degree,
            )

        partials = (
            blocked.edges.groupBy("block")
            .cogroup(routed.groupBy("block"))
            .applyInPandas(kernel, "id long, partial double")
        )
    return partials.groupBy("id").agg(F.sum("partial").alias("msg"))


def spmv_sql(
    graph: Graph,
    values: DataFrame,
    weighted: bool = True,
    divide_by_src_degree: bool = False,
) -> DataFrame:
    """Reference SQL-mode SpMV (pure DataFrame join+agg) for testing the
    CSR path against — Catalyst/Tungsten, no Python. Same contract.
    Uses the src-partitioned persisted edge copy so repeated calls
    (iterative algorithms) never re-shuffle the edge side; the hash
    aggregate does map-side partial sums before the exchange."""
    e = graph.edges_by_src()
    w = F.col("weight") if weighted else F.lit(1.0)
    if divide_by_src_degree:
        w = w * F.col("src_inv_deg")
    return (
        e.join(values, e.src == values.id)
        .select("dst", (F.col("val") * w).alias("m"))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("m").alias("msg"))
    )
