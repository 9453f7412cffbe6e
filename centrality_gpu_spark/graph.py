"""Canonical graph container: an undirected graph as a symmetrized edge DataFrame.

Data model (SURVEY.md §1): the reference stores an adjacency list with
every edge inserted in both directions (``graph.cpp:50-59``). Our
canonical form is the same fact as a DataFrame: ``edges(src:long,
dst:long, weight:double)`` with BOTH directions present, parallel edges
deduplicated (``make_ear_graph.cpp:155-196``) and self-loops removed
(``to_eargraph_construct.cpp:87``). Everything downstream (supersteps,
degrees, CSR blocks) assumes this invariant, so it is established once
in the constructors rather than re-checked per operator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

EDGE_COLS = ("src", "dst", "weight")


@dataclass
class Graph:
    """An undirected graph: symmetrized, dedup'd, self-loop-free edges.

    ``edges`` holds both (u,v) and (v,u); ``m`` counts *undirected*
    edges (edges.count() == 2*m); ``n`` counts vertices.
    Counts are computed lazily (they are actions).
    """

    edges: DataFrame
    _n: int | None = field(default=None, repr=False)
    _m: int | None = field(default=None, repr=False)

    # -- constructors -------------------------------------------------

    @classmethod
    def from_undirected_edges(cls, edges: DataFrame, weight_col: str | None = None) -> "Graph":
        """Canonicalize an arbitrary (src, dst[, weight]) DF.

        Symmetrize (P1), drop self-loops (P5), dedup parallel edges (P4).
        Dedup keeps the MIN weight per (src,dst) for determinism.
        """
        w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
        e = edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            w.alias("weight"),
        ).where(F.col("src") != F.col("dst"))
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
        dedup = sym.groupBy("src", "dst").agg(F.min("weight").alias("weight"))
        return cls(dedup)

    @classmethod
    def from_symmetric_edges(cls, edges: DataFrame) -> "Graph":
        """Wrap a DF already satisfying the canonical invariant (no checks)."""
        return cls(edges.select(*EDGE_COLS))

    # -- basic accessors ----------------------------------------------

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession

    def vertices(self) -> DataFrame:
        """Distinct vertex ids (column ``id``). Isolated vertices are not
        representable in an edge list — same as the reference."""
        return self.edges.select(F.col("src").alias("id")).distinct()

    def num_vertices(self) -> int:
        if self._n is None:
            self._n = self.vertices().count()
        return self._n

    def num_edges(self) -> int:
        """Undirected edge count (reference's ``m``, ``graph.cpp:29-36``)."""
        if self._m is None:
            self._m = self.edges.count() // 2
        return self._m

    def degrees(self) -> DataFrame:
        """Per-vertex degree (P2, ``graph.cpp:47-69``): (id, degree)."""
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("degree")
        )

    def degree_histogram(self) -> DataFrame:
        """Degree histogram (A6, ``graph_ear_decompos.h:112-129``)."""
        return self.degrees().groupBy("degree").agg(F.count("*").alias("cnt"))

    def max_degree_vertex(self) -> tuple[int, int]:
        """(vertex, degree) of the max-degree vertex — the reference's
        BFS-root pick (A7, ``graph_ear_decompos.h:88-100``); ties break
        to the smallest id for determinism."""
        row = self.degrees().agg(
            F.max_by("id", F.struct(F.col("degree"), (-F.col("id")).alias("n"))).alias("v"),
            F.max("degree").alias("d"),
        ).collect()[0]
        return int(row["v"]), int(row["d"])

    def min_degree_vertex(self) -> tuple[int, int]:
        """(vertex, degree) of the min-degree vertex — the reference's
        ear-graph BFS start pick (O6, ``make_ear_graph.cpp:198-201``);
        ties break to the smallest id."""
        row = self.degrees().agg(
            F.min_by("id", F.struct(F.col("degree"), F.col("id"))).alias("v"),
            F.min("degree").alias("d"),
        ).collect()[0]
        return int(row["v"]), int(row["d"])

    # -- caching -------------------------------------------------------

    def persist(self, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> "Graph":
        self.edges.persist(level)
        return self

    def unpersist(self) -> "Graph":
        self.edges.unpersist()
        if self._src_part is not None:
            self._src_part.unpersist()
            self._src_part = None
        return self

    _src_part: DataFrame | None = None

    def edges_by_src(self) -> DataFrame:
        """(src, dst) hash-partitioned by ``src`` and persisted.

        Iterative operators join edges on ``src`` every superstep; with
        the edge side already hash-partitioned on the join key, Catalyst
        reuses the cached exchange and only the (small) vector side
        shuffles per iteration — the difference between O(V) and O(E)
        per-superstep shuffle volume at scale.
        """
        if self._src_part is None:
            n = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            deg = self.edges.groupBy("src").agg(
                (F.lit(1.0) / F.count("*")).alias("src_inv_deg"),
                (F.lit(1.0) / F.sum("weight")).alias("src_inv_wdeg"),
            )
            self._src_part = (
                self.edges.join(deg, "src")
                .select("src", "dst", "weight", "src_inv_deg", "src_inv_wdeg")
                .repartition(n, "src")
                .persist()
            )
            self._src_part.count()
        return self._src_part


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """unionByName over a list (U5, ``to_eargraph_construct.cpp:163-180``)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)
