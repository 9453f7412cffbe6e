"""Reader for the reference's edge-list text format (S1).

Format (``ReadMe:6-13``, ``graph.cpp:38-72``): first line ``n m``, then
``m`` lines ``u v w`` with 0-based int vertex ids. The reference builds
an adjacency list inserting both directions; we produce the canonical
symmetrized Graph. Used for the four golden sample graphs in tests.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from centrality_gpu_spark.graph import Graph

_EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("weight", LongType()),
    ]
)


def read_edge_list(spark: SparkSession, path: str) -> Graph:
    """Parse ``n m`` header + ``u v w`` rows into a canonical Graph.

    Implemented as a declarative scan: whitespace-separated CSV with the
    header row dropped by its arity (header has 2 fields → weight null).
    At 100 TB scale the text scan parallelizes per-file-split for free.
    """
    raw = (
        spark.read.schema(_EDGE_SCHEMA)
        .option("sep", " ")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    edges = raw.where(F.col("weight").isNotNull())  # drops the `n m` header line
    return Graph.from_undirected_edges(edges, weight_col="weight")


def read_edge_list_local(spark: SparkSession, path: str) -> Graph:
    """Driver-side parse for tiny golden fixtures (deterministic, no scan)."""
    with open(path) as f:
        lines = [ln.split() for ln in f.read().strip().splitlines()]
    rows = [(int(u), int(v), int(w)) for u, v, w in lines[1:]]
    edges = spark.createDataFrame(rows, schema=_EDGE_SCHEMA)
    return Graph.from_undirected_edges(edges, weight_col="weight")
