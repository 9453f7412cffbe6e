"""The reference's four sample graphs as literal fixtures.

The reference ships exactly four test inputs
(``sample_input/test{1..4}.txt``: header ``n m`` then ``u v 1`` rows,
``ReadMe:6-13``) and benchmarks its binary on precisely these graphs
(``measure_energy.py:89``).  They are embedded here as Python/SQL
literals so the driver's oracle gate can check betweenness on the
reference's own fixtures end-to-end — the same graphs the pytest
goldens in ``tests/test_centrality.py`` already cover at 1e-6.

All sample edge weights are 1 (``sample_input/test1.txt:2-13``), every
graph is connected, and the max diameter is 8 (test4), so the
unrolled-APSP DuckDB oracle (``brandes_apsp_oracle_sql``, depth 8) is
exact on all four.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from centrality_gpu_spark.graph import Graph

# (u, v) pairs exactly as in sample_input/test{N}.txt (weight column
# omitted: every sample weight is 1).
SAMPLE_EDGES: dict[int, list[tuple[int, int]]] = {
    1: [(0, 1), (0, 6), (0, 8), (1, 2), (2, 3), (3, 4), (3, 7), (3, 8),
        (4, 5), (5, 8), (6, 7), (7, 8)],
    2: [(0, 1), (0, 6), (0, 8), (1, 2), (2, 3), (3, 4), (3, 7), (3, 8),
        (4, 5), (5, 8), (6, 7), (7, 8), (0, 9), (9, 10), (9, 11),
        (9, 14), (10, 12), (11, 12), (11, 13), (12, 14), (13, 14)],
    3: [(0, 1), (0, 2), (1, 2), (2, 3), (2, 5), (3, 4), (3, 5), (4, 5)],
    4: [(0, 1), (0, 6), (0, 8), (1, 2), (2, 3), (3, 4), (3, 7), (3, 8),
        (4, 5), (5, 8), (6, 7), (7, 8), (0, 9), (9, 10), (9, 11),
        (9, 14), (10, 12), (11, 12), (11, 13), (12, 14), (13, 14),
        (14, 15), (14, 16), (15, 17), (16, 18), (17, 18), (17, 19),
        (17, 20), (18, 19), (19, 20)],
}


def sample_graph(spark: SparkSession, which: int) -> Graph:
    """Sample graph ``which`` in {1..4} as a canonical :class:`Graph`."""
    rows = [(u, v) for (u, v) in SAMPLE_EDGES[which]]
    df = spark.createDataFrame(rows, "src long, dst long")
    return Graph.from_undirected_edges(df)


def sample_edges_cte(which: int) -> str:
    """DuckDB CTE prefix: final CTE ``edges(src, dst, weight)`` holding
    both directions — the same convention as ``EVENTS_EDGES_CTE``."""
    vals = ", ".join(f"({u}, {v})" for (u, v) in SAMPLE_EDGES[which])
    return f"""
base(src, dst) AS (VALUES {vals}),
edges AS (
  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
         CAST(1.0 AS DOUBLE) AS weight
  FROM base
  UNION ALL
  SELECT CAST(dst AS BIGINT) AS src, CAST(src AS BIGINT) AS dst,
         CAST(1.0 AS DOUBLE) AS weight
  FROM base
)
""".strip()
