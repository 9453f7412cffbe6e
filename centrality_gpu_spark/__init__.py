"""centrality_gpu_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the reference
``centrality-GPU`` engine (exact Brandes betweenness with structural
decompositions, CUDA) as an idiomatic Spark DataFrame program:

- edge tables built from conversation-transcript tables (and, for the
  driver's DuckDB oracles, from the TPC-H-ish ``events``/``lineitem``
  test tables);
- iterative graph algorithms (PageRank, connected components, label
  propagation, triangle counting, batched multi-source BFS, Brandes
  betweenness, closeness) expressed as frontier-join supersteps with
  partition-local CSR kernels inside Arrow/pandas vectorized UDFs;
- training-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) over the ``documents``/``embeddings``
  tables;
- checkpoint/resume with per-partition lineage + metrics.

The reference's CUDA kernels map to vectorized pandas UDFs; its
host/device memcpy boundaries map to Spark shuffles. See SURVEY.md.
"""

__version__ = "0.1.0"

from centrality_gpu_spark.graph import Graph  # noqa: F401
