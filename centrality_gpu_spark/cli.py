"""Cluster job runner: the ``spark-submit --py-files`` surface.

    zip -r cgs.zip centrality_gpu_spark/
    spark-submit --py-files cgs.zip -m centrality_gpu_spark.cli \\
        pagerank --input /data/transcripts --input-format transcripts \\
        --output /out/ranks --checkpoint-dir /ckpt/run1 --tol 1e-6

(or ``python -m centrality_gpu_spark.cli ...`` locally). The runner:
builds the graph from the chosen source, executes one algorithm,
writes the result parquet and a ``_metrics.json`` (per-iteration
metrics from the CheckpointManager), and resumes from
``--checkpoint-dir`` automatically if a valid epoch exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_graph(spark, args):
    from centrality_gpu_spark.graph import Graph
    from centrality_gpu_spark.sources.edgelist import read_edge_list
    from centrality_gpu_spark.sources.transcripts import transcript_graph

    if args.input_format == "edges":
        df = spark.read.parquet(args.input)
        return Graph.from_undirected_edges(
            df, weight_col="weight" if "weight" in df.columns else None
        )
    if args.input_format == "edgelist":
        return read_edge_list(spark, args.input)
    if args.input_format == "transcripts":
        if args.table_format == "parquet":
            df = spark.read.parquet(args.input)
        elif args.table_format == "table":
            # catalog-table identifier (db.table or catalog.db.table) —
            # the surface an Iceberg table presents once its catalog is
            # registered (session.iceberg_conf); with the built-in
            # session catalog this is a managed/external table. Reading
            # through the catalog keeps partition pruning and column
            # pruning owned by the table format, not the path layout.
            df = spark.read.table(args.input)
        else:
            # the iceberg case is normally auto-configured by the
            # preflight in main() (catalog registered at session build
            # when a runtime jar exists); this fallback catches a
            # format that is still unavailable — e.g. a session built
            # elsewhere, or a non-iceberg custom format
            try:
                df = spark.read.format(args.table_format).load(args.input)
            except Exception as e:  # e.g. "Failed to find data source: iceberg"
                raise SystemExit(
                    f"table format {args.table_format!r} is not available in "
                    "this Spark session. For Iceberg, submit with the runtime "
                    "package and a catalog, e.g.:\n"
                    "  spark-submit --packages org.apache.iceberg:"
                    "iceberg-spark-runtime-4.0_2.13:<version> \\\n"
                    "    --conf spark.sql.catalog.lake=org.apache.iceberg."
                    "spark.SparkCatalog \\\n"
                    "    --conf spark.sql.catalog.lake.type=hadoop \\\n"
                    "    --conf spark.sql.catalog.lake.warehouse=<path> ...\n"
                    f"(underlying error: {e})"
                ) from e
        return transcript_graph(
            df,
            edge_types=tuple(args.edge_types.split(",")),
            max_tool_degree=args.max_tool_degree,
            id_mode=args.id_mode,
        ).graph
    raise SystemExit(f"unknown --input-format {args.input_format}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="centrality_gpu_spark")
    p.add_argument("algorithm", choices=[
        "pagerank", "components", "labelprop", "triangles", "betweenness",
        "betweenness-decomposed", "closeness", "bfs", "degrees", "curate",
    ])
    p.add_argument("--input", required=True)
    p.add_argument("--input-format", default="edges",
                   choices=["edges", "edgelist", "transcripts"])
    p.add_argument("--table-format", default="parquet",
                   help="transcripts read surface: 'parquet' (path), "
                   "'table' (catalog identifier via spark.read.table — "
                   "the registered-Iceberg-catalog surface), or a spark "
                   "data-source name like 'iceberg'")
    p.add_argument("--iceberg-warehouse", default=None,
                   help="hadoop-catalog warehouse path (table-format="
                   "iceberg; requires an iceberg-spark-runtime jar, "
                   "see session.iceberg_conf)")
    p.add_argument("--iceberg-catalog", default="lake",
                   help="catalog name to register (table-format=iceberg)")
    p.add_argument("--edge-types", default="tool,coinvocation")
    p.add_argument("--max-tool-degree", type=int, default=1000)
    p.add_argument("--id-mode", default="dense", choices=["dense", "hash"])
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=5)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--max-iterations", type=int, default=100)
    p.add_argument("--fixed-iterations", type=int, default=None)
    p.add_argument("--mode", default="csr", choices=["csr", "sql"],
                   help="pagerank physical mode")
    p.add_argument("--scratch-dir", default=None,
                   help="shared dir for the blocked-CSR store (csr mode)")
    p.add_argument("--sources", default=None,
                   help="comma-separated source vertices (bfs/betweenness)")
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--eval-source", default="src0",
                   help="held-out split name (curate)")
    p.add_argument("--sample-fraction", type=float, default=0.5,
                   help="stratified keep fraction (curate)")
    args = p.parse_args(argv)

    from centrality_gpu_spark.session import get_spark
    from centrality_gpu_spark.plans.checkpoint import CheckpointManager

    extra_conf = None
    if args.input_format == "transcripts" and args.table_format == "iceberg":
        # preflight: register the catalog at session build when the
        # runtime jar exists, or fail here with the recipe — never as a
        # ClassNotFoundException inside the first job
        from centrality_gpu_spark.session import (
            IcebergUnavailableError,
            iceberg_conf,
        )

        try:
            extra_conf = iceberg_conf(
                args.iceberg_warehouse or os.path.dirname(args.input) or ".",
                catalog=args.iceberg_catalog,
            )
        except IcebergUnavailableError as e:
            raise SystemExit(str(e)) from e

    spark = get_spark(app_name=f"cgs_{args.algorithm}", extra_conf=extra_conf)
    ckpt = CheckpointManager(spark, root=args.checkpoint_dir, every=args.checkpoint_every)

    if args.algorithm == "curate":
        # documents-table job: the end-to-end curation funnel
        from pyspark.sql import functions as F

        from centrality_gpu_spark.operators.corpus import curate_corpus

        docs = spark.read.parquet(args.input)
        t0 = time.time()
        # materialize once: the funnel counts come from the same cached
        # frame as the parquet write, so the expensive MinHash-LSH dedup
        # and closure stages run a single time.
        out = curate_corpus(
            docs, args.eval_source, fraction=args.sample_fraction
        ).localCheckpoint()
        out.write.mode("overwrite").parquet(args.output)
        funnel = {
            r.decision: r.n_docs
            for r in out.groupBy("decision")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .collect()
        }
        metrics = {
            "algorithm": "curate",
            "wall_sec": round(time.time() - t0, 3),
            "funnel": funnel,
        }
        with open(os.path.join(args.output, "_metrics.json"), "w") as f:
            json.dump(metrics, f, default=str)
        print(json.dumps(metrics))
        spark.stop()
        return

    g = build_graph(spark, args).persist()
    t0 = time.time()

    if args.algorithm == "pagerank":
        from centrality_gpu_spark.operators.pagerank import pagerank
        from centrality_gpu_spark.operators.superstep import block_edges

        blocked = None
        if args.mode == "csr" and args.scratch_dir:
            blocked = block_edges(g, scratch_dir=args.scratch_dir)
        out = pagerank(
            g, alpha=args.alpha, tol=args.tol,
            max_iterations=args.max_iterations,
            fixed_iterations=args.fixed_iterations,
            mode=args.mode, checkpoint=ckpt, blocked=blocked,
        )
    elif args.algorithm == "components":
        from centrality_gpu_spark.operators.components import connected_components

        out = connected_components(g, checkpoint=ckpt)
    elif args.algorithm == "labelprop":
        from centrality_gpu_spark.operators.labelprop import label_propagation

        out = label_propagation(g, max_iterations=args.max_iterations, checkpoint=ckpt)
    elif args.algorithm == "triangles":
        from centrality_gpu_spark.operators.triangles import triangles_per_vertex

        out = triangles_per_vertex(g)
    elif args.algorithm == "betweenness":
        from centrality_gpu_spark.operators.betweenness import betweenness_bsp

        srcs = [int(s) for s in args.sources.split(",")] if args.sources else None
        out = betweenness_bsp(g, batch_size=args.batch_size, sources=srcs, checkpoint=ckpt)
    elif args.algorithm == "betweenness-decomposed":
        from centrality_gpu_spark.operators.bcc import betweenness_decomposed

        out = betweenness_decomposed(g)
    elif args.algorithm == "closeness":
        from centrality_gpu_spark.operators.closeness import closeness_bsp

        out = closeness_bsp(g, batch_size=args.batch_size, checkpoint=ckpt)
    elif args.algorithm == "bfs":
        from centrality_gpu_spark.operators.bfs import multi_source_bfs

        srcs = [int(s) for s in (args.sources or "0").split(",")]
        src_df = spark.createDataFrame([(s,) for s in srcs], "source long")
        out = multi_source_bfs(g, src_df, checkpoint=ckpt).visited
    else:  # degrees
        out = g.degrees()

    out.write.mode("overwrite").parquet(args.output)
    metrics = {
        "algorithm": args.algorithm,
        "wall_sec": round(time.time() - t0, 3),
        "iterations": ckpt.metrics,
    }
    with open(os.path.join(args.output, "_metrics.json"), "w") as f:
        json.dump(metrics, f, default=str)
    print(json.dumps({k: v for k, v in metrics.items() if k != "iterations"}))
    spark.stop()


if __name__ == "__main__":
    main()
