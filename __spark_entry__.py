"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Graph queries run over two graphs derived from the testdata parquet
(centrality_gpu_spark/sources/testdata_graphs.py):

- events graph: bipartite user↔event_type (actor→object adjacency —
  the testdata analog of the transcripts' conv↔tool edges);
- copurchase graph: parts co-occurring in an order (triangle-rich).

Both are defined twice — DataFrame ops and a DuckDB CTE named
``edges`` — in the same module, to keep Spark and oracle in lockstep.

Iterative fixpoints DuckDB 1.0's recursive CTEs can't aggregate inside
are hash-checked by unrolling a fixed budget: LPA unrolls its round
count (``lpa_oracle_sql``), and the events-graph centralities use the
unrolled-APSP oracle (``brandes_apsp_oracle_sql``: recursive-walk
distances, per-level sigma unroll, pair-dependency BC). The star-forest
(custorder) centralities additionally check against independent
closed forms. ``ann_ivf`` unrolls its fixed-budget spherical k-means
the same way (``ivf_oracle_sql``: md5-ordered sample, five Lloyd CTE
pairs, nprobe-cell probe, exact re-rank) — every query is
oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from centrality_gpu_spark.operators.components import connected_components
from centrality_gpu_spark.operators.labelprop import label_propagation, lpa_oracle_sql
from centrality_gpu_spark.operators.pagerank import (
    pagerank,
    pagerank_oracle_sql,
    pagerank_residuals_oracle_sql,
    personalized_pagerank,
    ppr_oracle_sql,
)
from centrality_gpu_spark.operators.betweenness import (
    betweenness_broadcast,
    betweenness_sampled_oracle_sql,
    brandes_apsp_oracle_sql,
    brandes_weighted_oracle_sql,
    edge_betweenness_oracle_sql,
)
from centrality_gpu_spark.operators.sampling import (
    sample_neighbors_oracle_sql,
)
from centrality_gpu_spark.operators.walks import (
    node2vec_oracle_sql,
    random_walks_oracle_sql,
)
from centrality_gpu_spark.operators.closeness import (
    closeness_apsp_oracle_sql,
    closeness_broadcast,
    closeness_sampled_oracle_sql,
    closeness_weighted_oracle_sql,
    harmonic_weighted_oracle_sql,
    harmonic,
    harmonic_apsp_oracle_sql,
)
from centrality_gpu_spark.operators.corpus import (
    curate_corpus,
    pack_sequences,
    pack_sequences_sql,
    vocab_growth,
    vocab_growth_sql,
    curate_corpus_sql,
    curation_funnel,
    curation_funnel_sql,
    ngram_contamination,
    ngram_contamination_sql,
    stratified_sample,
    stratified_sample_sql,
    strip_boilerplate,
    strip_boilerplate_sql,
)
from centrality_gpu_spark.operators.eccentricity import (
    eccentricity_weighted_oracle_sql,
    eccentricity,
    eccentricity_apsp_oracle_sql,
    extent_apsp_oracle_sql,
    graph_extent,
)
from centrality_gpu_spark.operators.eigenvector import (
    eigenvector_centrality,
    eigenvector_oracle_sql,
    katz_centrality,
    katz_oracle_sql,
)
from centrality_gpu_spark.operators.bfs import multi_source_bfs
from centrality_gpu_spark.operators.triangles import (
    TRIANGLE_COUNT_SQL,
    sampled_triangle_count_sql,
    transitivity,
    transitivity_oracle_sql,
    triangle_count,
    triangle_count_sampled,
    triangles_per_vertex,
)
from centrality_gpu_spark.operators.dedup import (
    EXACT_DUP_SQL,
    dedup_clusters,
    dedup_clusters_oracle_sql,
    exact_duplicates,
    minhash_dedup,
    minhash_oracle_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_sql,
    simhash_near_duplicates,
    simhash_oracle_sql,
)
from centrality_gpu_spark.operators.similarity import (
    cosine_topk_gemm,
    cosine_topk_oracle_sql,
    embedding_clusters,
    embedding_clusters_oracle_sql,
    embedding_near_duplicates,
    embedding_near_dups_oracle_sql,
    knn_graph,
    knn_graph_oracle_sql,
    neighbor_mean_exploded,
    neighbor_mean_exploded_sql,
    ivf_oracle_sql,
    kmeans_oracle_sql,
    lsh_oracle_sql,
    lsh_topk,
    semantic_near_dups_oracle_sql,
)
from centrality_gpu_spark.operators.lm import (
    dsir_oracle_sql,
    dsir_weights,
    duplicate_ngram_fraction,
    duplicate_ngram_oracle_sql,
    perplexity,
    perplexity_oracle_sql,
    span_dedup,
    span_dedup_oracle_sql,
)
from centrality_gpu_spark.operators.sessions import (
    session_stats,
    session_stats_oracle_sql,
)
from centrality_gpu_spark.operators.relevance import (
    bm25_oracle_sql,
    bm25_topk,
    tfidf_oracle_sql,
    tfidf_topk_terms,
)
from centrality_gpu_spark.operators.text import (
    char_entropy,
    char_entropy_sql,
    language_id,
    language_id_sql,
    pii_scrub,
    pii_scrub_sql,
    quality_filter,
    quality_filter_sql,
    quality_score,
    quality_score_sql,
    repetition_stats,
    repetition_stats_sql,
    token_stats,
    token_stats_sql,
)
from centrality_gpu_spark.operators.hits import (
    adamic_adar,
    adamic_adar_oracle_sql,
    hits,
    hits_oracle_sql,
    jaccard_oracle_sql,
    preferential_attachment_oracle_sql,
    resource_allocation_oracle_sql,
    salsa_oracle_sql,
)
from centrality_gpu_spark.operators.anf import (
    anf_oracle_sql,
    effective_diameter,
    effective_diameter_oracle_sql,
    neighborhood_function,
)
from centrality_gpu_spark.operators.mis import (
    jp_coloring,
    jp_coloring_oracle_sql,
    maximal_independent_set,
    mis_oracle_sql,
)
from centrality_gpu_spark.operators.scc import (
    condensation_oracle_sql,
    condensation_summary,
    scc_oracle_sql,
    strongly_connected_components,
)
from centrality_gpu_spark.operators.butterflies import (
    bipartite_project_oracle_sql,
    butterflies_per_left_oracle_sql,
    butterfly_oracle_sql,
)
from centrality_gpu_spark.operators.community import modularity_sql
from centrality_gpu_spark.operators.matching import (
    contraction_oracle_sql,
    matching_oracle_sql,
)
from centrality_gpu_spark.operators.partition import (
    edge_cut_oracle_sql,
    partition_oracle_sql,
    refined_edge_cut_oracle_sql,
    refined_partition_oracle_sql,
)
from centrality_gpu_spark.operators.cliques import (
    FOUR_CLIQUE_SQL,
    four_cliques_per_vertex_oracle_sql,
)
from centrality_gpu_spark.operators.paths import shortest_path_oracle_sql
from centrality_gpu_spark.operators.temporal import (
    earliest_arrival_oracle_sql,
    latest_departure_oracle_sql,
    temporal_reach_summary_oracle_sql,
)
from centrality_gpu_spark.operators.wl import (
    wl_graph_hash_oracle_sql,
    wl_labels_oracle_sql,
)
from centrality_gpu_spark.operators.stats import (
    degree_skew_oracle_sql,
    rich_club_oracle_sql,
    assortativity_oracle_sql,
    graph_summary_oracle_sql,
)
from centrality_gpu_spark.operators.truss import EDGE_SUPPORT_SQL
from centrality_gpu_spark.sources.reference_samples import (
    sample_edges_cte as _sample_cte,
)
from centrality_gpu_spark.sources.transcripts import (
    CONVERSATION_STATS_SQL as _CONVERSATION_STATS_SQL,
    TOOL_TRANSITIONS_SQL as _TOOL_TRANSITIONS_SQL,
)
from centrality_gpu_spark.streaming.progress import (
    conversation_progress_oracle_sql as _conversation_progress_oracle_sql,
)
from centrality_gpu_spark.sources.testdata_graphs import (
    COPURCHASE_EDGES_CTE,
    CUSTORDER_EDGES_CTE,
    EVENTS_DIRECTED_CTE,
    EVENTS_EDGES_CTE,
    EVENTS_TEMPORAL_CTE,
    LINEITEM_CYCLE_CTE,
    TRANSCRIPTS_CTE,
    TRANSCRIPT_EDGES_CTE,
    copurchase_graph,
    events_directed_edges,
    events_graph,
    events_transcripts,
)

PR_ITERS = 5
PR_ROUND = 8
LPA_ITERS = 8


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-rule pipeline end to end — synthesize the
    input_hint transcript table at sf0.001, build the conv/tool edge
    table (tool invocation + co-invocation + reply adjacency under
    stable turn ordering), and run PageRank over it. Returns (id, rank).
    """
    from centrality_gpu_spark.sources.transcripts import transcript_graph

    t = events_transcripts(spark, "/root/testdata/sf0.001")
    tg = transcript_graph(t, edge_types=("tool", "coinvocation", "reply"))
    return pagerank(tg.graph, fixed_iterations=10, mode="csr")


# --------------------------------------------------------------- queries

def _q_edges_events(spark: SparkSession, sf: str) -> DataFrame:
    return events_graph(spark, sf).edges.select("src", "dst", "weight")


def _q_edges_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    return copurchase_graph(spark, sf).edges.select("src", "dst", "weight")


def _q_degrees_events(spark: SparkSession, sf: str) -> DataFrame:
    return events_graph(spark, sf).degrees()


def _q_degree_hist_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    return copurchase_graph(spark, sf).degree_histogram()


def _q_components_events(spark: SparkSession, sf: str) -> DataFrame:
    return connected_components(events_graph(spark, sf))


def _q_component_summary_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.components import component_summary

    return component_summary(events_graph(spark, sf))


def _q_component_summary_custorder(spark: SparkSession, sf: str) -> DataFrame:
    # the star forest: many components of varying size
    from centrality_gpu_spark.operators.components import component_summary
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    return component_summary(custorder_graph(spark, sf))


def _q_pagerank_events(spark: SparkSession, sf: str) -> DataFrame:
    pr = pagerank(events_graph(spark, sf), fixed_iterations=PR_ITERS, mode="csr")
    return pr.select("id", F.round("rank", PR_ROUND).alias("rank"))


def _q_pagerank_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    pr = pagerank(copurchase_graph(spark, sf), fixed_iterations=PR_ITERS, mode="sql")
    return pr.select("id", F.round("rank", PR_ROUND).alias("rank"))


def _q_pagerank_weighted_events(spark: SparkSession, sf: str) -> DataFrame:
    # CSR mode: the driver gate covers the weighted block-store path
    pr = pagerank(
        events_graph(spark, sf), fixed_iterations=PR_ITERS, mode="csr", weighted=True
    )
    return pr.select("id", F.round("rank", PR_ROUND).alias("rank"))


def _q_triangle_count_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    return triangle_count(copurchase_graph(spark, sf))


def _q_triangles_per_vertex_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    return triangles_per_vertex(copurchase_graph(spark, sf))


def _q_ego_network_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bfs import ego_network

    g = events_graph(spark, sf)
    center = g.min_degree_vertex()[0]
    ball, _ = ego_network(g, center, radius=2)
    return ball


def _q_ego_edges_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bfs import ego_network

    g = events_graph(spark, sf)
    center = g.min_degree_vertex()[0]
    _, edges = ego_network(g, center, radius=2)
    return edges


def _q_transitivity_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    return transitivity(copurchase_graph(spark, sf))


def _q_triangle_count_sampled_copurchase(
    spark: SparkSession, sf: str
) -> DataFrame:
    # DOULION p=0.25 — the documented trillion-edge scale path
    return triangle_count_sampled(copurchase_graph(spark, sf), p=0.25)


def _q_four_cliques_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.cliques import four_cliques_per_vertex

    return four_cliques_per_vertex(events_graph(spark, sf))


def _q_four_clique_count_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.cliques import four_clique_count

    return four_clique_count(copurchase_graph(spark, sf))


def _q_sssp_events(spark: SparkSession, sf: str) -> DataFrame:
    g = events_graph(spark, sf)
    source = g.edges.agg(F.min("src")).collect()[0][0]
    src_df = spark.createDataFrame([(int(source),)], "source long")
    res = multi_source_bfs(g, src_df)
    return res.visited.select("vertex", F.col("dist").cast("long").alias("dist"))


def _q_lpa_events(spark: SparkSession, sf: str) -> DataFrame:
    # fixed round budget so the DuckDB oracle can unroll the identical
    # recurrence (early stop only fires at a fixpoint — same labels)
    return label_propagation(events_graph(spark, sf), max_iterations=LPA_ITERS)


def _q_lpa_weighted_events(spark: SparkSession, sf: str) -> DataFrame:
    # neighbor-weight-majority variant (events weights are exact
    # integer counts, so the vote sums hash-match DuckDB)
    return label_propagation(
        events_graph(spark, sf), max_iterations=LPA_ITERS, weighted=True
    )


def _q_betweenness_events(spark: SparkSession, sf: str) -> DataFrame:
    bc = betweenness_broadcast(events_graph(spark, sf))
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _q_betweenness_sample(which: int):
    """Betweenness on the reference's own sample_input/test{which}.txt
    fixture (measure_energy.py:89's four graphs), embedded as literals —
    the sf_dir argument is ignored by design."""
    from centrality_gpu_spark.sources.reference_samples import sample_graph

    def run(spark: SparkSession, sf: str) -> DataFrame:
        bc = betweenness_broadcast(sample_graph(spark, which))
        return bc.select("id", F.round("bc", 6).alias("bc"))

    return run


_q_betweenness_sample1 = _q_betweenness_sample(1)
_q_betweenness_sample2 = _q_betweenness_sample(2)
_q_betweenness_sample3 = _q_betweenness_sample(3)
_q_betweenness_sample4 = _q_betweenness_sample(4)


def _events_weighted_graph(spark: SparkSession, sf: str):
    # exact-binary-fraction weights in [1, 11/8]: float sums compare
    # bit-identically across numpy and DuckDB, and any shortest path is
    # hop-bounded by 11/8 x the unweighted diameter (oracle unroll = 8)
    from centrality_gpu_spark.graph import Graph

    g = events_graph(spark, sf)
    w = F.lit(1.0) + (F.col("weight").cast("long") % 4).cast("double") / F.lit(8.0)
    return Graph.from_symmetric_edges(g.edges.select("src", "dst", w.alias("weight")))


def _q_betweenness_weighted_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.betweenness import betweenness_weighted

    bc = betweenness_weighted(_events_weighted_graph(spark, sf))
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _q_butterflies_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.butterflies import butterfly_count

    return butterfly_count(events_directed_edges(spark, sf))


def _q_butterflies_per_user_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.butterflies import (
        butterflies_per_left_vertex,
    )

    return butterflies_per_left_vertex(events_directed_edges(spark, sf))


def _q_closeness_sampled_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.closeness import closeness_sampled

    c = closeness_sampled(events_graph(spark, sf), n_samples=BC_SAMPLES)
    return c.select("id", F.round("closeness", 6).alias("closeness"))


def _q_bipartite_project_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.butterflies import bipartite_project

    return bipartite_project(events_directed_edges(spark, sf), max_right_degree=1000)


def _q_eccentricity_weighted_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.eccentricity import eccentricity_weighted

    e = eccentricity_weighted(_events_weighted_graph(spark, sf))
    return e.select("id", F.round("ecc", 6).alias("ecc"))


TEMPORAL_SOURCES_SQL = "SELECT i AS id FROM range(0, 10) t(i)"


def _temporal_sources(spark: SparkSession) -> DataFrame:
    return spark.range(10).select(F.col("id"))


def _q_temporal_arrival_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.temporal import earliest_arrival
    from centrality_gpu_spark.sources.testdata_graphs import events_temporal_edges

    return earliest_arrival(
        events_temporal_edges(spark, sf), _temporal_sources(spark)
    )


def _q_temporal_reach_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.temporal import temporal_reach_summary
    from centrality_gpu_spark.sources.testdata_graphs import events_temporal_edges

    return temporal_reach_summary(
        events_temporal_edges(spark, sf), _temporal_sources(spark)
    )


TEMPORAL_END_TS = 1_900_000_000_000_000  # epoch µs, past all testdata ts


def _q_temporal_departure_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.temporal import latest_departure
    from centrality_gpu_spark.sources.testdata_graphs import events_temporal_edges

    return latest_departure(
        events_temporal_edges(spark, sf), _temporal_sources(spark), TEMPORAL_END_TS
    )


def _q_matching_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.matching import maximal_matching

    return maximal_matching(events_graph(spark, sf))


def _q_coarsen_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.matching import contract_matching

    coarse, _mapping = contract_matching(events_graph(spark, sf))
    return coarse


# r3 multilevel pipeline: pendant collapse → 2 heavy-edge matching
# levels → weighted-LPA community packing (init) → LPA refinement.
# Every knob pinned so the DuckDB unroll is identical.
PARTITION_K = 4
PARTITION_KW = dict(levels=2, match_rounds=8, peel_rounds=4, lpa_iters=10)
PARTITION_ORACLE_KW = dict(
    levels=2, rounds=8, peel_rounds=4, lpa_iters=10
)


def _q_partition_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.partition import partition_graph

    return partition_graph(events_graph(spark, sf), PARTITION_K, **PARTITION_KW)


def _q_edge_cut_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.partition import (
        edge_cut_summary,
        partition_graph,
    )

    g = events_graph(spark, sf)
    return edge_cut_summary(g, partition_graph(g, PARTITION_K, **PARTITION_KW))


REFINE_QUERY_ROUNDS = 4


VCYCLE_LEVELS = 2


def _q_partition_vcycle_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.partition import partition_multilevel

    # pinned 2-level V-cycle: exact_levels disables the data-dependent
    # stall/target stops so the structure is static and the whole run
    # has a DuckDB unroll (vcycle_oracle_sql) — the auto-depth mode
    # stays the production default, quality-pinned in
    # tests/test_partition.py
    return partition_multilevel(
        events_graph(spark, sf), PARTITION_K, match_rounds=8,
        refine_rounds=REFINE_QUERY_ROUNDS, exact_levels=VCYCLE_LEVELS,
    )


def _q_partition_refined_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.partition import (
        partition_graph,
        refine_partition,
    )

    g = events_graph(spark, sf)
    parts = partition_graph(g, PARTITION_K, **PARTITION_KW)
    return refine_partition(g, parts, PARTITION_K, rounds=REFINE_QUERY_ROUNDS)


def _q_edge_cut_refined_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.partition import (
        edge_cut_summary,
        partition_graph,
        refine_partition,
    )

    g = events_graph(spark, sf)
    parts = partition_graph(g, PARTITION_K, **PARTITION_KW)
    return edge_cut_summary(
        g, refine_partition(g, parts, PARTITION_K, rounds=REFINE_QUERY_ROUNDS)
    )


PATH_SOURCE, PATH_TARGET = 0, 149


def _q_shortest_path_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.paths import shortest_path

    return shortest_path(events_graph(spark, sf), PATH_SOURCE, PATH_TARGET)


# --- north-rule transcripts pipeline (input_hint table synthesized
# deterministically from events, SQL twin in testdata_graphs.py) ---


def _q_conversation_stats_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.sources.transcripts import conversation_stats

    return conversation_stats(events_transcripts(spark, sf))


def _q_conversation_progress_transcripts(
    spark: SparkSession, sf: str
) -> DataFrame:
    # batch twin of the applyInPandasWithState stateful streaming
    # operator (streaming/progress.py): assembled-prefix frontier,
    # pending gap count, replay-safe distinct-turn counts
    from centrality_gpu_spark.streaming.progress import conversation_progress

    return conversation_progress(events_transcripts(spark, sf))


def _q_tool_transitions_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.sources.transcripts import tool_transitions

    return tool_transitions(events_transcripts(spark, sf))


def _q_reply_invariant_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    # input_hint's per-row invariant (per-turn text equality under
    # stable turn ordering), as a driver-checked summary row
    from centrality_gpu_spark.sources.transcripts import reply_chain_check

    t = events_transcripts(spark, sf)
    v = reply_chain_check(t).agg(
        F.count("*").cast("long").alias("n_violations")
    )
    n = t.agg(F.count("*").cast("long").alias("n_turns"))
    return v.crossJoin(n)


def _q_transcript_edges(spark: SparkSession, sf: str) -> DataFrame:
    # the engine's PRIMARY edge builder (north rule: vertices =
    # conversations/tools, edges from reply adjacency + tool
    # invocation), all three edge types, canonical Graph form
    from centrality_gpu_spark.sources.transcripts import transcript_graph

    tg = transcript_graph(
        events_transcripts(spark, sf),
        edge_types=("tool", "coinvocation", "reply"),
    )
    return tg.graph.edges.select("src", "dst", "weight")


def _q_pagerank_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    # transcripts → edge table → PageRank: the full north-rule pipeline
    # end-to-end under the driver's hash gate
    from centrality_gpu_spark.sources.transcripts import transcript_graph

    tg = transcript_graph(
        events_transcripts(spark, sf),
        edge_types=("tool", "coinvocation", "reply"),
    )
    pr = pagerank(tg.graph, fixed_iterations=PR_ITERS, mode="csr")
    return pr.select("id", F.round("rank", PR_ROUND).alias("rank"))


def _q_pagerank_weighted_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    # invocation-count-weighted ranking — the natural scoring on the
    # conv/tool graph, where edge weight = how often the tool was used
    from centrality_gpu_spark.sources.transcripts import transcript_graph

    tg = transcript_graph(
        events_transcripts(spark, sf),
        edge_types=("tool", "coinvocation", "reply"),
    )
    pr = pagerank(
        tg.graph, fixed_iterations=PR_ITERS, mode="csr", weighted=True
    )
    return pr.select("id", F.round("rank", PR_ROUND).alias("rank"))


def _q_betweenness_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    # the reference's core metric over the north-rule input: Brandes
    # betweenness on the transcript-built graph, vs the pair-dependency
    # APSP oracle on the identical DuckDB-twin edge table
    from centrality_gpu_spark.sources.transcripts import transcript_graph

    tg = transcript_graph(
        events_transcripts(spark, sf),
        edge_types=("tool", "coinvocation", "reply"),
    )
    bc = betweenness_broadcast(tg.graph)
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _q_wl_labels_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.wl import wl_labels

    return wl_labels(events_graph(spark, sf))


def _q_wl_hash_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.wl import wl_graph_hash

    return wl_graph_hash(events_graph(spark, sf))


def _q_edge_betweenness_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.betweenness import edge_betweenness

    ebc = edge_betweenness(events_graph(spark, sf))
    return ebc.select("src", "dst", F.round("ebc", 6).alias("ebc"))


def _q_harmonic_weighted_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.closeness import harmonic_weighted

    h = harmonic_weighted(_events_weighted_graph(spark, sf))
    return h.select("id", F.round("harmonic", 6).alias("harmonic"))


def _q_closeness_weighted_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.closeness import closeness_weighted

    c = closeness_weighted(_events_weighted_graph(spark, sf))
    return c.select("id", F.round("closeness", 6).alias("closeness"))


BC_SAMPLES = 32


def _q_betweenness_sampled_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.betweenness import betweenness_sampled

    bc = betweenness_sampled(events_graph(spark, sf), n_samples=BC_SAMPLES)
    return bc.select("id", F.round("bc", 6).alias("bc"))


RW_LEN, RW_PER_VERTEX = 3, 2
N2V_P, N2V_Q = 0.5, 2.0
GS_FANOUTS = [3, 2]  # exact binary fractions: float cumsums match DuckDB


def _q_random_walks_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.walks import random_walks

    return random_walks(
        events_graph(spark, sf),
        walk_length=RW_LEN,
        walks_per_vertex=RW_PER_VERTEX,
    )


def _q_node2vec_walks_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.walks import node2vec_walks

    return node2vec_walks(
        events_graph(spark, sf),
        walk_length=RW_LEN,
        walks_per_vertex=RW_PER_VERTEX,
        p=N2V_P,
        q=N2V_Q,
    )


def _q_sample_neighbors_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.sampling import sample_neighbors

    return sample_neighbors(events_graph(spark, sf), fanouts=GS_FANOUTS)


def _q_scc_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.sources.testdata_graphs import lineitem_cycle_edges

    return strongly_connected_components(lineitem_cycle_edges(spark, sf))


def _q_condensation_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.sources.testdata_graphs import lineitem_cycle_edges

    de = lineitem_cycle_edges(spark, sf).persist()
    return condensation_summary(de, strongly_connected_components(de))


ANF_HOPS = 3


def _q_mis_events(spark: SparkSession, sf: str) -> DataFrame:
    return maximal_independent_set(events_graph(spark, sf))


def _q_coloring_events(spark: SparkSession, sf: str) -> DataFrame:
    return jp_coloring(events_graph(spark, sf))


def _q_anf_reach_events(spark: SparkSession, sf: str) -> DataFrame:
    return neighborhood_function(events_graph(spark, sf), max_hops=ANF_HOPS)


def _q_eff_diameter_events(spark: SparkSession, sf: str) -> DataFrame:
    return effective_diameter(events_graph(spark, sf), max_hops=ANF_HOPS)


def _q_betweenness_decomposed_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bcc import betweenness_decomposed

    bc = betweenness_decomposed(events_graph(spark, sf))
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _q_bcc_histogram_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bcc import bcc_size_histogram
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    return bcc_size_histogram(custorder_graph(spark, sf))


def _events_with_pendants(spark: SparkSession, sf: str):
    # the dense events graph has no natural bridges, so attach one
    # deterministic pendant vertex (u + 2_000_000) to each user u < 50:
    # the operators must separate those 50 true bridges from the 750
    # cycle edges (same injected-payload pattern as pii_scrub)
    from centrality_gpu_spark.graph import Graph

    g = events_graph(spark, sf)
    pend = (
        g.edges.select(F.col("src").alias("u"))
        .where(F.col("u") < 50)
        .distinct()
        .select(
            F.col("u").alias("src"),
            (F.col("u") + F.lit(2_000_000)).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    sym = g.edges.unionByName(pend).unionByName(
        pend.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    return Graph.from_symmetric_edges(sym)


def _q_bridges_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bcc import bridges

    return bridges(_events_with_pendants(spark, sf)).orderBy("src", "dst")


def _q_two_edge_components_events(spark: SparkSession, sf: str) -> DataFrame:
    # same pendant-injected graph as bridges_events: pendants become
    # singleton blocks, the dense core stays one 2-edge-connected block
    from centrality_gpu_spark.operators.bcc import two_edge_components

    return two_edge_components(_events_with_pendants(spark, sf)).orderBy("id")


def _q_articulation_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bcc import articulation_points
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    return articulation_points(custorder_graph(spark, sf))


def _q_clustering_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.triangles import clustering_coefficient

    return clustering_coefficient(copurchase_graph(spark, sf))


def _q_core_numbers_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.kcore import core_numbers
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    return core_numbers(custorder_graph(spark, sf))


def _q_pendant_peel_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.pendant import pendant_peel
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    _remaining, peeled = pendant_peel(custorder_graph(spark, sf))
    return peeled.select("id", "round", "parent")


def _q_closeness_events(spark: SparkSession, sf: str) -> DataFrame:
    c = closeness_broadcast(events_graph(spark, sf))
    return c.select("id", F.round("closeness", 6).alias("closeness"))


def _q_harmonic_events(spark: SparkSession, sf: str) -> DataFrame:
    h = harmonic(events_graph(spark, sf))
    return h.select("id", F.round("harmonic", 6).alias("harmonic"))


def _q_pagerank_residuals_events(spark: SparkSession, sf: str) -> DataFrame:
    # the north metric's convergence trace (iterations-to-tol) itself,
    # hash-checked per iteration against the unrolled DuckDB recurrence
    from centrality_gpu_spark.operators.pagerank import pagerank_residuals

    return pagerank_residuals(events_graph(spark, sf), iterations=PR_ITERS)


PPR_SEEDS = 3
PPR_ITERS = 5


def _q_ppr_events(spark: SparkSession, sf: str) -> DataFrame:
    g = events_graph(spark, sf)
    seeds = g.vertices().orderBy("id").limit(PPR_SEEDS)
    pr = personalized_pagerank(g, seeds, fixed_iterations=PPR_ITERS, mode="sql")
    return pr.select("id", F.round("rank", PR_ROUND).alias("rank"))


KATZ_ITERS = 8
KATZ_ALPHA = 0.01


def _q_katz_events(spark: SparkSession, sf: str) -> DataFrame:
    kz = katz_centrality(
        events_graph(spark, sf), alpha=KATZ_ALPHA,
        fixed_iterations=KATZ_ITERS, mode="sql",
    )
    return kz.select("id", F.round("katz", PR_ROUND).alias("katz"))


EV_ITERS = 10


def _q_eigenvector_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    # copurchase (triangle-rich, non-bipartite) — the events graph is
    # bipartite, where the power sequence oscillates
    ev = eigenvector_centrality(
        copurchase_graph(spark, sf), fixed_iterations=EV_ITERS, mode="sql"
    )
    return ev.select("id", F.round("score", PR_ROUND).alias("score"))


# --- star-forest centrality queries (closed-form oracles): on the
# customer↔order graph every component is a star, so BC and closeness
# have exact SQL forms — this is what lets the driver hash-check the
# flagship Brandes/closeness kernels (both physical strategies)

HITS_ITERS = 10


def _q_salsa_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.hits import salsa

    return salsa(events_directed_edges(spark, sf))


def _q_hits_events(spark: SparkSession, sf: str) -> DataFrame:
    h = hits(events_directed_edges(spark, sf), fixed_iterations=HITS_ITERS)
    return h.select(
        "id",
        F.round("hub", PR_ROUND).alias("hub"),
        F.round("auth", PR_ROUND).alias("auth"),
    )


def _q_adamic_adar_events(spark: SparkSession, sf: str) -> DataFrame:
    aa = adamic_adar(events_graph(spark, sf), min_common=1)
    return aa.select("u", "v", "cn", F.round("score", PR_ROUND).alias("score"))


def _q_jaccard_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.hits import jaccard_link_prediction

    return jaccard_link_prediction(events_graph(spark, sf), min_common=1)


def _q_resource_allocation_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.hits import resource_allocation

    return resource_allocation(events_graph(spark, sf), min_common=1)


def _q_pref_attachment_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.hits import preferential_attachment

    return preferential_attachment(events_graph(spark, sf), min_common=1)


def _q_rich_club_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.stats import rich_club

    return rich_club(events_graph(spark, sf))


def _q_degree_skew_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    # the hub-skew planning signal (salting threshold / AQE skew):
    # rank-exact percentiles, blockwise-exact gini, power-law slope
    from centrality_gpu_spark.operators.stats import degree_skew

    return degree_skew(copurchase_graph(spark, sf))


def _q_assortativity_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.stats import degree_assortativity

    return degree_assortativity(copurchase_graph(spark, sf))


def _q_graph_summary_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.stats import graph_summary

    return graph_summary(copurchase_graph(spark, sf))


def _q_edge_support_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.truss import edge_support

    return edge_support(copurchase_graph(spark, sf))


def _q_modularity_custorder(spark: SparkSession, sf: str) -> DataFrame:
    # composition check: modularity objective over the connected-
    # components partition of the star forest (thousands of communities
    # with non-trivial in/tot terms; closed-form SQL twin below)
    from centrality_gpu_spark.operators.community import modularity
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    g = custorder_graph(spark, sf)
    comp = connected_components(g).withColumnRenamed("component", "community")
    return modularity(g, comp)


def _q_louvain_custorder(spark: SparkSession, sf: str) -> DataFrame:
    # on a star forest Louvain provably converges to one community per
    # star (leaf→center merge always gains; stars are disjoint), and the
    # canonical min-member label is the customer key — closed-form SQL
    from centrality_gpu_spark.operators.community import louvain
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    return louvain(custorder_graph(spark, sf))


def _q_betweenness_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    bc = betweenness_broadcast(custorder_graph(spark, sf))
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _q_betweenness_bsp_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.betweenness import betweenness_bsp
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    bc = betweenness_bsp(custorder_graph(spark, sf), batch_size=4096)
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _q_betweenness_decomposed_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bcc import betweenness_decomposed
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    bc = betweenness_decomposed(custorder_graph(spark, sf))
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _q_closeness_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    c = closeness_broadcast(custorder_graph(spark, sf))
    return c.select("id", F.round("closeness", 6).alias("closeness"))


def _q_closeness_bsp_custorder(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.closeness import closeness_bsp
    from centrality_gpu_spark.sources.testdata_graphs import custorder_graph

    c = closeness_bsp(custorder_graph(spark, sf), batch_size=4096)
    return c.select("id", F.round("closeness", 6).alias("closeness"))


# closed forms (reference BC semantics = ordered pairs, 2× nx
# unnormalized; closeness = wf_improved): a star with center c and k
# leaves has BC(c) = k(k-1), BC(leaf) = 0; with n total graph vertices
# C(c) = (k/k)·(k/(n-1)) and C(leaf) = (k/(2k-1))·(k/(n-1)). The SQL
# mirrors the engine's float expression shape exactly so round(6)
# agrees bitwise.

BETWEENNESS_CUSTORDER_SQL = """
WITH k AS (
  SELECT CAST(o_custkey AS BIGINT) AS id, COUNT(*) AS k
  FROM orders GROUP BY o_custkey
)
SELECT id, ROUND(CAST(k * (k - 1) AS DOUBLE), 6) AS bc FROM k
UNION ALL
SELECT CAST(o_orderkey + 10000000 AS BIGINT) AS id, 0.0 AS bc FROM orders
ORDER BY id
""".strip()

# star-forest community closed forms: each star IS its community; the
# canonical (min-member) label is the customer key (order vertices are
# offset by 10,000,000, so the customer id is always the minimum)
CUSTORDER_COMMUNITIES_CTE = """
communities AS (
  SELECT CAST(o_custkey AS BIGINT) AS id,
         CAST(o_custkey AS BIGINT) AS community
  FROM (SELECT DISTINCT o_custkey FROM orders)
  UNION ALL
  SELECT CAST(o_orderkey + 10000000 AS BIGINT) AS id,
         CAST(o_custkey AS BIGINT) AS community
  FROM orders
)
""".strip()

LOUVAIN_CUSTORDER_SQL = f"""
WITH {CUSTORDER_COMMUNITIES_CTE}
SELECT id, community FROM communities ORDER BY id
""".strip()

CLOSENESS_CUSTORDER_SQL = """
WITH k AS (
  SELECT CAST(o_custkey AS BIGINT) AS c, CAST(COUNT(*) AS DOUBLE) AS k
  FROM orders GROUP BY o_custkey
),
nn AS (
  SELECT CAST(COUNT(DISTINCT o_custkey) + COUNT(*) - 1 AS DOUBLE) AS n1
  FROM orders
)
SELECT c AS id,
       ROUND((k / k) * (k / (SELECT n1 FROM nn)), 6) AS closeness
FROM k
UNION ALL
SELECT CAST(o.o_orderkey + 10000000 AS BIGINT) AS id,
       ROUND((k.k / (2 * k.k - 1)) * (k.k / (SELECT n1 FROM nn)), 6) AS closeness
FROM orders o JOIN k ON CAST(o.o_custkey AS BIGINT) = k.c
ORDER BY id
""".strip()


BRIDGES_EVENTS_ORACLE = f"""
WITH RECURSIVE {EVENTS_EDGES_CTE},
pend AS (SELECT DISTINCT src AS u FROM edges WHERE src < 50),
alledges AS (
  SELECT src, dst FROM edges
  UNION ALL SELECT u AS src, u + 2000000 AS dst FROM pend
  UNION ALL SELECT u + 2000000 AS src, u AS dst FROM pend
),
cand AS (
  SELECT src, dst, ROW_NUMBER() OVER (ORDER BY src, dst) AS eid
  FROM (SELECT DISTINCT src, dst FROM alledges WHERE src < dst)
),
reach AS (
  SELECT c.eid, c.src AS v FROM cand c
  UNION
  SELECT r.eid, e.dst AS v
  FROM reach r
  JOIN alledges e ON e.src = r.v
  JOIN cand c ON c.eid = r.eid
  WHERE NOT (LEAST(e.src, e.dst) = c.src AND GREATEST(e.src, e.dst) = c.dst)
)
SELECT c.src, c.dst FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM reach r WHERE r.eid = c.eid AND r.v = c.dst)
ORDER BY src, dst
""".strip()

_BRIDGES_CHAIN = BRIDGES_EVENTS_ORACLE.rsplit("SELECT c.src", 1)[0].rstrip().rstrip(")") + ")"

TWO_EDGE_COMPONENTS_ORACLE = f"""
{_BRIDGES_CHAIN},
bridge_set AS (
  SELECT c.src, c.dst FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM reach r WHERE r.eid = c.eid AND r.v = c.dst)
),
nb AS (
  SELECT a.src, a.dst FROM alledges a
  WHERE NOT EXISTS (
    SELECT 1 FROM bridge_set b
    WHERE LEAST(a.src, a.dst) = b.src AND GREATEST(a.src, a.dst) = b.dst
  )
),
verts AS (SELECT DISTINCT src AS id FROM alledges),
closure(id, l) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, c.l FROM closure c JOIN nb e ON e.src = c.id
)
SELECT id, MIN(l) AS component FROM closure GROUP BY id ORDER BY id
""".strip()


BIPARTITE_EVENTS_CTE = (
    EVENTS_DIRECTED_CTE + ",\nbedges AS (SELECT src, dst FROM dedges)"
)


WEVENTS_EDGES_CTE = (
    EVENTS_EDGES_CTE.replace("edges AS (", "edges_raw AS (")
    + """,
edges AS (
  SELECT src, dst, 1.0 + (CAST(weight AS BIGINT) % 4) / 8.0 AS weight
  FROM edges_raw
)"""
)


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/documents.parquet")


def _embs(spark: SparkSession, sf: str) -> DataFrame:
    # deterministic subset keeps the all-pairs oracle tractable
    return spark.read.parquet(f"{sf}/embeddings.parquet").where(F.col("vec_id") < 200)


PII_INJECT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0
            THEN text || ' reach me: user' || CAST(doc_id AS VARCHAR)
                 || '@example.com or +1 555-000-1234 at 10.0.'
                 || CAST(doc_id % 256 AS VARCHAR) || '.7, ssn 123-45-6789'
            ELSE text END AS text
FROM documents
""".strip()


def _q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    # the synthetic documents carry no PII, so inject a deterministic
    # payload into every 7th doc (same expression as the oracle CTE) —
    # the green row then proves real redactions, not a no-op pass
    t, d = F.col("text"), F.col("doc_id")
    injected = _docs(spark, sf).select(
        "doc_id",
        F.when(
            d % 7 == 0,
            F.concat(
                t,
                F.lit(" reach me: user"),
                d.cast("string"),
                F.lit("@example.com or +1 555-000-1234 at 10.0."),
                (d % 256).cast("string"),
                F.lit(".7, ssn 123-45-6789"),
            ),
        ).otherwise(t).alias("text"),
    )
    return pii_scrub(injected)


def _q_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    return token_stats(_docs(spark, sf))


def _q_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    return repetition_stats(_docs(spark, sf))


def _q_strip_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    return strip_boilerplate(_docs(spark, sf), min_docs=2)


CONTAM_EVAL_SOURCE = "src0"


def _q_ngram_contamination(spark: SparkSession, sf: str) -> DataFrame:
    return ngram_contamination(_docs(spark, sf), CONTAM_EVAL_SOURCE, n=3)


def _q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    return stratified_sample(_docs(spark, sf), fraction=0.3)


def _q_curate_corpus(spark: SparkSession, sf: str) -> DataFrame:
    return curate_corpus(_docs(spark, sf), CONTAM_EVAL_SOURCE, fraction=0.5)


def _q_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    return curation_funnel(_docs(spark, sf), CONTAM_EVAL_SOURCE, fraction=0.5)


def _q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    return pack_sequences(_docs(spark, sf), seq_len=1000)


def _q_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    return vocab_growth(_docs(spark, sf))


def _q_word_histogram(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.bpe import word_histogram

    return word_histogram(_docs(spark, sf))


def _q_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf))


def _q_winnow_matches(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.text import winnow_matches

    return winnow_matches(_docs(spark, sf), min_shared=2)


def _q_eccentricity_events(spark: SparkSession, sf: str) -> DataFrame:
    return eccentricity(events_graph(spark, sf))


def _q_eccentricity_bsp_events(spark: SparkSession, sf: str) -> DataFrame:
    # same answer through the distributed frontier-join path
    return eccentricity(events_graph(spark, sf), strategy="bsp")


def _q_graph_extent_events(spark: SparkSession, sf: str) -> DataFrame:
    return graph_extent(events_graph(spark, sf))


def _q_quality(spark: SparkSession, sf: str) -> DataFrame:
    return quality_score(_docs(spark, sf))


def _q_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    return char_entropy(_docs(spark, sf))


def _q_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    return quality_filter(_docs(spark, sf))


def _q_langid(spark: SparkSession, sf: str) -> DataFrame:
    return language_id(_docs(spark, sf))


def _q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return exact_duplicates(_docs(spark, sf)).select("fp", "n_docs")


def _q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf), threshold=0.5)


def _q_minhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_dedup(_docs(spark, sf), threshold=0.5)


def _q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    return simhash_near_duplicates(_docs(spark, sf), max_hamming=8)


def _q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    return dedup_clusters(_docs(spark, sf), threshold=0.5)


DSIR_TARGET_WHERE = "doc_id % 5 = 0"  # deterministic "wanted domain" slice


def _q_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    return perplexity(_docs(spark, sf))


def _q_duplicate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    return duplicate_ngram_fraction(_docs(spark, sf), n=5)


def _q_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return dsir_weights(docs, docs.where(DSIR_TARGET_WHERE))


# a shared 24-token boilerplate span appended to every 11th doc — the
# synthetic corpus has no natural >=15-token duplicated spans, so the
# green row must prove real span REMOVAL (kept only at the minimal
# doc_id site), not a no-op pass. Same expression as the oracle CTE.
SPAN_INJECT_TOKENS = " ".join(f"boiler{i} plate{i}" for i in range(12))
SPAN_INJECT_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id % 11 = 0
            THEN text || ' {SPAN_INJECT_TOKENS}'
            ELSE text END AS text
FROM documents
""".strip()


def _q_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    t, d = F.col("text"), F.col("doc_id")
    injected = _docs(spark, sf).select(
        "doc_id",
        F.when(
            d % 11 == 0, F.concat(t, F.lit(" " + SPAN_INJECT_TOKENS))
        ).otherwise(t).alias("text"),
    )
    return span_dedup(injected, k=15)


# ------------------------------------------------- streaming fold rows
#
# VERDICT r04 item #3: put the incremental accumulators under the HARD
# driver signal. Each row folds the sf parquet through a streaming
# accumulator in K deterministic md5 chunks and returns the FINAL
# state; the oracle is the corresponding batch DuckDB twin, because
# incremental ≡ batch is exactly the operator's contract
# (streaming/components.py, triangles.py, dedup.py — order-free folds).


def _fold_chunks(df: DataFrame, key_cols: list, n_chunks: int, fold) -> None:
    """Split ``df`` into ``n_chunks`` by md5 of ``key_cols`` (chunk
    membership is a row property — deterministic across runs/engines)
    and fold them in chunk order."""
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    tag = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
        F.lit(n_chunks),
    )
    tagged = df.withColumn("_chunk", tag).localCheckpoint()
    for i in range(n_chunks):
        fold(tagged.where(F.col("_chunk") == i).drop("_chunk"))


def _q_streaming_components_fold_events(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.streaming.components import StreamingComponents

    edges = events_graph(spark, sf).edges_by_src().select("src", "dst")
    acc = StreamingComponents(spark)
    _fold_chunks(edges, ["src", "dst"], 5, acc.update)
    return acc.state.select("id", "component")


def _q_streaming_triangles_fold_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.streaming.triangles import StreamingTriangles

    edges = copurchase_graph(spark, sf).edges_by_src().select("src", "dst")
    acc = StreamingTriangles(spark)
    _fold_chunks(edges, ["src", "dst"], 3, acc.update)
    return spark.createDataFrame([(acc.total,)], "n_triangles long")


def _q_streaming_dedup_fold(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.streaming.dedup import StreamingMinHashDedup

    acc = StreamingMinHashDedup(spark, threshold=0.5)
    _fold_chunks(_docs(spark, sf), ["doc_id"], 4, acc.update)
    return acc.pairs.select("doc_a", "doc_b", "jaccard")


def _q_streaming_vocab_fold(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.streaming.vocab import StreamingWordHistogram

    acc = StreamingWordHistogram(spark)
    _fold_chunks(_docs(spark, sf), ["doc_id"], 4, acc.update)
    return acc.histogram.select("word", "cnt")


def _q_session_stats_events(spark: SparkSession, sf: str) -> DataFrame:
    return session_stats(spark.read.parquet(f"{sf}/events.parquet"))


BM25_QUERY = ["spark", "join", "vector"]


def _q_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    return tfidf_topk_terms(_docs(spark, sf), k=5)


def _q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    return bm25_topk(_docs(spark, sf), BM25_QUERY, k=10)


def _q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    return cosine_topk_gemm(_embs(spark, sf), k=5)


def _q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return lsh_topk(_embs(spark, sf), k=5)


KNN_GRAPH_PARAMS = dict(k=10, n_planes=8, n_tables=6)


def _q_knn_graph(spark: SparkSession, sf: str) -> DataFrame:
    return knn_graph(_embs(spark, sf), **KNN_GRAPH_PARAMS)


def _q_embedding_clusters(spark: SparkSession, sf: str) -> DataFrame:
    return embedding_clusters(_embs(spark, sf), threshold=0.3, **KNN_GRAPH_PARAMS)


def _q_neighbor_mean(spark: SparkSession, sf: str) -> DataFrame:
    # one GraphSAGE mean-aggregation round; ascending-neighbor-id fold
    # makes the float sums bit-identical to the DuckDB twin
    return neighbor_mean_exploded(_embs(spark, sf), **KNN_GRAPH_PARAMS)


def _q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.similarity import ivf_topk

    return ivf_topk(_embs(spark, sf), k=5, n_cells=8, nprobe=2)


def _q_kmeans_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.similarity import kmeans_assign

    return kmeans_assign(_embs(spark, sf), n_cells=8)


def _q_embedding_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    return embedding_near_duplicates(
        spark.read.parquet(f"{sf}/embeddings.parquet"), threshold=0.9
    )


def _q_semantic_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    from centrality_gpu_spark.operators.similarity import (
        semantic_near_duplicates,
    )

    return semantic_near_duplicates(_embs(spark, sf), tau=0.25, n_cells=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate samples the FIRST ~50
    # keys. Standing policy from round 5 on (VERDICT r04 item #2):
    # rotate by LEAST-RECENTLY-DRIVER-CHECKED — brand-new rows first,
    # then rows whose last green driver check is oldest, then the 7
    # flagship canaries; rows checked in the two most recent rounds
    # trail. This keeps every row's driver-check age <= ~2 rounds. The
    # cumulative driver-green ledger lives in BASELINE.md; every key is
    # still oracle-checked every round by tools/check_oracles.py (full
    # sweep committed as ORACLES_r{N}.txt).
    return {
        # --- round-5 window: 4 NEW rows (span dedup + the three
        # streaming-fold rows) lead, then the 45 rows whose last
        # driver check was r01/r02 (least-recently-driver-checked
        # rotation, VERDICT r04 item #2), then the 7 flagship
        # canaries. Cumulative ledger: BASELINE.md.
        "span_dedup": _q_span_dedup,
        "streaming_components_fold_events": _q_streaming_components_fold_events,
        "streaming_triangles_fold_copurchase": _q_streaming_triangles_fold_copurchase,
        "streaming_dedup_fold": _q_streaming_dedup_fold,
        "streaming_vocab_fold": _q_streaming_vocab_fold,
        # --- last driver-checked in r01/r02 (45 rows) ---
        "ann_ivf": _q_ann_ivf,
        "ann_lsh": _q_ann_lsh,
        "ann_topk": _q_ann_topk,
        "bm25_topk": _q_bm25_topk,
        "char_entropy": _q_char_entropy,
        "component_summary_custorder": _q_component_summary_custorder,
        "component_summary_events": _q_component_summary_events,
        "curate_corpus": _q_curate_corpus,
        "curation_funnel": _q_curation_funnel,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_exact": _q_dedup_exact,
        "degree_hist_copurchase": _q_degree_hist_copurchase,
        "degrees_events": _q_degrees_events,
        "dsir_weights": _q_dsir_weights,
        "duplicate_ngrams": _q_duplicate_ngrams,
        "edges_copurchase": _q_edges_copurchase,
        "edges_events": _q_edges_events,
        "eigenvector_copurchase": _q_eigenvector_copurchase,
        "embedding_clusters": _q_embedding_clusters,
        "embedding_near_dups": _q_embedding_near_dups,
        "kmeans_embeddings": _q_kmeans_embeddings,
        "knn_graph": _q_knn_graph,
        "language_id": _q_langid,
        "minhash_dedup": _q_minhash_dedup,
        "neighbor_mean": _q_neighbor_mean,
        "ngram_contamination": _q_ngram_contamination,
        "ngram_jaccard": _q_ngram_jaccard,
        "pack_sequences": _q_pack_sequences,
        "pagerank_copurchase": _q_pagerank_copurchase,
        "perplexity": _q_perplexity,
        "pii_scrub": _q_pii_scrub,
        "quality_filter": _q_quality_filter,
        "quality_score": _q_quality,
        "repetition_stats": _q_repetition_stats,
        "semantic_near_dups": _q_semantic_near_dups,
        "session_stats_events": _q_session_stats_events,
        "simhash_near_dups": _q_simhash_near_dups,
        "stratified_sample": _q_stratified_sample,
        "strip_boilerplate": _q_strip_boilerplate,
        "tfidf_topk": _q_tfidf_topk,
        "token_stats": _q_token_stats,
        "vocab_growth": _q_vocab_growth,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_matches": _q_winnow_matches,
        "word_histogram": _q_word_histogram,
        # --- flagship canaries (the hard signal touches the
        # engine's core every round) ---
        "betweenness_events": _q_betweenness_events,
        "sssp_events": _q_sssp_events,
        "components_events": _q_components_events,
        "pagerank_events": _q_pagerank_events,
        "triangle_count_copurchase": _q_triangle_count_copurchase,
        "transcript_edges": _q_transcript_edges,
        "pagerank_transcripts": _q_pagerank_transcripts,
        # ------------- end of the driver's ~50-key window -------------
        # --- last driver-checked in r03/r04 ---
        "conversation_progress_transcripts": _q_conversation_progress_transcripts,
        "betweenness_sample3": _q_betweenness_sample3,
        "betweenness_sample4": _q_betweenness_sample4,
        "betweenness_decomposed_custorder": _q_betweenness_decomposed_custorder,
        "closeness_bsp_custorder": _q_closeness_bsp_custorder,
        "closeness_sampled_events": _q_closeness_sampled_events,
        "eccentricity_bsp_events": _q_eccentricity_bsp_events,
        "condensation_lineitem": _q_condensation_lineitem,
        "temporal_reach_events": _q_temporal_reach_events,
        "temporal_departure_events": _q_temporal_departure_events,
        "matching_events": _q_matching_events,
        "coarsen_events": _q_coarsen_events,
        "partition_events": _q_partition_events,
        "edge_cut_events": _q_edge_cut_events,
        "partition_vcycle_events": _q_partition_vcycle_events,
        "louvain_custorder": _q_louvain_custorder,
        "modularity_custorder": _q_modularity_custorder,
        "adamic_adar_events": _q_adamic_adar_events,
        "jaccard_events": _q_jaccard_events,
        "resource_allocation_events": _q_resource_allocation_events,
        "pref_attachment_events": _q_pref_attachment_events,
        "assortativity_copurchase": _q_assortativity_copurchase,
        "degree_skew_copurchase": _q_degree_skew_copurchase,
        "rich_club_events": _q_rich_club_events,
        "graph_summary_copurchase": _q_graph_summary_copurchase,
        "edge_support_copurchase": _q_edge_support_copurchase,
        "triangle_count_sampled_copurchase": _q_triangle_count_sampled_copurchase,
        "ego_network_events": _q_ego_network_events,
        "ego_edges_events": _q_ego_edges_events,
        "four_cliques_events": _q_four_cliques_events,
        "four_clique_count_copurchase": _q_four_clique_count_copurchase,
        "butterflies_events": _q_butterflies_events,
        "butterflies_per_user_events": _q_butterflies_per_user_events,
        "bipartite_project_events": _q_bipartite_project_events,
        "wl_labels_events": _q_wl_labels_events,
        "wl_hash_events": _q_wl_hash_events,
        "random_walks_events": _q_random_walks_events,
        "node2vec_walks_events": _q_node2vec_walks_events,
        "sample_neighbors_events": _q_sample_neighbors_events,
        "mis_events": _q_mis_events,
        "coloring_events": _q_coloring_events,
        "anf_reach_events": _q_anf_reach_events,
        "eff_diameter_events": _q_eff_diameter_events,
        "betweenness_custorder": _q_betweenness_custorder,
        "betweenness_bsp_custorder": _q_betweenness_bsp_custorder,
        "betweenness_weighted_events": _q_betweenness_weighted_events,
        "betweenness_decomposed_events": _q_betweenness_decomposed_events,
        "betweenness_sampled_events": _q_betweenness_sampled_events,
        "edge_betweenness_events": _q_edge_betweenness_events,
        "betweenness_sample1": _q_betweenness_sample1,
        "betweenness_sample2": _q_betweenness_sample2,
        "closeness_events": _q_closeness_events,
        "closeness_custorder": _q_closeness_custorder,
        "closeness_weighted_events": _q_closeness_weighted_events,
        "harmonic_events": _q_harmonic_events,
        "harmonic_weighted_events": _q_harmonic_weighted_events,
        "eccentricity_events": _q_eccentricity_events,
        "eccentricity_weighted_events": _q_eccentricity_weighted_events,
        "graph_extent_events": _q_graph_extent_events,
        "shortest_path_events": _q_shortest_path_events,
        "conversation_stats_transcripts": _q_conversation_stats_transcripts,
        "tool_transitions_transcripts": _q_tool_transitions_transcripts,
        "reply_invariant_transcripts": _q_reply_invariant_transcripts,
        "pagerank_weighted_transcripts": _q_pagerank_weighted_transcripts,
        "betweenness_transcripts": _q_betweenness_transcripts,
        "triangles_per_vertex_copurchase": _q_triangles_per_vertex_copurchase,
        "transitivity_copurchase": _q_transitivity_copurchase,
        "clustering_copurchase": _q_clustering_copurchase,
        "lpa_events": _q_lpa_events,
        "lpa_weighted_events": _q_lpa_weighted_events,
        "pagerank_residuals_events": _q_pagerank_residuals_events,
        "pagerank_weighted_events": _q_pagerank_weighted_events,
        "ppr_events": _q_ppr_events,
        "katz_events": _q_katz_events,
        "hits_events": _q_hits_events,
        "salsa_events": _q_salsa_events,
        "bcc_histogram_custorder": _q_bcc_histogram_custorder,
        "articulation_custorder": _q_articulation_custorder,
        "bridges_events": _q_bridges_events,
        "two_edge_components_events": _q_two_edge_components_events,
        "pendant_peel_custorder": _q_pendant_peel_custorder,
        "core_numbers_custorder": _q_core_numbers_custorder,
        "temporal_arrival_events": _q_temporal_arrival_events,
        "partition_refined_events": _q_partition_refined_events,
        "edge_cut_refined_events": _q_edge_cut_refined_events,
        "scc_lineitem": _q_scc_lineitem,
    }


# ---------------------------------------------------------------- oracles

def oracle_sql() -> dict[str, str]:
    return {
        "token_stats": token_stats_sql(),
        "pii_scrub": f"WITH injected AS ({PII_INJECT_SQL})\n"
        + pii_scrub_sql(source="injected"),
        "repetition_stats": repetition_stats_sql(),
        "strip_boilerplate": strip_boilerplate_sql(min_docs=2),
        "ngram_contamination": ngram_contamination_sql(CONTAM_EVAL_SOURCE, n=3),
        "stratified_sample": stratified_sample_sql(fraction=0.3),
        "curate_corpus": curate_corpus_sql(CONTAM_EVAL_SOURCE, fraction=0.5),
        "curation_funnel": curation_funnel_sql(CONTAM_EVAL_SOURCE, fraction=0.5),
        "pack_sequences": pack_sequences_sql(seq_len=1000),
        "vocab_growth": vocab_growth_sql(),
        "winnow_fingerprints": __import__(
            "centrality_gpu_spark.operators.text",
            fromlist=["winnow_fingerprints_sql"],
        ).winnow_fingerprints_sql(),
        "winnow_matches": __import__(
            "centrality_gpu_spark.operators.text",
            fromlist=["winnow_matches_sql"],
        ).winnow_matches_sql(min_shared=2),
        "word_histogram": (
            "SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
            "'\\s+'), x -> x <> '')) AS w FROM documents"
            ") GROUP BY w ORDER BY w"
        ),
        # streaming fold twin (see streaming_components_fold_events)
        "streaming_vocab_fold": (
            "SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
            "'\\s+'), x -> x <> '')) AS w FROM documents"
            ") GROUP BY w ORDER BY w"
        ),
        "quality_score": quality_score_sql(),
        "perplexity": perplexity_oracle_sql(),
        "duplicate_ngrams": duplicate_ngram_oracle_sql(n=5),
        "dsir_weights": dsir_oracle_sql(DSIR_TARGET_WHERE),
        "span_dedup": span_dedup_oracle_sql(
            k=15,
            source="injected",
            extra_cte=f"injected AS ({SPAN_INJECT_SQL})",
        ),
        "char_entropy": char_entropy_sql(),
        "quality_filter": quality_filter_sql(),
        "language_id": language_id_sql(),
        "dedup_exact": f"WITH {EXACT_DUP_SQL}\n"
        "SELECT fp, COUNT(*) AS n_docs FROM fp GROUP BY fp "
        "HAVING COUNT(*) > 1 ORDER BY fp",
        "session_stats_events": session_stats_oracle_sql(),
        "tfidf_topk": tfidf_oracle_sql(k=5),
        "bm25_topk": bm25_oracle_sql(BM25_QUERY, k=10),
        "ngram_jaccard": ngram_jaccard_sql(threshold=0.5),
        "minhash_dedup": minhash_oracle_sql(threshold=0.5),
        # streaming fold twin (see streaming_components_fold_events)
        "streaming_dedup_fold": minhash_oracle_sql(threshold=0.5),
        "simhash_near_dups": simhash_oracle_sql(max_hamming=8),
        "dedup_clusters": dedup_clusters_oracle_sql(threshold=0.5),
        "ann_topk": cosine_topk_oracle_sql(k=5, where="vec_id < 200"),
        "ann_lsh": lsh_oracle_sql(k=5, where="vec_id < 200"),
        "knn_graph": knn_graph_oracle_sql(
            k=10, n_planes=8, n_tables=6, where="vec_id < 200"
        ),
        "embedding_clusters": embedding_clusters_oracle_sql(
            threshold=0.3, k=10, n_planes=8, n_tables=6, where="vec_id < 200"
        ),
        "neighbor_mean": neighbor_mean_exploded_sql(
            k=10, n_planes=8, n_tables=6, where="vec_id < 200"
        ),
        "ann_ivf": ivf_oracle_sql(k=5, n_cells=8, nprobe=2, where="vec_id < 200"),
        "kmeans_embeddings": kmeans_oracle_sql(
            n_cells=8, where="vec_id < 200"
        ),
        "semantic_near_dups": semantic_near_dups_oracle_sql(
            tau=0.25, n_cells=8, where="vec_id < 200"
        ),
        "embedding_near_dups": embedding_near_dups_oracle_sql(threshold=0.9),
        "edges_events": f"WITH {EVENTS_EDGES_CTE}\n"
        "SELECT src, dst, weight FROM edges ORDER BY src, dst",
        "edges_copurchase": f"WITH {COPURCHASE_EDGES_CTE}\n"
        "SELECT src, dst, weight FROM edges ORDER BY src, dst",
        "degrees_events": f"WITH {EVENTS_EDGES_CTE}\n"
        "SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src ORDER BY id",
        "degree_hist_copurchase": f"WITH {COPURCHASE_EDGES_CTE},\n"
        "deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src)\n"
        "SELECT degree, COUNT(*) AS cnt FROM deg GROUP BY degree ORDER BY degree",
        "components_events": f"WITH RECURSIVE {EVENTS_EDGES_CTE},\n"
        "verts AS (SELECT DISTINCT src AS id FROM edges),\n"
        "reach(id, l) AS (\n"
        "  SELECT id, id FROM verts\n"
        "  UNION\n"
        "  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.id\n"
        ")\n"
        "SELECT id, MIN(l) AS component FROM reach GROUP BY id ORDER BY id",
        # streaming fold twin: the incremental accumulator's contract
        # is EXACT equality with the one-shot batch answer, so the
        # batch oracle IS the fold oracle
        "streaming_components_fold_events": f"WITH RECURSIVE {EVENTS_EDGES_CTE},\n"
        "verts AS (SELECT DISTINCT src AS id FROM edges),\n"
        "reach(id, l) AS (\n"
        "  SELECT id, id FROM verts\n"
        "  UNION\n"
        "  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.id\n"
        ")\n"
        "SELECT id, MIN(l) AS component FROM reach GROUP BY id ORDER BY id",
        "component_summary_events": __import__(
            "centrality_gpu_spark.operators.components",
            fromlist=["component_summary_oracle_sql"],
        ).component_summary_oracle_sql(EVENTS_EDGES_CTE),
        "component_summary_custorder": __import__(
            "centrality_gpu_spark.operators.components",
            fromlist=["component_summary_oracle_sql"],
        ).component_summary_oracle_sql(CUSTORDER_EDGES_CTE),
        "pagerank_events": pagerank_oracle_sql(
            EVENTS_EDGES_CTE, iterations=PR_ITERS, round_digits=PR_ROUND
        ),
        "pagerank_copurchase": pagerank_oracle_sql(
            COPURCHASE_EDGES_CTE, iterations=PR_ITERS, round_digits=PR_ROUND
        ),
        "pagerank_residuals_events": pagerank_residuals_oracle_sql(
            EVENTS_EDGES_CTE, iterations=PR_ITERS, round_digits=PR_ROUND
        ),
        "pagerank_weighted_events": pagerank_oracle_sql(
            EVENTS_EDGES_CTE, iterations=PR_ITERS, round_digits=PR_ROUND,
            weighted=True,
        ),
        "triangle_count_sampled_copurchase": sampled_triangle_count_sql(
            COPURCHASE_EDGES_CTE, p=0.25
        ),
        "transitivity_copurchase": transitivity_oracle_sql(COPURCHASE_EDGES_CTE),
        "ego_network_events": __import__(
            "centrality_gpu_spark.operators.bfs",
            fromlist=["ego_network_oracle_sql"],
        ).ego_network_oracle_sql(EVENTS_EDGES_CTE, radius=2, part="vertices"),
        "ego_edges_events": __import__(
            "centrality_gpu_spark.operators.bfs",
            fromlist=["ego_network_oracle_sql"],
        ).ego_network_oracle_sql(EVENTS_EDGES_CTE, radius=2, part="edges"),
        "triangle_count_copurchase": f"WITH {COPURCHASE_EDGES_CTE},\n"
        f"{TRIANGLE_COUNT_SQL}\n"
        "SELECT COUNT(*) AS n_triangles FROM tri",
        # streaming fold twin (see streaming_components_fold_events)
        "streaming_triangles_fold_copurchase": f"WITH {COPURCHASE_EDGES_CTE},\n"
        f"{TRIANGLE_COUNT_SQL}\n"
        "SELECT COUNT(*) AS n_triangles FROM tri",
        "triangles_per_vertex_copurchase": f"WITH {COPURCHASE_EDGES_CTE},\n"
        f"{TRIANGLE_COUNT_SQL},\n"
        "roles AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri"
        " UNION ALL SELECT c FROM tri),\n"
        "cnt AS (SELECT id, COUNT(*) AS n_tri FROM roles GROUP BY id),\n"
        "verts AS (SELECT DISTINCT src AS id FROM edges)\n"
        "SELECT v.id, COALESCE(c.n_tri, 0) AS n_tri\n"
        "FROM verts v LEFT JOIN cnt c ON v.id = c.id ORDER BY v.id",
        "four_cliques_events": four_cliques_per_vertex_oracle_sql(
            EVENTS_EDGES_CTE
        ),
        "four_clique_count_copurchase": f"WITH {COPURCHASE_EDGES_CTE},\n"
        f"{FOUR_CLIQUE_SQL}\n"
        "SELECT COUNT(*) AS n_4cliques FROM quad",
        "bcc_histogram_custorder": "SELECT CAST(2 AS BIGINT) AS size, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM orders",
        "bridges_events": BRIDGES_EVENTS_ORACLE,
        "two_edge_components_events": TWO_EDGE_COMPONENTS_ORACLE,
        "articulation_custorder": "SELECT CAST(o_custkey AS BIGINT) AS id "
        "FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 2 ORDER BY id",
        "pendant_peel_custorder": """
WITH oc AS (
  SELECT CAST(o_custkey AS BIGINT) AS c,
         CAST(o_orderkey + 10000000 AS BIGINT) AS o
  FROM orders
),
cdeg AS (SELECT c, COUNT(*) AS n, MIN(o) AS mo FROM oc GROUP BY c)
SELECT o AS id, CAST(0 AS INTEGER) AS round, c AS parent FROM oc
UNION ALL
SELECT c AS id, CAST(0 AS INTEGER) AS round, mo AS parent FROM cdeg WHERE n = 1
ORDER BY id
""".strip(),
        "clustering_copurchase": f"WITH {COPURCHASE_EDGES_CTE},\n"
        f"{TRIANGLE_COUNT_SQL},\n"
        "roles AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri"
        " UNION ALL SELECT c FROM tri),\n"
        "cnt AS (SELECT id, COUNT(*) AS n_tri FROM roles GROUP BY id)\n"
        "SELECT d.id,\n"
        "  ROUND(CASE WHEN d.degree >= 2\n"
        "        THEN 2.0 * COALESCE(c.n_tri, 0) / (d.degree * (d.degree - 1))\n"
        "        ELSE 0.0 END, 6) AS clustering\n"
        "FROM deg d LEFT JOIN cnt c ON d.id = c.id ORDER BY d.id",
        # star forest: every vertex has core number exactly 1
        "core_numbers_custorder": """
SELECT CAST(o_custkey AS BIGINT) AS id, CAST(1 AS INTEGER) AS core
FROM (SELECT DISTINCT o_custkey FROM orders)
UNION ALL
SELECT CAST(o_orderkey + 10000000 AS BIGINT) AS id, CAST(1 AS INTEGER) AS core
FROM orders ORDER BY id
""".strip(),
        "lpa_events": lpa_oracle_sql(EVENTS_EDGES_CTE, iterations=LPA_ITERS),
        "lpa_weighted_events": lpa_oracle_sql(
            EVENTS_EDGES_CTE, iterations=LPA_ITERS, weighted=True
        ),
        # unrolled-APSP oracles (recursive-walk distances + per-level
        # sigma unroll + pair-dependency sum; diameter(sf0.01 events)=2,
        # unrolled to 8 for margin):
        "betweenness_events": brandes_apsp_oracle_sql(EVENTS_EDGES_CTE),
        # the reference's own sample fixtures (VALUES CTEs, diameter<=8):
        "betweenness_sample1": brandes_apsp_oracle_sql(_sample_cte(1)),
        "betweenness_sample2": brandes_apsp_oracle_sql(_sample_cte(2)),
        "betweenness_sample3": brandes_apsp_oracle_sql(_sample_cte(3)),
        "betweenness_sample4": brandes_apsp_oracle_sql(_sample_cte(4)),
        "betweenness_weighted_events": brandes_weighted_oracle_sql(
            WEVENTS_EDGES_CTE
        ),
        "edge_betweenness_events": edge_betweenness_oracle_sql(EVENTS_EDGES_CTE),
        "butterflies_events": butterfly_oracle_sql(BIPARTITE_EVENTS_CTE),
        "butterflies_per_user_events": butterflies_per_left_oracle_sql(
            BIPARTITE_EVENTS_CTE
        ),
        "bipartite_project_events": bipartite_project_oracle_sql(
            BIPARTITE_EVENTS_CTE, max_right_degree=1000
        ),
        "wl_labels_events": wl_labels_oracle_sql(EVENTS_EDGES_CTE),
        "wl_hash_events": wl_graph_hash_oracle_sql(EVENTS_EDGES_CTE),
        "temporal_arrival_events": earliest_arrival_oracle_sql(
            EVENTS_TEMPORAL_CTE, TEMPORAL_SOURCES_SQL
        ),
        "temporal_reach_events": temporal_reach_summary_oracle_sql(
            EVENTS_TEMPORAL_CTE, TEMPORAL_SOURCES_SQL
        ),
        "temporal_departure_events": latest_departure_oracle_sql(
            EVENTS_TEMPORAL_CTE, TEMPORAL_SOURCES_SQL, TEMPORAL_END_TS
        ),
        "matching_events": matching_oracle_sql(EVENTS_EDGES_CTE),
        "coarsen_events": contraction_oracle_sql(EVENTS_EDGES_CTE),
        "partition_events": partition_oracle_sql(
            EVENTS_EDGES_CTE, PARTITION_K, **PARTITION_ORACLE_KW
        ),
        "edge_cut_events": edge_cut_oracle_sql(
            EVENTS_EDGES_CTE, PARTITION_K, **PARTITION_ORACLE_KW
        ),
        "partition_refined_events": refined_partition_oracle_sql(
            EVENTS_EDGES_CTE, PARTITION_K,
            refine_rounds=REFINE_QUERY_ROUNDS, **PARTITION_ORACLE_KW
        ),
        "edge_cut_refined_events": refined_edge_cut_oracle_sql(
            EVENTS_EDGES_CTE, PARTITION_K,
            refine_rounds=REFINE_QUERY_ROUNDS, **PARTITION_ORACLE_KW
        ),
        # full V-cycle at the pinned 2-level configuration — closes the
        # registry's former rows-only row (VERDICT r3 item #3)
        "partition_vcycle_events": __import__(
            "centrality_gpu_spark.operators.partition",
            fromlist=["vcycle_oracle_sql"],
        ).vcycle_oracle_sql(
            EVENTS_EDGES_CTE, PARTITION_K, levels=VCYCLE_LEVELS,
            match_rounds=8, refine_rounds=REFINE_QUERY_ROUNDS,
        ),
        "shortest_path_events": shortest_path_oracle_sql(
            EVENTS_EDGES_CTE, PATH_SOURCE, PATH_TARGET
        ),
        # --- north-rule transcripts pipeline (full-chain twins over the
        # synthesized input_hint table, testdata_graphs.TRANSCRIPTS_CTE) ---
        "conversation_stats_transcripts": (
            "WITH " + TRANSCRIPTS_CTE + ",\n"
            + _CONVERSATION_STATS_SQL[len("WITH ") :]
            if _CONVERSATION_STATS_SQL.startswith("WITH ")
            else f"WITH {TRANSCRIPTS_CTE}\n{_CONVERSATION_STATS_SQL}"
        ),
        "tool_transitions_transcripts": (
            "WITH " + TRANSCRIPTS_CTE + ",\n"
            + _TOOL_TRANSITIONS_SQL[len("WITH ") :]
        ),
        "conversation_progress_transcripts": (
            "WITH " + TRANSCRIPTS_CTE + ",\n"
            + _conversation_progress_oracle_sql()[len("WITH ") :]
        ),
        "reply_invariant_transcripts": f"""WITH {TRANSCRIPTS_CTE},
tr_checked AS (
  SELECT text,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) || ':' || role
           AS prefix,
         turn_idx,
         LEAD(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS next_idx
  FROM transcripts
)
SELECT CAST(SUM(CASE WHEN NOT starts_with(text, prefix)
                       OR (next_idx IS NOT NULL AND next_idx <> turn_idx + 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(COUNT(*) AS BIGINT) AS n_turns
FROM tr_checked""",
        "transcript_edges": f"WITH {TRANSCRIPT_EDGES_CTE}\n"
        "SELECT src, dst, weight FROM edges ORDER BY src, dst",
        "pagerank_transcripts": pagerank_oracle_sql(
            TRANSCRIPT_EDGES_CTE, iterations=PR_ITERS, round_digits=PR_ROUND
        ),
        "pagerank_weighted_transcripts": pagerank_oracle_sql(
            TRANSCRIPT_EDGES_CTE, iterations=PR_ITERS,
            round_digits=PR_ROUND, weighted=True,
        ),
        "betweenness_transcripts": brandes_apsp_oracle_sql(
            TRANSCRIPT_EDGES_CTE
        ),
        "eccentricity_weighted_events": eccentricity_weighted_oracle_sql(
            WEVENTS_EDGES_CTE
        ),
        "closeness_weighted_events": closeness_weighted_oracle_sql(
            WEVENTS_EDGES_CTE
        ),
        "harmonic_weighted_events": harmonic_weighted_oracle_sql(WEVENTS_EDGES_CTE),
        "closeness_sampled_events": closeness_sampled_oracle_sql(
            EVENTS_EDGES_CTE, n_samples=BC_SAMPLES
        ),
        "betweenness_sampled_events": betweenness_sampled_oracle_sql(
            EVENTS_EDGES_CTE, n_samples=BC_SAMPLES
        ),
        "random_walks_events": random_walks_oracle_sql(
            EVENTS_EDGES_CTE, walk_length=RW_LEN, walks_per_vertex=RW_PER_VERTEX
        ),
        "sample_neighbors_events": sample_neighbors_oracle_sql(
            EVENTS_EDGES_CTE, fanouts=GS_FANOUTS
        ),
        "node2vec_walks_events": node2vec_oracle_sql(
            EVENTS_EDGES_CTE, walk_length=RW_LEN,
            walks_per_vertex=RW_PER_VERTEX, p=N2V_P, q=N2V_Q,
        ),
        "betweenness_decomposed_events": brandes_apsp_oracle_sql(EVENTS_EDGES_CTE),
        "closeness_events": closeness_apsp_oracle_sql(EVENTS_EDGES_CTE),
        "eccentricity_events": eccentricity_apsp_oracle_sql(EVENTS_EDGES_CTE),
        "eccentricity_bsp_events": eccentricity_apsp_oracle_sql(EVENTS_EDGES_CTE),
        "graph_extent_events": extent_apsp_oracle_sql(EVENTS_EDGES_CTE),
        "harmonic_events": harmonic_apsp_oracle_sql(EVENTS_EDGES_CTE),
        "hits_events": hits_oracle_sql(
            EVENTS_DIRECTED_CTE, iterations=HITS_ITERS, round_digits=PR_ROUND
        ),
        "salsa_events": salsa_oracle_sql(EVENTS_DIRECTED_CTE),
        "adamic_adar_events": adamic_adar_oracle_sql(
            EVENTS_EDGES_CTE, min_common=1, round_digits=PR_ROUND
        ),
        "ppr_events": ppr_oracle_sql(
            EVENTS_EDGES_CTE,
            "seeds AS (SELECT DISTINCT src AS id FROM edges ORDER BY id "
            f"LIMIT {PPR_SEEDS})",
            iterations=PPR_ITERS, round_digits=PR_ROUND,
        ),
        "eigenvector_copurchase": eigenvector_oracle_sql(
            COPURCHASE_EDGES_CTE, iterations=EV_ITERS, round_digits=PR_ROUND
        ),
        "katz_events": katz_oracle_sql(
            EVENTS_EDGES_CTE, alpha=KATZ_ALPHA, iterations=KATZ_ITERS,
            round_digits=PR_ROUND,
        ),
        "jaccard_events": jaccard_oracle_sql(EVENTS_EDGES_CTE, min_common=1),
        "resource_allocation_events": resource_allocation_oracle_sql(
            EVENTS_EDGES_CTE, min_common=1
        ),
        "pref_attachment_events": preferential_attachment_oracle_sql(
            EVENTS_EDGES_CTE, min_common=1
        ),
        "degree_skew_copurchase": degree_skew_oracle_sql(
            COPURCHASE_EDGES_CTE
        ),
        "assortativity_copurchase": assortativity_oracle_sql(
            COPURCHASE_EDGES_CTE
        ),
        "rich_club_events": rich_club_oracle_sql(EVENTS_EDGES_CTE),
        "graph_summary_copurchase": graph_summary_oracle_sql(
            COPURCHASE_EDGES_CTE
        ),
        "edge_support_copurchase": f"WITH {COPURCHASE_EDGES_CTE},\n"
        f"{EDGE_SUPPORT_SQL}\n"
        "SELECT u, v, support FROM esup ORDER BY u, v",
        "modularity_custorder": modularity_sql(
            CUSTORDER_EDGES_CTE, CUSTORDER_COMMUNITIES_CTE
        ),
        "louvain_custorder": LOUVAIN_CUSTORDER_SQL,
        "betweenness_custorder": BETWEENNESS_CUSTORDER_SQL,
        "betweenness_bsp_custorder": BETWEENNESS_CUSTORDER_SQL,
        "betweenness_decomposed_custorder": BETWEENNESS_CUSTORDER_SQL,
        "closeness_custorder": CLOSENESS_CUSTORDER_SQL,
        "closeness_bsp_custorder": CLOSENESS_CUSTORDER_SQL,
        "scc_lineitem": scc_oracle_sql(LINEITEM_CYCLE_CTE),
        "condensation_lineitem": condensation_oracle_sql(LINEITEM_CYCLE_CTE),
        "mis_events": mis_oracle_sql(EVENTS_EDGES_CTE),
        "coloring_events": jp_coloring_oracle_sql(EVENTS_EDGES_CTE),
        "anf_reach_events": anf_oracle_sql(EVENTS_EDGES_CTE, max_hops=ANF_HOPS),
        "eff_diameter_events": effective_diameter_oracle_sql(
            EVENTS_EDGES_CTE, max_hops=ANF_HOPS
        ),
        "sssp_events": f"WITH RECURSIVE {EVENTS_EDGES_CTE},\n"
        "walk(vertex, dist) AS (\n"
        "  SELECT (SELECT MIN(src) FROM edges), 0\n"
        "  UNION\n"
        "  SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.vertex\n"
        "  WHERE w.dist < 24\n"
        ")\n"
        "SELECT vertex, CAST(MIN(dist) AS BIGINT) AS dist\n"
        "FROM walk GROUP BY vertex ORDER BY vertex",
    }
