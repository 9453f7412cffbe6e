"""Transcripts → edge table: the engine's primary edge builder
(SURVEY.md §7 step 1; north rule: vertices = conversations/tools, edges
from reply adjacency and tool invocation under stable turn ordering).

Edge types:

- ``tool``: conv → tool bipartite, weight = invocation count (the
  reference's S1 scan analog over Iceberg/parquet instead of text).
- ``coinvocation``: conv – conv projection through shared tools
  (weight = number of shared tools). This is what reproduces the
  reference sample graphs exactly from the embedded fixtures.
  **Skew note**: a hub tool invoked by k conversations emits C(k,2)
  pairs; ``max_tool_degree`` caps projection fan-out (standard
  co-occurrence-projection practice) — at 10¹²-turn scale an uncapped
  hub would be quadratic. The cap is an explicit, documented semantic.
- ``reply``: tool – tool edges from consecutive tool-bearing turns
  within a conversation (``lead() over (partition by conv_id order by
  turn_idx)`` — the stable-ordering invariant lives here), weight =
  handoff count summed over both directions. The graph-edge face of
  ``tool_transitions``; self-handoffs are dropped by the Graph ctor's
  self-loop guard. Turn-level reply chains additionally surface as
  count stats (``conversation_stats``, ``reply_chain_check``).

Vertex ids: string ids (conv_id / tool name) relabeled to dense longs
(P3, ``modified_apsp.cpp:336-358``). ``id_mode="dense"`` assigns
rank-in-sorted-order ids via a two-phase distributed prefix sum
(range-repartition + per-partition counts + partition-local ranks) —
exact, deterministic, and fully parallel: no single-partition window
anywhere on the default path. ``id_mode="hash"`` uses xxhash64 — no
sort shuffle at all, for when dense 0..n−1 ids aren't needed
(collision probability ~n²/2⁶⁴).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.ids import dense_rank_ids


@dataclass
class TranscriptGraph:
    graph: Graph
    vertex_map: DataFrame  # (id:long, name:string, kind:string)


def vertex_ids(transcripts: DataFrame, id_mode: str = "dense") -> DataFrame:
    """Distinct conv ∪ tool names → (id, name, kind)."""
    convs = transcripts.select(F.col("conv_id").alias("name")).distinct().withColumn(
        "kind", F.lit("conv")
    )
    tools = (
        transcripts.where(F.col("tool").isNotNull())
        .select(F.col("tool").alias("name"))
        .distinct()
        .withColumn("kind", F.lit("tool"))
    )
    names = convs.unionByName(tools)
    # id derives from (kind, name): a tool whose name collides with a
    # conv_id must still get its own vertex
    if id_mode == "hash":
        return names.select(
            F.xxhash64("kind", "name").alias("id"), "name", "kind"
        )
    return dense_rank_ids(names, ("name", "kind"))


def tool_invocations(transcripts: DataFrame) -> DataFrame:
    """(conv_id, tool, n_invocations) — pushed-down scan of 2 columns."""
    return (
        transcripts.where(F.col("tool").isNotNull())
        .groupBy("conv_id", "tool")
        .agg(F.count("*").alias("n"))
    )


def transcript_graph(
    transcripts: DataFrame,
    edge_types: tuple[str, ...] = ("tool", "coinvocation"),
    max_tool_degree: int | None = 1000,
    id_mode: str = "dense",
) -> TranscriptGraph:
    """Build the canonical Graph from a transcripts table.

    Plan shape (100 TB lens): vertex ids are resolved on the PRE-fan-out
    tables — the (conv, tool) invocation list (one shuffle join on
    conv_id, before the quadratic co-invocation projection multiplies
    rows) and the broadcast-sized tool vocabulary — so every downstream
    shuffle (the projection self-join, the pair groupBy, symmetrize)
    keys on longs, and the edge table never round-trips through a
    string join. The old shape joined the *post*-projection edge list
    (~5.9M string-keyed rows at sf0.1 bench scale, quadratically more
    at 100×) against the vertex map twice; resolving first cut the
    sf0.1 build from 13.6 s to the invocation-join cost.

    The endpoint KIND still guards collisions: a tool name equal to
    some conv_id maps to its own vertex because conv ids resolve
    against the kind='conv' slice and tool names against kind='tool'.
    """
    vmap = vertex_ids(transcripts, id_mode=id_mode).persist()
    conv_ids = vmap.where(F.col("kind") == "conv").select(
        F.col("name").alias("conv_id"), F.col("id").alias("conv_vid")
    )
    # tool vocabulary is small by construction — always broadcast
    tool_ids = F.broadcast(
        vmap.where(F.col("kind") == "tool").select(
            F.col("name").alias("tool"), F.col("id").alias("tool_vid")
        )
    )
    # localCheckpoint (eager) rather than persist: the builder returns a
    # lazy graph, so a persist-then-unpersist inside this function would
    # be a no-op (nothing materializes the cache before the caller's
    # first action) and a bare persist would leak for the app lifetime.
    # One small job here materializes the id-resolved invocation table
    # that every edge branch (tool list, degree cap, both sides of the
    # co-invocation self-join) reuses. Long ids only — the string name
    # stays out of the shuffled table.
    inv = (
        tool_invocations(transcripts)
        .join(tool_ids, "tool")
        .join(conv_ids, "conv_id")
        .select("tool_vid", "conv_vid", "n")
        .localCheckpoint(eager=True)
    )

    id_edges: list[DataFrame] = []
    if "tool" in edge_types:
        id_edges.append(
            inv.select(
                F.col("conv_vid").alias("src"),
                F.col("tool_vid").alias("dst"),
                F.col("n").cast("double").alias("weight"),
            )
        )
    if "coinvocation" in edge_types:
        proj_inv = inv
        if max_tool_degree is not None:
            tool_deg = inv.groupBy("tool_vid").agg(F.count("*").alias("td"))
            proj_inv = inv.join(
                F.broadcast(tool_deg.where(F.col("td") <= max_tool_degree)),
                "tool_vid",
            )
        l = proj_inv.select("tool_vid", F.col("conv_vid").alias("a"))
        r = proj_inv.select("tool_vid", F.col("conv_vid").alias("b"))
        pairs = (
            l.join(r, "tool_vid")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("shared"))
        )
        id_edges.append(
            pairs.select(
                F.col("a").alias("src"),
                F.col("b").alias("dst"),
                F.col("shared").cast("double").alias("weight"),
            )
        )

    if "reply" in edge_types:
        tt = tool_transitions(transcripts)
        undirected = (
            tt.where(F.col("src_tool") != F.col("dst_tool"))
            .groupBy(
                F.least("src_tool", "dst_tool").alias("ta"),
                F.greatest("src_tool", "dst_tool").alias("tb"),
            )
            .agg(F.sum("n").cast("double").alias("weight"))
        )
        ta = tool_ids.withColumnRenamed("tool", "ta").withColumnRenamed(
            "tool_vid", "src"
        )
        tb = tool_ids.withColumnRenamed("tool", "tb").withColumnRenamed(
            "tool_vid", "dst"
        )
        id_edges.append(
            undirected.join(ta, "ta").join(tb, "tb").select(
                "src", "dst", "weight"
            )
        )

    from centrality_gpu_spark.graph import union_all

    edges = union_all(id_edges)
    # The three edge lists are pairwise-unique and self-loop-free BY
    # CONSTRUCTION (disjoint vertex kinds between lists; strict a<b /
    # least<greatest canonicalization within each; conv≠tool always),
    # so the canonical invariant holds after a bare symmetrize —
    # from_undirected_edges' dedup groupBy would re-shuffle the full
    # edge table (11.8M rows at sf0.1 bench scale) for nothing. Hash
    # id_mode collisions could in principle violate this (~n²/2⁶⁴,
    # documented in vertex_ids); dense mode cannot.
    sym = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    sym = sym.unionByName(
        sym.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    g = Graph.from_symmetric_edges(sym)
    return TranscriptGraph(g, vmap)


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile over the north-rule input table:
    (conv_id, n_turns, n_tool_calls, n_distinct_tools, n_user,
    n_assistant, duration_us, avg_text_len). One groupBy over the raw
    turns — the first thing a pipeline computes to size/skew-plan the
    graph build (turn counts bound reply chains; tool-call counts bound
    the bipartite fan-out). ``duration_us`` = max(ts) − min(ts) in
    epoch-microseconds (exact integers, oracle-safe); ``avg_text_len``
    rounded to 6 dp."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.count("tool").alias("n_tool_calls"),
            F.countDistinct("tool").alias("n_distinct_tools"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias(
                "n_user"
            ),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
                "n_assistant"
            ),
            (
                F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))
            ).alias("duration_us"),
            F.round(F.avg(F.length("text")), 6).alias("avg_text_len"),
        )
    )


CONVERSATION_STATS_SQL = """
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(tool) AS BIGINT) AS n_tool_calls,
       CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_distinct_tools,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_assistant,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
       ROUND(AVG(LENGTH(text)), 6) AS avg_text_len
FROM transcripts GROUP BY conv_id ORDER BY conv_id
""".strip()


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """(src_tool, dst_tool, n, p) — the tool-to-tool Markov transition
    matrix: for consecutive tool-bearing turns within a conversation
    (under the input_hint's stable (conv_id, turn_idx) ordering),
    count src→dst handoffs and normalize per source tool
    (p = n / Σ_dst n, rounded 6 dp; self-transitions included).

    The agent-behavior profile a transcripts pipeline reports next to
    ``conversation_stats``: which tool follows which. Plan shape: one
    window shuffle keyed by conv_id (the natural partition key — each
    conversation's turns are tiny), one (src, dst) groupBy over the
    transition stream, and a per-source total join that is
    broadcast-sized (the tool vocabulary is small by construction).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = (
        transcripts.where(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool")
        .select(
            F.col("tool").alias("src_tool"),
            F.lead("tool").over(w).alias("dst_tool"),
        )
        .where(F.col("dst_tool").isNotNull())
    )
    trans = seq.groupBy("src_tool", "dst_tool").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = trans.groupBy("src_tool").agg(F.sum("n").alias("t"))
    return trans.join(F.broadcast(tot), "src_tool").select(
        "src_tool",
        "dst_tool",
        "n",
        F.round(F.col("n") / F.col("t"), 6).alias("p"),
    )


TOOL_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT tool AS src_tool,
         LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS dst_tool
  FROM transcripts WHERE tool IS NOT NULL
),
trans AS (
  SELECT src_tool, dst_tool, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE dst_tool IS NOT NULL GROUP BY src_tool, dst_tool
),
tot AS (SELECT src_tool, SUM(n) AS t FROM trans GROUP BY src_tool)
SELECT tr.src_tool, tr.dst_tool, tr.n, ROUND(tr.n / tot.t, 6) AS p
FROM trans tr JOIN tot USING (src_tool)
ORDER BY tr.src_tool, tr.dst_tool
""".strip()


def reply_chain_check(transcripts: DataFrame) -> DataFrame:
    """The stable-turn-ordering invariant (input_hint): per-turn text
    must equal ``{conv_id}:{turn_idx}:{role}<suffix>``, and turn_idx
    must be dense (lead = idx+1) under (conv_id, turn_idx) ordering.

    Returns one row per violation — empty DataFrame ⇔ invariant holds.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    checked = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.lead("turn_idx").over(w).alias("next_idx"),
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"), "role").alias(
            "prefix"
        ),
    )
    bad_text = ~F.col("text").startswith(F.col("prefix"))
    bad_chain = F.col("next_idx").isNotNull() & (
        F.col("next_idx") != F.col("turn_idx") + 1
    )
    return checked.where(bad_text | bad_chain)
