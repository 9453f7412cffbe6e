"""Graph builders over the driver's testdata tables, each paired with a
DuckDB SQL CTE that derives the *identical* edge set.

The driver's correctness gate runs our Spark ``queries()`` against
DuckDB ``oracle_sql()`` on the same parquet files, so every graph used
in an oracle-checked query is defined twice — once as DataFrame ops,
once as a SQL CTE named ``edges`` — in this one module, to keep them in
lockstep.

Two graphs:

- **events graph** — bipartite actor→object adjacency (``user_id`` ↔
  ``event_type``), the testdata analog of the transcripts' conv↔tool
  edges (FIXTURES.md §6). Weight = invocation count.
- **copurchase graph** — parts co-occurring in an order (lineitem
  self-join). Non-bipartite, triangle-rich; exercises triangle counting
  and gives a larger vertex set for PageRank/CC oracles.

Vertex-id scheme (must be SQL-replicable, hence no zipWithIndex):
users keep ``user_id``; event types get ``1_000_000 + dense_rank``
over alphabetical order — deterministic dense relabel (P3 analog,
``modified_apsp.cpp:336-358``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from centrality_gpu_spark.graph import Graph

TOOL_VERTEX_OFFSET = 1_000_000


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _type_ids(ev: DataFrame) -> DataFrame:
    """(event_type, tvid) — OFFSET + 1-based alphabetical rank, same ids
    as the SQL twin's ``1000000 + DENSE_RANK() OVER (ORDER BY
    event_type)``. The type vocabulary is bounded by construction (like
    the transcripts' tool vocabulary), so the rank is a driver-side
    enumerate over a TakeOrdered collect — no unpartitioned window, no
    full-table funnel through one task."""
    dt = ev.select("event_type").distinct().orderBy("event_type")
    rows = dt.collect()
    schema = StructType([dt.schema[0], StructField("tvid", LongType())])
    return ev.sparkSession.createDataFrame(
        [(r.event_type, TOOL_VERTEX_OFFSET + i + 1) for i, r in enumerate(rows)],
        schema,
    )


# ---------------------------------------------------------------- events

def events_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Bipartite user↔event_type graph from ``events``."""
    ev = load(spark, sf_dir, "events")
    # aggregate first: shrinks |events| rows to |user×type| before the join
    inv = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("w"))
    tid = _type_ids(ev)
    base = inv.join(F.broadcast(tid), "event_type").select(
        F.col("user_id").cast("long").alias("src"),
        F.col("tvid").cast("long").alias("dst"),
        F.col("w").cast("double").alias("weight"),
    )
    return Graph.from_undirected_edges(base, weight_col="weight")


def events_directed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DIRECTED user→event_type invocation arrow (deduped), before
    symmetrization — the conv→tool edge of the transcript model. Input
    for direction-sensitive operators (HITS)."""
    ev = load(spark, sf_dir, "events")
    tid = _type_ids(ev)
    return (
        ev.select("user_id", "event_type")
        .distinct()
        .join(F.broadcast(tid), "event_type")
        .select(
            F.col("user_id").cast("long").alias("src"),
            F.col("tvid").cast("long").alias("dst"),
        )
    )


# Directed twin in DuckDB SQL; final CTE is `dedges(src, dst)`.
EVENTS_DIRECTED_CTE = """
tid AS (
  SELECT event_type,
         1000000 + DENSE_RANK() OVER (ORDER BY event_type) AS tvid
  FROM (SELECT DISTINCT event_type FROM events)
),
dedges AS (
  SELECT DISTINCT CAST(ev.user_id AS BIGINT) AS src,
                  CAST(tid.tvid AS BIGINT)   AS dst
  FROM events ev JOIN tid USING (event_type)
)
""".strip()


# The same edge set in DuckDB SQL: prefix for oracle queries, final CTE
# is named `edges` with columns (src, dst, weight), both directions.
EVENTS_EDGES_CTE = """
ev AS (
  SELECT user_id, event_type, COUNT(*) AS w
  FROM events GROUP BY user_id, event_type
),
tid AS (
  SELECT event_type,
         1000000 + DENSE_RANK() OVER (ORDER BY event_type) AS tvid
  FROM (SELECT DISTINCT event_type FROM events)
),
base AS (
  SELECT CAST(ev.user_id AS BIGINT) AS src,
         CAST(tid.tvid AS BIGINT)   AS dst,
         CAST(ev.w AS DOUBLE)       AS weight
  FROM ev JOIN tid USING (event_type)
),
edges AS (
  SELECT src, dst, weight FROM base
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM base
)
""".strip()


# ------------------------------------------------------------ copurchase

def copurchase_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Parts co-occurring in an order: lineitem ⋈ lineitem on orderkey.

    Oriented ``src < dst`` before dedup (the standard triangle-counting
    orientation, J6) then symmetrized by the Graph constructor. At scale
    the self-join shuffles on ``l_orderkey`` — the natural key; AQE
    splits skewed orders.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                      F.col("a.l_partkey") < F.col("b.l_partkey")])
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph.from_undirected_edges(pairs, weight_col="weight")


# ---------------------------------------------------------- cust-order

ORDER_VERTEX_OFFSET = 10_000_000


def custorder_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Bipartite customer↔order star forest — every order has exactly
    one customer, so this graph is all pendants/bridges: the natural
    fixture for pendant peeling, articulation points, and BCC
    decomposition (every edge its own BCC; every multi-order customer
    an articulation point)."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey") + F.lit(ORDER_VERTEX_OFFSET)).cast("long").alias("dst"),
    ).withColumn("weight", F.lit(1.0))
    return Graph.from_undirected_edges(o, weight_col="weight")


CUSTORDER_EDGES_CTE = """
base AS (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey + 10000000 AS BIGINT) AS dst,
         CAST(1.0 AS DOUBLE) AS weight
  FROM orders
),
edges AS (
  SELECT src, dst, weight FROM base
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM base
)
""".strip()


COPURCHASE_EDGES_CTE = """
pairs AS (
  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
                  CAST(b.l_partkey AS BIGINT) AS dst
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM pairs
  UNION ALL
  SELECT dst AS src, src AS dst, CAST(1.0 AS DOUBLE) AS weight FROM pairs
)
""".strip()


# ------------------------------------------------------- lineitem cycles

CYCLE_SUPP_OFFSET = 4_000_000
CYCLE_ORDER_OFFSET = 8_000_000
CYCLE_MAX_ORDERKEY = 300


def lineitem_cycle_edges(
    spark: SparkSession, sf_dir: str, max_orderkey: int = CYCLE_MAX_ORDERKEY
) -> DataFrame:
    """DIRECTED cyclic graph from lineitem: every row spins the 3-cycle
    part → supplier → order → part (offset id spaces keep the roles
    disjoint); shared parts/suppliers chain the little cycles into
    non-trivial SCCs. The orderkey cutoff keeps the mutual-reachability
    oracle tractable. Input for SCC / condensation."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") <= max_orderkey
    )
    p = F.col("l_partkey").cast("long")
    s = (F.col("l_suppkey") + CYCLE_SUPP_OFFSET).cast("long")
    o = (F.col("l_orderkey") + CYCLE_ORDER_OFFSET).cast("long")
    # line-number gates break full strong connectivity: only the first
    # lineitem closes supp→order and the first two close order→part, so
    # the graph has one giant SCC, several mid-size ones, and a large
    # trimmed periphery (the shape trim + coloring must both handle)
    return (
        li.select(p.alias("src"), s.alias("dst"))
        .unionByName(
            li.where(F.col("l_linenumber") == 1)
            .select(s.alias("src"), o.alias("dst"))
        )
        .unionByName(
            li.where(F.col("l_linenumber") <= 2)
            .select(o.alias("src"), p.alias("dst"))
        )
        .distinct()
    )


LINEITEM_CYCLE_CTE = f"""
li AS (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem
       WHERE l_orderkey <= {CYCLE_MAX_ORDERKEY}),
dedges AS (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
                  CAST(l_suppkey + {CYCLE_SUPP_OFFSET} AS BIGINT) AS dst
  FROM li
  UNION
  SELECT DISTINCT CAST(l_suppkey + {CYCLE_SUPP_OFFSET} AS BIGINT),
                  CAST(l_orderkey + {CYCLE_ORDER_OFFSET} AS BIGINT)
  FROM li WHERE l_linenumber = 1
  UNION
  SELECT DISTINCT CAST(l_orderkey + {CYCLE_ORDER_OFFSET} AS BIGINT),
                  CAST(l_partkey AS BIGINT)
  FROM li WHERE l_linenumber <= 2
)
""".strip()


# -------------------------------------------------------------- temporal

def events_temporal_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, ts) — time-stamped user→user *handoff* edges: within
    each ``event_type`` stream ordered by (ts, event_id), the user of
    event i hands off to the user of event i+1, stamped with the later
    event's timestamp in epoch **microseconds** (exact integers in both
    Spark and DuckDB, so oracle hashes match bit for bit). Self-handoffs
    (same user twice in a row) are dropped; parallel edges at different
    times are kept — temporal operators need every occurrence.

    Scale note: the window partitions by ``event_type``, and the
    testdata has few types, so each stream sorts on one task here. At
    100 TB the stream key would be a finer natural key (e.g. per-shard
    streams); the downstream temporal operators are indifferent to how
    the (src, dst, ts) table was produced.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        # ts is TIMESTAMP_NTZ; the session timezone is pinned to UTC
        # (session.py), so the cast interprets the wall-clock as UTC —
        # the same naive-as-UTC convention DuckDB's epoch_us uses
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = Window.partitionBy("event_type").orderBy("tus", "event_id")
    hand = ev.select(
        F.col("user_id").alias("src"),
        F.lead("user_id").over(w).alias("dst"),
        F.lead("tus").over(w).alias("ts"),
    )
    return hand.where(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))


# DuckDB twin; final CTE is `tedges(src, dst, ts)`.
EVENTS_TEMPORAL_CTE = """
tev AS (
  SELECT event_type, event_id,
         CAST(user_id AS BIGINT) AS user_id,
         epoch_us(ts) AS tus
  FROM events
),
hand AS (
  SELECT user_id AS src,
         LEAD(user_id) OVER w AS dst,
         LEAD(tus) OVER w AS ts
  FROM tev
  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id)
),
tedges AS (
  SELECT src, dst, ts FROM hand WHERE dst IS NOT NULL AND dst <> src
)
""".strip()


# ------------------------------------------------ transcripts (north rule)
#
# The north rule's input table is an Iceberg table of multi-turn
# conversation / agent transcripts with columns (conv_id:string,
# turn_idx:int32, role:string, text:string, tool:string, ts:timestamp).
# No such parquet exists in the testdata, so `events_transcripts`
# synthesizes one DETERMINISTICALLY from events — with a line-for-line
# DuckDB twin (TRANSCRIPTS_CTE) so every transcript-pipeline operator
# (conversation_stats, tool_transitions, transcript_graph, PageRank over
# the built graph) can ride the driver's hash-match correctness gate.
#
# Mapping: user → conversation ("conv_<user_id>"); turn_idx = dense rank
# of the user's events under the stable (ts, event_id) order; roles
# alternate user/assistant; assistant turns carry the event_type as the
# invoked tool; text = "{conv_id}:{turn_idx}:{role}:{event_type}", which
# satisfies reply_chain_check's per-turn text invariant (input_hint) by
# construction.


def events_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts-shaped table (input_hint schema) derived
    from ``events``. One window shuffle keyed by user_id — at 10¹² turns
    this is the natural partitioning (conversations are small and
    independent), and everything downstream is expressed over the
    declared schema, never over the synthesis."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.concat(F.lit("conv_"), F.col("user_id").cast("string")).alias(
            "conv_id"
        ),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "event_type",
        # naive-as-UTC convention shared with DuckDB (session tz is UTC)
        F.col("ts").cast("timestamp").alias("ts"),
    ).withColumn(
        "role",
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )
    return seq.select(
        "conv_id",
        "turn_idx",
        "role",
        F.concat_ws(
            ":",
            "conv_id",
            F.col("turn_idx").cast("string"),
            "role",
            "event_type",
        ).alias("text"),
        F.when(F.col("role") == "assistant", F.col("event_type")).alias(
            "tool"
        ),
        "ts",
    )


# DuckDB twin; final CTE is `transcripts(conv_id, turn_idx, role, text,
# tool, ts)` — identical rows to events_transcripts().
TRANSCRIPTS_CTE = """
tr_seq AS (
  SELECT 'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER)
           AS turn_idx,
         event_type, ts
  FROM events
),
transcripts AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) || ':'
           || CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END
           || ':' || event_type AS text,
         CASE WHEN turn_idx % 2 = 1 THEN event_type END AS tool,
         ts
  FROM tr_seq
)
""".strip()


# DuckDB twin of transcript_graph(events_transcripts(...), edge_types=
# ("tool", "coinvocation", "reply"), max_tool_degree=1000,
# id_mode="dense") followed by Graph.from_undirected_edges' canonical
# form (drop self-loops, symmetrize, dedup parallel edges to MIN
# weight). Final CTE is `edges(src, dst, weight)`, both directions.
TRANSCRIPT_EDGES_CTE = (
    TRANSCRIPTS_CTE
    + ""","""
    + """
tr_inv AS (
  SELECT conv_id, tool, CAST(COUNT(*) AS BIGINT) AS n
  FROM transcripts WHERE tool IS NOT NULL GROUP BY conv_id, tool
),
tr_vnames AS (
  SELECT DISTINCT conv_id AS name, 'conv' AS kind FROM transcripts
  UNION ALL
  SELECT DISTINCT tool AS name, 'tool' AS kind FROM transcripts
  WHERE tool IS NOT NULL
),
tr_vmap AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY name, kind) - 1 AS BIGINT) AS id,
         name, kind
  FROM tr_vnames
),
tr_tool_deg AS (SELECT tool, COUNT(*) AS td FROM tr_inv GROUP BY tool),
tr_proj_inv AS (
  SELECT tr_inv.conv_id, tr_inv.tool FROM tr_inv
  JOIN tr_tool_deg USING (tool) WHERE td <= 1000
),
tr_copairs AS (
  SELECT l.conv_id AS a, r.conv_id AS b, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM tr_proj_inv l
  JOIN tr_proj_inv r ON l.tool = r.tool AND l.conv_id < r.conv_id
  GROUP BY l.conv_id, r.conv_id
),
tr_hand AS (
  SELECT src_tool, dst_tool FROM (
    SELECT tool AS src_tool,
           LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
             AS dst_tool
    FROM transcripts WHERE tool IS NOT NULL
  ) WHERE dst_tool IS NOT NULL AND src_tool <> dst_tool
),
tr_reply AS (
  SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS weight FROM (
    SELECT LEAST(src_tool, dst_tool) AS a,
           GREATEST(src_tool, dst_tool) AS b
    FROM tr_hand
  ) GROUP BY a, b
),
tr_name_edges AS (
  SELECT conv_id AS a, 'conv' AS a_kind, tool AS b, 'tool' AS b_kind,
         CAST(n AS DOUBLE) AS weight
  FROM tr_inv
  UNION ALL
  SELECT a, 'conv', b, 'conv', weight FROM tr_copairs
  UNION ALL
  SELECT a, 'tool', b, 'tool', weight FROM tr_reply
),
tr_dir_edges AS (
  SELECT va.id AS src, vb.id AS dst, ne.weight
  FROM tr_name_edges ne
  JOIN tr_vmap va ON va.name = ne.a AND va.kind = ne.a_kind
  JOIN tr_vmap vb ON vb.name = ne.b AND vb.kind = ne.b_kind
  WHERE va.id <> vb.id
),
edges AS (
  SELECT src, dst, MIN(weight) AS weight FROM (
    SELECT src, dst, weight FROM tr_dir_edges
    UNION ALL
    SELECT dst AS src, src AS dst, weight FROM tr_dir_edges
  ) GROUP BY src, dst
)
""".strip()
)
