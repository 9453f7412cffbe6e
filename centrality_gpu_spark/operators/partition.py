"""Multilevel k-way graph partitioning (assignment, refinement, edge-cut).

The north rule demands partitioning handled *explicitly*; this operator
makes partition assignment itself a first-class, deterministic output:
the Karypis/Kumar multilevel scheme (coarsen by maximal matching until
the coarse graph is O(k) vertices → assign the coarsest graph → project
back), plus a balanced label-propagation refinement sweep
(``refine_partition``, the Spinner/ParMETIS local-move idea
re-expressed with the Louvain operator's deterministic direction gate)
that moves each vertex toward its neighbor-majority part under a hard
per-part capacity.

The pipeline: **pendant collapse** (degree-1 chains/stars — the
dominant shape of bipartite invocation graphs — merge into their
anchors, and those edges can never be cut), **heavy-edge matching
coarsening** (Karypis/Kumar HEM: multiplicities merged by contraction
are exactly the edges to match), then a coarsest-level **initial
assignment**: by default weighted label propagation finds the coarse
graph's communities and packs them into k parts round-robin by
descending fine-vertex size (on planted-partition inputs this + one
refine sweep recovers the ground-truth cut exactly); greedy region
growing (the GGGP idea made round-synchronous: degree-ranked seeds,
capacity-bounded bid admission) and stateless hash are alternatives.
Every step is a join / group-by / window, deterministic in both
engines, so the whole pipeline stays oracle-checkable, and everything
heavy runs on the coarse graph, which is small by construction.
Vertices no method reaches (edgeless anchors) fall back to the
engine-standard md5-mod-k hash.

``partition_multilevel`` is the full METIS-style V-cycle (refinement
at every level during uncoarsening, vertex-weighted capacity).

On structure-free graphs (expanders — e.g. a dense random
co-occurrence graph) no algorithm produces a materially-better-than-
random k-way cut; the auto mode detects the edge-merge stall and stops
coarsening instead of burning shuffles (see ``partition_graph``).

Use cases at 100 TB: co-locating both endpoints of most edges before an
iterative job (`df.repartition(part)`), sizing bucketed writes, and
measuring how much shuffle a layout would save (``edge_cut_summary``).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

from centrality_gpu_spark.graph import Graph
from centrality_gpu_spark.plans.checkpoint import (
    CheckpointManager,
    with_iterative_conf,
)

PARTITION_LEVELS = 1
REFINE_ROUNDS = 8
REFINE_SLACK_PCT = 25
GROW_ROUNDS = 16
LPA_INIT_ITERS = 15
# "auto" coarsening stops when |V_coarse| <= max(k * COARSE_PER_PART, 256)
COARSE_PER_PART = 8
AUTO_MAX_LEVELS = 12


def _md5_int(col):
    """Engine-standard md5→positive-int64 (walks.py idiom)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash_part(col, k: int):
    """Deterministic fallback assignment: md5('part:'||id) mod k."""
    return F.pmod(
        _md5_int(F.concat(F.lit("part:"), col.cast("string"))), F.lit(k)
    ).cast("int")


PEEL_ROUNDS = 4

# Sampled expander pre-gate (auto mode only): decide "no cluster
# structure → hash" on an md5-sampled induced subgraph BEFORE paying a
# full-graph matching level. Only consulted above the edge threshold —
# small graphs (every oracle/test fixture) keep the exact gate. The
# threshold is derived so a consulted gate is always CONCLUSIVE: a
# vertex sample at rate 1/mod keeps ~E/mod² edges, so requiring
# E ≥ mod²·min_sample means the sample meets the min-edge floor (on an
# expander; denser-than-uniform graphs only exceed it) instead of
# paying a sample job just to fall through.
EXPANDER_SAMPLE_MOD = 8          # keep vertices with md5 % 8 == 0 (~12.5%)
EXPANDER_PREGATE_MIN_SAMPLE = 10_000  # sampled edges below this → inconclusive
EXPANDER_PREGATE_MIN_EDGES = (
    EXPANDER_SAMPLE_MOD * EXPANDER_SAMPLE_MOD * EXPANDER_PREGATE_MIN_SAMPLE
)  # = 640k


def _expander_pregate(
    cur: Graph,
    match_rounds: int | None,
    stall_frac: float = 0.85,
    sample_mod: int = EXPANDER_SAMPLE_MOD,
    min_sample_edges: int = EXPANDER_PREGATE_MIN_SAMPLE,
) -> bool:
    """True when a deterministic vertex-induced sample of ``cur``
    exhibits the expander signature (heavy-edge matching + contraction
    merges <15% of the sampled edges).

    The full-graph stall gate learns this only AFTER an O(E) matching
    level plus an O(E) contraction shuffle — ~the whole cost of q16b.
    A ``sample_mod``-th of the vertices induces ~1/sample_mod² of an
    expander's edges, so the same signal costs ~1.6% of the work.
    Cluster structure survives vertex-induced sampling (communities
    stay internally dense at any uniform vertex rate), so a clustered
    graph keeps failing this test and proceeds to real coarsening.
    Returns False (inconclusive) when the sample is too thin to judge
    — the exact gate then decides as before. md5 sampling keeps the
    decision deterministic across runs and engines."""
    e = cur.edges_by_src().select("src", "dst", "weight")

    def _keep(c):
        return (
            F.pmod(
                _md5_int(F.concat(F.lit("xgate:"), c.cast("string"))),
                F.lit(sample_mod),
            )
            == 0
        )

    se = e.where(_keep(F.col("src")) & _keep(F.col("dst"))).localCheckpoint()
    n = se.count()
    if n < min_sample_edges:
        return False
    from centrality_gpu_spark.operators.matching import (
        MATCHING_MAX_ROUNDS,
        contract_matching,
        maximal_matching,
    )

    sg = Graph.from_symmetric_edges(se)
    # mirror the REAL loop's matching budget exactly (match_rounds=None
    # → run to maximality, same as partition_graph's level loop): a
    # gate that matches less aggressively than the path it predicts
    # would be systematically stall-biased and could falsely
    # hash-assign clustered graphs
    m = maximal_matching(
        sg,
        max_rounds=match_rounds or MATCHING_MAX_ROUNDS,
        allow_partial=match_rounds is not None,
        by_weight=True,
    )
    coarse, _ = contract_matching(sg, m.localCheckpoint())
    return coarse.count() > stall_frac * n


def collapse_pendants(
    graph: Graph,
    rounds: int = PEEL_ROUNDS,
    checkpoint: CheckpointManager | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(core_edges, pmap) — iterated pendant collapse, the partitioner's
    pre-coarsening step (the reference peels pendants the same way
    before its heavy phase, ``pendant_graph.cpp:9-58``).

    Each round every degree-1 vertex collapses onto its single
    neighbor — except the smaller id of an isolated *pair* of pendants,
    which survives as the pair's anchor — and its edge disappears.
    ``pmap`` (id, anchor) maps every fine vertex to its surviving
    anchor (itself for core vertices); ``core_edges`` is what's left.

    Pendant edges can never be cut by the final partition (pendant and
    anchor share a coarse representative), and star/tree-shaped regions
    — the dominant shape of bipartite invocation graphs like
    conversation↔tool — collapse to single anchors in one or two
    rounds, so the expensive matching levels only see the 2-core-ish
    remainder. Per round: one degree aggregation + two anti-joins +
    one O(collapsed) anchor-update join.
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    edges = ckpt.truncate(graph.edges_by_src().select("src", "dst", "weight"))
    collapsed: DataFrame | None = None
    for rnd in range(rounds):
        dg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("deg"), F.min("dst").alias("nbr")
        )
        rm = (
            dg.alias("a")
            .join(dg.alias("b"), F.col("a.nbr") == F.col("b.id"))
            .where(
                (F.col("a.deg") == 1)
                & ~((F.col("b.deg") == 1) & (F.col("a.id") < F.col("b.id")))
            )
            .select(F.col("a.id").alias("u"), F.col("a.nbr").alias("v"))
        )
        rm = ckpt.truncate(rm, eager=False)
        n_rm = rm.count()
        ckpt.record(op="collapse_pendants", iteration=rnd, changed=n_rm)
        if n_rm == 0:
            break
        if collapsed is None:
            collapsed = rm.select(F.col("u").alias("id"), F.col("v").alias("anchor"))
        else:
            collapsed = (
                collapsed.join(
                    rm.select(F.col("u").alias("anchor"), F.col("v").alias("va")),
                    "anchor",
                    "left",
                )
                .select("id", F.coalesce("va", F.col("anchor")).alias("anchor"))
                .unionByName(
                    rm.select(F.col("u").alias("id"), F.col("v").alias("anchor"))
                )
            )
        collapsed = ckpt.truncate(collapsed)
        mu = rm.select(F.col("u").alias("id"))
        edges = ckpt.truncate(
            edges.join(
                F.broadcast(mu.select(F.col("id").alias("src"))), "src", "left_anti"
            ).join(
                F.broadcast(mu.select(F.col("id").alias("dst"))), "dst", "left_anti"
            )
        )
    pmap = graph.vertices().select("id")
    if collapsed is not None:
        pmap = pmap.join(collapsed, "id", "left").select(
            "id", F.coalesce("anchor", F.col("id")).alias("anchor")
        )
    else:
        pmap = pmap.select("id", F.col("id").alias("anchor"))
    return edges, pmap


def grow_parts(
    coarse_edges: DataFrame,
    sizes: DataFrame,
    k: int,
    cap: int,
    rounds: int = GROW_ROUNDS,
    checkpoint: CheckpointManager | None = None,
    spark=None,
) -> DataFrame:
    """(id, part) for every coarse vertex — greedy region growing.

    ``coarse_edges`` is the symmetric (src, dst, weight) coarse edge
    table; ``sizes`` is (id, size) — how many fine vertices each coarse
    vertex represents, and also the vertex *universe* (it includes
    anchors whose whole component collapsed away and so carry no
    edges); ``cap`` bounds each part's *fine*-vertex load. Seeds: the
    k max-degree vertices (degree desc, id asc — integer degree, so
    the order is engine-exact). Each round, every unassigned vertex
    with an assigned neighbor bids for its heaviest adjacent part
    (ties → smallest part id); per part, bids are admitted in (bid
    weight desc, id asc) order while load + running size fits in cap.
    Extra rounds past the fixpoint are no-ops (the DuckDB twin unrolls
    a fixed count). Unreached vertices fall back to hash-mod-k.

    The single-task global window over the seed ranking is safe by
    construction: it runs on the *coarsest* level, which auto
    coarsening bounds at O(k) vertices.
    """
    ckpt = checkpoint or CheckpointManager(spark or sizes.sparkSession)
    sess = spark or sizes.sparkSession
    e = coarse_edges
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    # top-k seed pick as a TakeOrdered (orderBy+limit) + k-row driver
    # frame — k rows total, vs the old global row_number window that
    # funnelled every coarse vertex through one task
    top = deg.orderBy(F.desc("deg"), F.asc("id")).limit(k).collect()
    seeds = sess.createDataFrame(
        [(int(r.id), i) for i, r in enumerate(top)], "id long, part int"
    )
    assigned = ckpt.truncate(seeds.join(sizes, "id"))  # (id, part, size)
    for rnd in range(rounds):
        loads = assigned.groupBy("part").agg(F.sum("size").alias("load"))
        bids = (
            e.join(
                assigned.select(F.col("id").alias("dst"), "part"), "dst"
            )
            .join(assigned.select(F.col("id").alias("src")), "src", "left_anti")
            .groupBy(F.col("src").alias("id"), "part")
            .agg(F.sum("weight").alias("w"))
        )
        best = bids.groupBy("id").agg(
            F.max_by(
                F.col("part"), F.struct(F.col("w"), (-F.col("part")).alias("np"))
            ).alias("part"),
            F.max("w").alias("w"),
        )
        adm = (
            Window.partitionBy("part")
            .orderBy(F.desc("w"), F.asc("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        newly = ckpt.truncate(
            best.join(sizes, "id")
            .join(loads, "part", "left")
            .withColumn("load", F.coalesce("load", F.lit(0)))
            .withColumn("csum", F.sum("size").over(adm))
            .where(F.col("load") + F.col("csum") <= F.lit(cap))
            .select("id", "part", "size"),
            eager=False,
        )
        n_new = newly.count()
        ckpt.record(op="grow_parts", iteration=rnd, changed=n_new)
        if n_new == 0:
            break
        assigned = ckpt.truncate(assigned.unionByName(newly))
    leftover = (
        sizes.select("id")
        .join(assigned.select("id"), "id", "left_anti")
        .select("id", _hash_part(F.col("id"), k).alias("part"))
    )
    return assigned.select("id", "part").unionByName(leftover)


def partition_graph(
    graph: Graph,
    k: int,
    levels: int | str = PARTITION_LEVELS,
    match_rounds: int | None = None,
    init: str = "lpa",
    grow_rounds: int = GROW_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    peel_rounds: int = PEEL_ROUNDS,
    lpa_iters: int = LPA_INIT_ITERS,
    pregate: bool = True,
) -> DataFrame:
    """(id, part) — a deterministic k-way assignment of every vertex,
    part ∈ [0, k). ``levels`` coarsening rounds roughly halve V each
    time before assignment; matched pairs land in the same part by
    construction (they share a coarse representative).

    ``levels="auto"`` coarsens until the coarse graph has at most
    ``max(k * COARSE_PER_PART, 256)`` vertices, contraction stalls
    (a level merges <15% of the edges), or ``AUTO_MAX_LEVELS`` is hit
    — the Karypis/Kumar
    stopping rule. Oracle-checked queries pin an integer ``levels`` so
    the DuckDB twin can unroll the same count.

    ``match_rounds``: truncate each level's matching to this many
    local-min rounds (non-maximal, ``allow_partial``) — coarsening only
    needs *a* matching, and the early rounds claim most pairs, so a
    small budget buys nearly the same contraction at a fraction of the
    supersteps. None = run to maximality.

    ``init``: coarsest-level assignment —

    * ``"lpa"`` (default): weighted synchronous label propagation on
      the coarse graph finds its communities, which are packed into k
      parts round-robin by descending fine-vertex size (deterministic
      LPT-style balancing); isolated anchors fall back to hash. On a
      planted-partition graph this + one refine sweep recovers the
      ground-truth cut exactly (see tests); on structure-free inputs
      it degrades to roughly hash quality, which is all any method
      achieves there.
    * ``"grow"``: greedy region growing (see ``grow_parts``).
    * ``"hash"``: stateless md5 mod k — the pre-r3 behavior;
      uniformly balanced but structure-blind.

    ``peel_rounds``: pendant-collapse rounds before matching (see
    ``collapse_pendants``); 0 disables.

    In auto mode coarsening also stops when a level fails to merge
    ≥15% of the edges — an expander-shaped graph (e.g. a dense random
    co-occurrence graph) has no cluster structure for contraction to
    find, and further levels would burn shuffles for nothing.

    ``pregate=False`` disables the *sampled* expander pre-gate (auto
    mode, ≥640k edges), forcing the exact full-graph stall gate — the
    opt-out for borderline graphs that sample as expander-like but are
    still refinable. A pre-gate short-circuit is logged (WARNING) so
    quality regressions are attributable.
    """
    from centrality_gpu_spark.operators.matching import (
        MATCHING_MAX_ROUNDS,
        contract_matching,
        maximal_matching,
    )

    auto = levels == "auto"
    n_levels = AUTO_MAX_LEVELS if auto else int(levels)
    target = max(k * COARSE_PER_PART, 256)
    if peel_rounds > 0:
        core_edges, pmap = collapse_pendants(graph, rounds=peel_rounds)
        core_edges = core_edges.localCheckpoint()
        full = pmap.select("id", F.col("anchor").alias("rep")).localCheckpoint()
    else:
        core_edges = graph.edges_by_src().select("src", "dst", "weight")
        full = graph.vertices().select("id", F.col("id").alias("rep"))
    prev_e = core_edges.count()
    first_e = prev_e
    cur = Graph.from_symmetric_edges(core_edges) if prev_e else None
    if (
        auto
        and pregate
        and init == "lpa"
        and prev_e >= EXPANDER_PREGATE_MIN_EDGES
        and _expander_pregate(cur, match_rounds)
    ):
        # expander detected on the sample: skip the coarsening levels
        # entirely (the full-graph stall gate would reach the same
        # "hash" verdict after an O(E) matching + contraction).
        # pregate=False forces the exact full-graph gate for borderline
        # graphs; the log line makes a short-circuit attributable when
        # cut quality regresses.
        _LOG.warning(
            "partition_graph: sampled expander pre-gate short-circuited "
            "coarsening (%d edges >= %d); pass pregate=False to force "
            "the exact full-graph stall gate",
            prev_e,
            EXPANDER_PREGATE_MIN_EDGES,
        )
        n_levels = 0
    for _ in range(n_levels):
        if prev_e == 0:
            break  # fully collapsed — the SQL twin's levels are no-ops
        m = maximal_matching(
            cur,
            max_rounds=match_rounds or MATCHING_MAX_ROUNDS,
            allow_partial=match_rounds is not None,
            by_weight=True,
        )
        coarse, mapping = contract_matching(cur, m.localCheckpoint())
        mapping = mapping.localCheckpoint()
        # left-compose: anchors whose entire component already
        # contracted to a point are absent from this level's mapping
        # and keep their rep
        full = (
            full.join(
                mapping.select(
                    F.col("id").alias("rep"), F.col("rep").alias("rep2")
                ),
                "rep",
                "left",
            )
            .select("id", F.coalesce("rep2", F.col("rep")).alias("rep"))
            .localCheckpoint()
        )
        # checkpoint the coarse edge table: the next level's matching,
        # num_edges gate, and the final assignment all re-read it —
        # without this the whole contraction lineage re-executes per
        # consumer
        coarse = coarse.localCheckpoint()
        cur = Graph.from_symmetric_edges(coarse)
        e_now = coarse.count()
        if auto and (
            e_now == 0
            or e_now > 0.85 * prev_e
            or cur.vertices().count() <= target
        ):
            prev_e = e_now
            break
        prev_e = e_now
    coarse_edges = (
        cur.edges_by_src().select("src", "dst", "weight")
        if cur is not None and prev_e
        else graph.spark.createDataFrame(
            [], "src long, dst long, weight double"
        )
    )
    sizes = full.groupBy(F.col("rep").alias("id")).agg(
        F.count("*").alias("size")
    )
    if init == "lpa" and auto and first_e and prev_e > 0.8 * first_e:
        # structureless fast path: coarsening merged <20% of the edges
        # in total — an expander-shaped graph, where no assignment
        # beats random by more than a few points. Don't burn LPA
        # iterations on it; hash is unbiased and free. (Fixed-``levels``
        # oracle queries never take this branch — auto only.)
        init = "hash"
        assign = sizes.select(
            F.col("id").alias("rep"), _hash_part(F.col("id"), k).alias("part")
        )
    else:
        n_fine = graph.vertices().count()
        cap = (n_fine * (100 + slack_pct) + 100 * k - 1) // (100 * k)
        if init == "lpa":
            assign = lpa_pack(
                cur if prev_e else None, sizes, k, lpa_iters,
                graph.spark, cap,
            ).select(F.col("id").alias("rep"), "part")
        else:
            assign = grow_parts(
                coarse_edges, sizes, k, cap, rounds=grow_rounds,
                spark=graph.spark,
            ).select(F.col("id").alias("rep"), "part")
    return full.join(assign, "rep").select("id", "part")


def lpa_pack(
    coarse: Graph | None,
    sizes: DataFrame,
    k: int,
    lpa_iters: int,
    spark,
    cap: int,
) -> DataFrame:
    """(id, part) for every coarse vertex: weighted LPA communities on
    the coarse graph, packed into k parts.

    Communities whose fine-vertex size fits under ``cap`` are packed
    *whole*, round-robin by descending size (rank ties → smallest
    label) — the LPT-style balance heuristic. A community larger than
    cap (LPA's giant-label failure mode on structure-free graphs —
    where no partition avoids cutting it anyway) is split: its members
    spread round-robin by (size desc, id asc) rank across all k parts.
    Vertices LPA never saw (edgeless anchors) fall back to hash-mod-k.
    The global rank windows run over the community table — O(coarse V)
    rows at most, tiny in practice."""
    from centrality_gpu_spark.operators.labelprop import label_propagation

    if coarse is None:
        labels = spark.createDataFrame([], "id long, label long")
    else:
        labels = label_propagation(
            coarse, max_iterations=lpa_iters, weighted=True
        )
    lab = labels.join(sizes, "id")
    csz = lab.groupBy("label").agg(F.sum("size").alias("csz"))
    small = csz.where(F.col("csz") <= F.lit(cap))
    # global (csz desc, label asc) rank via the distributed prefix-sum
    # helper — same rank the old single-partition row_number window
    # produced, without moving every community through one task
    from centrality_gpu_spark.ids import dense_rank_ids

    ranked = dense_rank_ids(
        small.select("label", (-F.col("csz")).alias("negcsz")),
        ("negcsz", "label"),
    )
    packed = ranked.select(
        "label", (F.col("id") % k).cast("int").alias("part")
    )
    whole = lab.join(packed, "label").select("id", "part")
    wb = Window.partitionBy("label").orderBy(F.desc("size"), F.asc("id"))
    split = (
        lab.join(csz.where(F.col("csz") > F.lit(cap)).select("label"), "label")
        .select(
            "id",
            ((F.row_number().over(wb) - 1) % k).cast("int").alias("part"),
        )
    )
    leftover = (
        sizes.select("id")
        .join(labels.select("id"), "id", "left_anti")
        .select("id", _hash_part(F.col("id"), k).alias("part"))
    )
    return whole.unionByName(split).unionByName(leftover)


def partition_multilevel(
    graph: Graph,
    k: int,
    match_rounds: int = 4,
    grow_rounds: int = GROW_ROUNDS,
    refine_rounds: int = 4,
    slack_pct: int = REFINE_SLACK_PCT,
    peel_rounds: int = PEEL_ROUNDS,
    max_levels: int = AUTO_MAX_LEVELS,
    exact_levels: int | None = None,
    pregate: bool = True,
) -> DataFrame:
    """(id, part) — the full METIS-style V-cycle: pendant collapse →
    matching coarsening (auto depth: stops at O(k) vertices, on an
    edge-merge stall, or at ``max_levels``) → greedy region growing at
    the coarsest level → **weighted refinement at every level on the
    way back up** (each level-L vertex weighs the fine vertices it
    represents, so balance is enforced in fine units throughout).

    ``exact_levels`` pins the coarsening depth: exactly that many
    matching+contraction levels run, with the stall and target-size
    gates disabled (only a fully-emptied edge set still stops early).
    Auto depth (``exact_levels=None``) is the production default; the
    pinned mode exists so the whole V-cycle has a static structure
    that :func:`vcycle_oracle_sql` can unroll into one DuckDB query —
    closing the registry's last rows-only row.

    Scale shape: per level one matching run + one mapping join; refine
    rounds at level L cost O(E_L) — the level sizes decay
    geometrically when the graph has cluster structure, and the stall
    gate aborts the whole descent when it doesn't (an expander gains
    nothing from any partitioner).

    ``pregate=False`` disables the sampled expander pre-gate (same
    opt-out + WARNING log as :func:`partition_graph`).
    """
    target = max(k * COARSE_PER_PART, 256)
    from centrality_gpu_spark.operators.matching import (
        contract_matching,
        maximal_matching,
    )

    core_edges, pmap = collapse_pendants(graph, rounds=peel_rounds)
    core_edges = core_edges.localCheckpoint()
    comp = pmap.select("id", F.col("anchor").alias("rep")).localCheckpoint()
    n_fine = graph.vertices().count()
    cap = (n_fine * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    # levels[L] = (edge table, fine→level-L composed mapping,
    #              level-L→level-(L+1) adjacent mapping or None)
    lvls: list[list] = [[core_edges, comp, None]]
    prev_e = core_edges.count()
    cur = Graph.from_symmetric_edges(core_edges) if prev_e else None
    if (
        exact_levels is None
        and pregate
        and prev_e >= EXPANDER_PREGATE_MIN_EDGES
        and _expander_pregate(cur, match_rounds)
    ):
        _LOG.warning(
            "partition_multilevel: sampled expander pre-gate "
            "short-circuited the V-cycle (%d edges >= %d); pass "
            "pregate=False (or pin exact_levels) to force the exact path",
            prev_e,
            EXPANDER_PREGATE_MIN_EDGES,
        )
        # same sampled verdict as partition_graph's auto gate: an
        # expander gains nothing from coarsening, LPA packing, OR
        # refinement rounds — hash the pendant-collapsed anchors and
        # project (pendant edges still land uncut, the only structure
        # such a graph has)
        return comp.join(
            comp.select("rep").distinct().select(
                "rep", _hash_part(F.col("rep"), k).alias("part")
            ),
            "rep",
        ).select("id", "part")
    n_levels = max_levels if exact_levels is None else exact_levels
    for _ in range(n_levels):
        if prev_e == 0:
            break
        m = maximal_matching(
            cur, max_rounds=match_rounds, allow_partial=True, by_weight=True
        )
        coarse, mapping = contract_matching(cur, m.localCheckpoint())
        coarse = coarse.localCheckpoint()
        mapping = mapping.localCheckpoint()
        lvls[-1][2] = mapping
        comp = (
            comp.join(
                mapping.select(
                    F.col("id").alias("rep"), F.col("rep").alias("rep2")
                ),
                "rep",
                "left",
            )
            .select("id", F.coalesce("rep2", F.col("rep")).alias("rep"))
            .localCheckpoint()
        )
        cur = Graph.from_symmetric_edges(coarse)
        e_now = coarse.count()
        lvls.append([coarse, comp, None])
        if exact_levels is None and (
            e_now == 0
            or e_now > 0.85 * prev_e
            or cur.vertices().count() <= target
        ):
            prev_e = e_now
            break
        prev_e = e_now
    # coarsest assignment: LPA communities packed round-robin by size
    deep_edges, deep_comp, _ = lvls[-1]
    sizes = deep_comp.groupBy(F.col("rep").alias("id")).agg(
        F.count("*").alias("size")
    )
    assign = lpa_pack(
        cur if prev_e else None, sizes, k, LPA_INIT_ITERS, graph.spark, cap
    ).localCheckpoint()
    # uncoarsen: refine at each level (weighted), then project one down
    for lv in range(len(lvls) - 1, -1, -1):
        edges_l, comp_l, map_l = lvls[lv]
        sizes_l = comp_l.groupBy(F.col("rep").alias("id")).agg(
            F.count("*").alias("size")
        )
        if lv < len(lvls) - 1:
            # project: level-lv vertex → its level-(lv+1) rep's part
            # via the O(V_lv) adjacent mapping; vertices absent from it
            # (edgeless at lv — their component fully contracted at an
            # earlier level) keep their own id upward
            assign = (
                sizes_l.select("id")
                .join(
                    map_l.select("id", F.col("rep").alias("up")), "id", "left"
                )
                .select("id", F.coalesce("up", F.col("id")).alias("up"))
                .join(assign.select(F.col("id").alias("up"), "part"), "up")
                .select("id", "part")
            )
        if edges_l.isEmpty():
            assign = assign.localCheckpoint()
            continue
        assign = refine_partition(
            Graph.from_symmetric_edges(edges_l),
            assign,
            k,
            rounds=refine_rounds,
            sizes=sizes_l,
            cap=cap,
        ).localCheckpoint()
    # project through the pendant map to the fine graph
    return (
        pmap.select("id", F.col("anchor").alias("rep"))
        .join(assign.select(F.col("id").alias("rep"), "part"), "rep")
        .select("id", "part")
    )


@with_iterative_conf
def refine_partition(
    graph: Graph,
    parts: DataFrame,
    k: int,
    rounds: int = REFINE_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    checkpoint: CheckpointManager | None = None,
    sizes: DataFrame | None = None,
    cap: int | None = None,
) -> DataFrame:
    """(id, part) — ``parts`` after up to ``rounds`` synchronous
    balanced label-propagation sweeps: each round every vertex scores
    each neighboring part by incident edge weight and moves to the
    heaviest one, subject to

    * **capacity**: a part never grows beyond
      ``cap = ceil(n·(100+slack_pct) / (100·k))`` — each round's movers
      into a part are ranked (gain desc, id asc) and only the first
      ``cap − load`` admitted (a part whose *initial* size already
      exceeds cap is never force-evicted; it only shrinks as members
      find gainful moves out). The per-(round, part) ranking window is
      one task per target part, bounded by that round's mover count
      (movers shrink geometrically);
    * **strict gain**: ``w(target) > w(current)``, ties stay put, then
      break to the smallest part id;
    * **direction gate**: part-id-decreasing moves on even rounds,
      increasing on odd — the Louvain operator's deterministic fix for
      the two-coloring oscillation of synchronous label updates.

    Stops early at a fixpoint (no gainful admissible move in either
    direction); extra rounds past the fixpoint are no-ops, which is
    what makes the fixed-``rounds`` DuckDB twin exact. Per round: one
    edges⋈assignment shuffle (the cached edges-by-src exchange is
    reused), one (vertex, part) aggregation, one k-row load table.
    Refinement is best-effort (synchronous moves can transiently raise
    the cut); measure with ``edge_cut_summary``.

    ``sizes`` (id, size) weights each vertex for the capacity rule
    (V-cycle refinement on coarse levels, where a vertex stands for
    many fine ones); ``cap`` overrides the computed capacity (pass the
    fine-level cap when refining a coarse level). With both omitted
    the behavior — and the DuckDB twin — is the historical unweighted
    one (sizes all 1: the running-size admission sum degenerates to
    the old row_number rule).
    """
    ckpt = checkpoint or CheckpointManager(graph.spark)
    e = graph.edges_by_src()
    assign = ckpt.truncate(
        parts.select("id", F.col("part").cast("int").alias("part"))
    )
    if sizes is None:
        szd = assign.select("id", F.lit(1).cast("long").alias("size"))
    else:
        szd = sizes.select("id", F.col("size").cast("long").alias("size"))
    if cap is None:
        n = (
            assign.count()
            if sizes is None
            else szd.agg(F.sum("size")).collect()[0][0]
        )
        cap = (n * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    assign = assign.join(szd, "id")
    for rnd in range(rounds):
        loads = assign.groupBy("part").agg(F.sum("size").alias("load"))
        nbrw = (
            e.join(
                assign.select(
                    F.col("id").alias("dst"), F.col("part").alias("c")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("weight").alias("w"))
        )
        cur = assign.select("id", F.col("part").alias("cur"))
        cand = (
            nbrw.unionByName(
                cur.select("id", F.col("cur").alias("c"), F.lit(0.0).alias("w"))
            )
            .groupBy("id", "c")
            .agg(F.max("w").alias("w"))
        )
        cand = (
            cand.join(cur, "id")
            .join(loads.select(F.col("part").alias("c"), "load"), "c", "left")
            .withColumn("load", F.coalesce("load", F.lit(0)))
            .where((F.col("c") == F.col("cur")) | (F.col("load") < F.lit(cap)))
        )
        best = (
            cand.groupBy("id")
            .agg(
                F.max_by(
                    F.struct("c", "w"),
                    F.struct(
                        F.col("w"),
                        F.when(F.col("c") == F.col("cur"), 1)
                        .otherwise(0)
                        .alias("is_cur"),
                        (-F.col("c")).alias("nc"),
                    ),
                ).alias("b"),
                F.max(F.when(F.col("c") == F.col("cur"), F.col("w"))).alias(
                    "wcur"
                ),
                F.first("cur").alias("cur"),
            )
            .select(
                "id",
                F.col("b.c").alias("target"),
                F.col("b.w").alias("wbest"),
                "wcur",
                "cur",
            )
        )
        movable = (F.col("target") != F.col("cur")) & (
            F.col("wbest") > F.col("wcur")
        )
        dir_ok = (
            F.col("target") < F.col("cur")
            if rnd % 2 == 0
            else F.col("target") > F.col("cur")
        )
        best = best.persist()
        counts = best.agg(
            F.sum(F.when(movable, 1).otherwise(0)).alias("all_movable"),
            F.sum(F.when(movable & dir_ok, 1).otherwise(0)).alias("this_dir"),
        ).collect()[0]
        ckpt.record(
            op="refine_partition",
            iteration=rnd,
            movable=int(counts["all_movable"] or 0),
        )
        if not counts["all_movable"]:
            best.unpersist()
            break
        if counts["this_dir"]:
            # running-size admission: with all sizes 1 the cumulative
            # sum equals the old row_number rule (same DuckDB twin)
            adm = (
                Window.partitionBy("target")
                .orderBy(F.desc("wbest"), F.asc("id"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            moves = (
                best.where(movable & dir_ok)
                .join(szd, "id")
                .join(
                    loads.select(F.col("part").alias("target"), "load"),
                    "target",
                    "left",
                )
                .withColumn("load", F.coalesce("load", F.lit(0)))
                .withColumn("csum", F.sum("size").over(adm))
                .where(F.col("load") + F.col("csum") <= F.lit(cap))
                .select("id", F.col("target").alias("np"))
            )
            assign = ckpt.truncate(
                assign.join(moves, "id", "left").select(
                    "id",
                    F.coalesce("np", "part").cast("int").alias("part"),
                    "size",
                )
            )
        best.unpersist()
    return assign.select("id", "part")


def partition_edges(graph: Graph, parts: DataFrame, k: int) -> DataFrame:
    """The assignment made physical: the symmetric edge table annotated
    with both endpoint parts (``src_part``, ``dst_part``) and
    repartitioned into exactly ``k`` Spark partitions on ``src_part`` —
    every intra-part edge (1 − cut_fraction of them, by construction
    of a good assignment) has both endpoints' state in the same task,
    so an iterative job that keys its vertex state the same way
    shuffles only the cut edges per superstep.

    This is the consumer side of the north rule's "partitioning
    handled explicitly": compute ``parts`` once (multilevel +
    refinement), write/cache the result of this function, and run the
    superstep loop on it. One O(E) double join + one exchange, never
    again per iteration.
    """
    e = graph.edges_by_src()
    annotated = (
        e.join(
            parts.select(F.col("id").alias("src"), F.col("part").alias("src_part")),
            "src",
        )
        .join(
            parts.select(F.col("id").alias("dst"), F.col("part").alias("dst_part")),
            "dst",
        )
        .select("src", "dst", "weight", "src_part", "dst_part")
    )
    return annotated.repartition(k, "src_part")


def edge_cut_summary(graph: Graph, parts: DataFrame) -> DataFrame:
    """One row (k_parts, cut_weight, total_weight, cut_fraction,
    min_part_size, max_part_size) for an assignment ``parts(id, part)``
    — the shuffle a layout would save, quantified."""
    e = graph.edges_by_src()
    j = (
        e.join(parts.select(F.col("id").alias("src"), F.col("part").alias("ps")), "src")
        .join(parts.select(F.col("id").alias("dst"), F.col("part").alias("pd")), "dst")
    )
    agg = j.agg(
        (F.sum(F.when(F.col("ps") != F.col("pd"), F.col("weight")).otherwise(0.0)) / 2)
        .alias("cut_weight"),
        (F.sum("weight") / 2).alias("total_weight"),
    )
    sizes = parts.groupBy("part").count()
    size_agg = sizes.agg(
        F.countDistinct("part").cast("long").alias("k_parts"),
        F.min("count").alias("min_part_size"),
        F.max("count").alias("max_part_size"),
    )
    return agg.crossJoin(size_agg).select(
        "k_parts",
        F.round("cut_weight", 6).alias("cut_weight"),
        F.round("total_weight", 6).alias("total_weight"),
        F.round(F.col("cut_weight") / F.col("total_weight"), 6).alias("cut_fraction"),
        "min_part_size",
        "max_part_size",
    )


_MD5_INT_SQL = (
    "CAST(('0x' || substr(md5('part:' || CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT)"
)


def _grow_ctes(edges_name: str, k: int, rounds: int, slack_pct: int) -> str:
    """CTE chain from ``cmap(id, rep)`` + coarse ``{edges_name}`` to
    ``cparts(rep, part)`` — the unrolled ``grow_parts`` (extra rounds
    past the fixpoint are no-ops, so a fixed unroll is exact)."""
    h = _MD5_INT_SQL.format(col="z.id")
    out = [
        "csize AS MATERIALIZED (SELECT rep AS id, COUNT(*) AS size "
        "FROM cmap GROUP BY rep)",
        f"gcap AS (SELECT (COUNT(*) * {100 + slack_pct} + {100 * k} - 1) "
        f"// {100 * k} AS cap FROM cmap)",
        f"""cdeg AS (SELECT src AS id, COUNT(*) AS deg
  FROM {edges_name} GROUP BY src),
g0 AS MATERIALIZED (
  SELECT s.id, s.part, z.size FROM (
    SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY deg DESC, id ASC) - 1
               AS INTEGER) AS part
    FROM cdeg
  ) s JOIN csize z ON z.id = s.id
  WHERE s.part < {k}
)""",
    ]
    for r in range(rounds):
        out.append(f"""gl{r} AS (SELECT part, SUM(size) AS load FROM g{r} GROUP BY part),
gs{r} AS MATERIALIZED (
  SELECT e.src AS id, p.part, SUM(e.weight) AS w
  FROM {edges_name} e JOIN g{r} p ON p.id = e.dst
  WHERE e.src NOT IN (SELECT id FROM g{r})
  GROUP BY e.src, p.part
),
gb{r} AS (
  SELECT id, part, w FROM (
    SELECT id, part, w,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY w DESC, part ASC) AS rn
    FROM gs{r}
  ) WHERE rn = 1
),
ga{r} AS MATERIALIZED (
  SELECT id, part, size FROM (
    SELECT b.id, b.part, z.size,
           SUM(z.size) OVER (PARTITION BY b.part ORDER BY b.w DESC, b.id ASC
                             ROWS UNBOUNDED PRECEDING) AS csum,
           COALESCE(l.load, 0) AS load
    FROM gb{r} b
    JOIN csize z ON z.id = b.id
    LEFT JOIN gl{r} l ON l.part = b.part
  ) WHERE load + csum <= (SELECT cap FROM gcap)
),
g{r + 1} AS MATERIALIZED (
  SELECT * FROM g{r} UNION ALL SELECT * FROM ga{r}
)""")
    out.append(f"""cparts AS (
  SELECT id AS rep, part FROM g{rounds}
  UNION ALL
  SELECT z.id AS rep, CAST({h} % {k} AS INTEGER) AS part
  FROM csize z WHERE z.id NOT IN (SELECT id FROM g{rounds})
)""")
    return ",\n".join(out)


def _peel_ctes(rounds: int) -> str:
    """CTE chain from ``edges`` to ``pmap(id, anchor)`` + the peeled
    core edge table ``p{rounds}e`` — the unrolled ``collapse_pendants``
    (extra rounds past the fixpoint are no-ops)."""
    out = [
        "p0e AS (SELECT src, dst, weight FROM edges)",
        "pc0 AS (SELECT CAST(NULL AS BIGINT) AS id, "
        "CAST(NULL AS BIGINT) AS anchor WHERE FALSE)",
    ]
    for r in range(rounds):
        out.append(f"""pdg{r} AS (
  SELECT src AS id, COUNT(*) AS deg, MIN(dst) AS nbr
  FROM p{r}e GROUP BY src
),
prm{r} AS MATERIALIZED (
  SELECT a.id AS u, a.nbr AS v
  FROM pdg{r} a JOIN pdg{r} b ON b.id = a.nbr
  WHERE a.deg = 1 AND NOT (b.deg = 1 AND a.id < b.id)
),
pc{r + 1} AS MATERIALIZED (
  SELECT c.id, COALESCE(m.v, c.anchor) AS anchor
  FROM pc{r} c LEFT JOIN prm{r} m ON m.u = c.anchor
  UNION ALL
  SELECT u AS id, v AS anchor FROM prm{r}
),
p{r + 1}e AS MATERIALIZED (
  SELECT e.* FROM p{r}e e
  WHERE e.src NOT IN (SELECT u FROM prm{r})
    AND e.dst NOT IN (SELECT u FROM prm{r})
)""")
    out.append(f"""pmap AS MATERIALIZED (
  SELECT v.id, COALESCE(c.anchor, v.id) AS anchor
  FROM (SELECT DISTINCT src AS id FROM edges) v
  LEFT JOIN pc{rounds} c ON c.id = v.id
)""")
    return ",\n".join(out)


def _partition_ctes(
    edges_cte: str,
    k: int,
    rounds: int,
    levels: int = 1,
    init: str = "lpa",
    grow_rounds: int = GROW_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    peel_rounds: int = PEEL_ROUNDS,
    lpa_iters: int = LPA_INIT_ITERS,
) -> str:
    """CTE chain ending in ``parts(id, part)``: unrolled pendant
    collapse (``p*``/``pmap``), ``levels`` unrolled matching+
    contraction levels (CTEs prefixed ``l{L}``/``lv{L}``), composed
    mapping ``cmap(id, rep)`` (LEFT joins: anchors of fully-contracted
    components keep their rep), then the coarsest-level assignment
    (``grow`` region growing or ``hash`` md5 mod k)."""
    from centrality_gpu_spark.operators.matching import matching_ctes

    parts = [
        edges_cte,
        _peel_ctes(peel_rounds),
        f"lv0e AS (SELECT src, dst, weight FROM p{peel_rounds}e)",
    ]
    for lv in range(levels):
        parts.append(
            matching_ctes(f"lv{lv}e", rounds, prefix=f"l{lv}", by_weight=True)
        )
        parts.append(f"""lv{lv}map AS MATERIALIZED (
  SELECT v.id, COALESCE(m.src, v.id) AS rep
  FROM (SELECT DISTINCT src AS id FROM lv{lv}e) v
  LEFT JOIN l{lv}m{rounds} m ON m.dst = v.id
),
lv{lv + 1}e AS MATERIALIZED (
  SELECT a.rep AS src, b.rep AS dst, SUM(e.weight) AS weight
  FROM lv{lv}e e
  JOIN lv{lv}map a ON a.id = e.src
  JOIN lv{lv}map b ON b.id = e.dst
  WHERE a.rep <> b.rep
  GROUP BY 1, 2
)""")
    parts.append(
        "cm0 AS (SELECT p.id, COALESCE(m.rep, p.anchor) AS rep "
        "FROM pmap p LEFT JOIN lv0map m ON m.id = p.anchor)"
    )
    for lv in range(1, levels):
        parts.append(
            f"cm{lv} AS (SELECT c.id, COALESCE(m.rep, c.rep) AS rep "
            f"FROM cm{lv - 1} c LEFT JOIN lv{lv}map m ON m.id = c.rep)"
        )
    parts.append(
        f"cmap AS MATERIALIZED (SELECT id, rep FROM cm{levels - 1})"
    )
    if init == "hash":
        h = _MD5_INT_SQL.format(col="r.rep")
        parts.append(f"""cparts AS (
  SELECT r.rep, CAST({h} % {k} AS INTEGER) AS part
  FROM (SELECT DISTINCT rep FROM cmap) r
)""")
    elif init == "lpa":
        from centrality_gpu_spark.operators.labelprop import lpa_ctes

        h = _MD5_INT_SQL.format(col="z.id")
        parts.append(
            "csize AS MATERIALIZED (SELECT rep AS id, COUNT(*) AS size "
            "FROM cmap GROUP BY rep)"
        )
        parts.append(
            lpa_ctes(f"lv{levels}e", lpa_iters, weighted=True, prefix="q")
        )
        parts.append(f"""qcap AS (
  SELECT (COUNT(*) * {100 + slack_pct} + {100 * k} - 1) // {100 * k} AS cap
  FROM cmap
),
qsz AS (
  SELECT l.label, SUM(z.size) AS csz
  FROM ql{lpa_iters} l JOIN csize z ON z.id = l.id
  GROUP BY l.label
),
qpk AS (
  SELECT label,
         CAST((ROW_NUMBER() OVER (ORDER BY csz DESC, label ASC) - 1) % {k}
              AS INTEGER) AS part
  FROM qsz WHERE csz <= (SELECT cap FROM qcap)
),
qsp AS (
  SELECT l.id,
         CAST((ROW_NUMBER() OVER (PARTITION BY l.label
               ORDER BY z.size DESC, l.id ASC) - 1) % {k}
              AS INTEGER) AS part
  FROM ql{lpa_iters} l
  JOIN csize z ON z.id = l.id
  JOIN qsz s ON s.label = l.label
  WHERE s.csz > (SELECT cap FROM qcap)
),
cparts AS (
  SELECT l.id AS rep, p.part
  FROM ql{lpa_iters} l JOIN qpk p ON p.label = l.label
  UNION ALL
  SELECT id AS rep, part FROM qsp
  UNION ALL
  SELECT z.id AS rep, CAST({h} % {k} AS INTEGER) AS part
  FROM csize z WHERE z.id NOT IN (SELECT id FROM ql{lpa_iters})
)""")
    else:
        parts.append(_grow_ctes(f"lv{levels}e", k, grow_rounds, slack_pct))
    parts.append(
        "parts AS (SELECT m.id, p.part FROM cmap m JOIN cparts p "
        "ON p.rep = m.rep)"
    )
    return ",\n".join(parts)


def partition_oracle_sql(
    edges_cte: str,
    k: int,
    rounds: int | None = None,
    levels: int = 1,
    init: str = "lpa",
    grow_rounds: int = GROW_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    peel_rounds: int = PEEL_ROUNDS,
    lpa_iters: int = LPA_INIT_ITERS,
) -> str:
    """DuckDB twin of ``partition_graph``. Output (id, part) ordered
    by id."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(
        edges_cte, k, rounds or MATCHING_MAX_ROUNDS, levels, init,
        grow_rounds, slack_pct, peel_rounds, lpa_iters,
    )
    return f"WITH {ctes}\nSELECT id, part FROM parts ORDER BY id"


def _refine_ctes(k: int, rounds: int, slack_pct: int) -> str:
    """CTE chain from ``parts(id, part)`` to ``rp{rounds}(id, part)`` —
    the unrolled ``refine_partition`` (extra rounds past the fixpoint
    are no-ops, so a fixed unroll is exact)."""
    out = [
        "rp0 AS MATERIALIZED (SELECT id, part FROM parts)",
        f"caps AS (SELECT (COUNT(*) * {100 + slack_pct} + {100 * k} - 1) "
        f"// {100 * k} AS cap FROM rp0)",
    ]
    for r in range(rounds):
        gate = "target < cur" if r % 2 == 0 else "target > cur"
        out.append(f"""rfld{r} AS MATERIALIZED (
  SELECT part, COUNT(*) AS load FROM rp{r} GROUP BY part
),
rfcd{r} AS MATERIALIZED (
  SELECT id, c, MAX(w) AS w FROM (
    SELECT e.src AS id, p.part AS c, SUM(e.weight) AS w
    FROM edges e JOIN rp{r} p ON p.id = e.dst GROUP BY e.src, p.part
    UNION ALL SELECT id, part AS c, 0.0 AS w FROM rp{r}
  ) GROUP BY id, c
),
rfbs{r} AS MATERIALIZED (
  SELECT id, cur, c AS target, w AS wbest,
         MAX(CASE WHEN c = cur THEN w END) OVER (PARTITION BY id) AS wcur,
         ROW_NUMBER() OVER (PARTITION BY id
           ORDER BY w DESC, (c = cur) DESC, c ASC) AS rk
  FROM (
    SELECT cd.id, cd.c, cd.w, p.part AS cur
    FROM rfcd{r} cd JOIN rp{r} p ON p.id = cd.id
    LEFT JOIN rfld{r} l ON l.part = cd.c
    WHERE cd.c = p.part OR COALESCE(l.load, 0) < (SELECT cap FROM caps)
  )
),
rfmv{r} AS MATERIALIZED (
  SELECT b.id, b.target,
         COALESCE(l.load, 0) + ROW_NUMBER() OVER (
           PARTITION BY b.target ORDER BY b.wbest DESC, b.id ASC
         ) <= (SELECT cap FROM caps) AS admit
  FROM (SELECT * FROM rfbs{r}
        WHERE rk = 1 AND target <> cur AND wbest > wcur AND {gate}) b
  LEFT JOIN rfld{r} l ON l.part = b.target
),
rp{r + 1} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN m.admit THEN m.target ELSE p.part END AS part
  FROM rp{r} p
  LEFT JOIN rfmv{r} m ON m.id = p.id
)""")
    return ",\n".join(out)


def refined_partition_oracle_sql(
    edges_cte: str,
    k: int,
    rounds: int | None = None,
    refine_rounds: int = REFINE_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    levels: int = 1,
    init: str = "lpa",
    grow_rounds: int = GROW_ROUNDS,
    peel_rounds: int = PEEL_ROUNDS,
    lpa_iters: int = LPA_INIT_ITERS,
) -> str:
    """DuckDB twin of ``refine_partition(partition_graph(...))``.
    Output (id, part) ordered by id."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(
        edges_cte, k, rounds or MATCHING_MAX_ROUNDS, levels, init,
        grow_rounds, slack_pct, peel_rounds, lpa_iters,
    )
    refine = _refine_ctes(k, refine_rounds, slack_pct)
    return (
        f"WITH {ctes},\n{refine}\n"
        f"SELECT id, part FROM rp{refine_rounds} ORDER BY id"
    )


def refined_edge_cut_oracle_sql(
    edges_cte: str,
    k: int,
    rounds: int | None = None,
    refine_rounds: int = REFINE_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    levels: int = 1,
    init: str = "lpa",
    grow_rounds: int = GROW_ROUNDS,
    peel_rounds: int = PEEL_ROUNDS,
    lpa_iters: int = LPA_INIT_ITERS,
) -> str:
    """DuckDB twin of ``edge_cut_summary`` over the refined multilevel
    partition. One row."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(
        edges_cte, k, rounds or MATCHING_MAX_ROUNDS, levels, init,
        grow_rounds, slack_pct, peel_rounds, lpa_iters,
    )
    refine = _refine_ctes(k, refine_rounds, slack_pct)
    return f"""WITH {ctes},
{refine},
cut AS (
  SELECT SUM(CASE WHEN a.part <> b.part THEN e.weight ELSE 0 END) / 2 AS cut_weight,
         SUM(e.weight) / 2 AS total_weight
  FROM edges e
  JOIN rp{refine_rounds} a ON a.id = e.src
  JOIN rp{refine_rounds} b ON b.id = e.dst
),
sizes AS (SELECT part, COUNT(*) AS n FROM rp{refine_rounds} GROUP BY part)
SELECT CAST(COUNT(*) AS BIGINT) AS k_parts,
       ROUND((SELECT cut_weight FROM cut), 6) AS cut_weight,
       ROUND((SELECT total_weight FROM cut), 6) AS total_weight,
       ROUND((SELECT cut_weight / total_weight FROM cut), 6) AS cut_fraction,
       MIN(n) AS min_part_size,
       MAX(n) AS max_part_size
FROM sizes"""


def edge_cut_oracle_sql(
    edges_cte: str,
    k: int,
    rounds: int | None = None,
    levels: int = 1,
    init: str = "lpa",
    grow_rounds: int = GROW_ROUNDS,
    slack_pct: int = REFINE_SLACK_PCT,
    peel_rounds: int = PEEL_ROUNDS,
    lpa_iters: int = LPA_INIT_ITERS,
) -> str:
    """DuckDB twin of ``edge_cut_summary`` over the multilevel
    partition. One row."""
    from centrality_gpu_spark.operators.matching import MATCHING_MAX_ROUNDS

    ctes = _partition_ctes(
        edges_cte, k, rounds or MATCHING_MAX_ROUNDS, levels, init,
        grow_rounds, slack_pct, peel_rounds, lpa_iters,
    )
    return f"""WITH {ctes},
cut AS (
  SELECT SUM(CASE WHEN a.part <> b.part THEN e.weight ELSE 0 END) / 2 AS cut_weight,
         SUM(e.weight) / 2 AS total_weight
  FROM edges e
  JOIN parts a ON a.id = e.src
  JOIN parts b ON b.id = e.dst
),
sizes AS (SELECT part, COUNT(*) AS n FROM parts GROUP BY part)
SELECT CAST(COUNT(*) AS BIGINT) AS k_parts,
       ROUND((SELECT cut_weight FROM cut), 6) AS cut_weight,
       ROUND((SELECT total_weight FROM cut), 6) AS total_weight,
       ROUND((SELECT cut_weight / total_weight FROM cut), 6) AS cut_fraction,
       MIN(n) AS min_part_size,
       MAX(n) AS max_part_size
FROM sizes"""


def _wrefine_ctes(
    prefix: str,
    edges_name: str,
    sizes_name: str,
    parts_in: str,
    k: int,
    rounds: int,
    cap_select: str,
) -> str:
    """Weighted variant of ``_refine_ctes``: loads and the admission
    rule run in fine-vertex units (``SUM(size)`` against the fine-level
    cap) instead of row counts — the exact DuckDB twin of
    ``refine_partition(..., sizes=, cap=)`` as the V-cycle calls it at
    every level. CTE names are ``{prefix}``-scoped so one query can
    chain a refine per level."""
    out = [
        f"{prefix}rp0 AS MATERIALIZED (SELECT id, part FROM {parts_in})"
    ]
    for r in range(rounds):
        gate = "target < cur" if r % 2 == 0 else "target > cur"
        out.append(f"""{prefix}ld{r} AS MATERIALIZED (
  SELECT p.part, SUM(s.size) AS load
  FROM {prefix}rp{r} p JOIN {sizes_name} s ON s.id = p.id
  GROUP BY p.part
),
{prefix}cd{r} AS MATERIALIZED (
  SELECT id, c, MAX(w) AS w FROM (
    SELECT e.src AS id, p.part AS c, SUM(e.weight) AS w
    FROM {edges_name} e JOIN {prefix}rp{r} p ON p.id = e.dst
    GROUP BY e.src, p.part
    UNION ALL SELECT id, part AS c, 0.0 AS w FROM {prefix}rp{r}
  ) GROUP BY id, c
),
{prefix}bs{r} AS MATERIALIZED (
  SELECT id, cur, c AS target, w AS wbest,
         MAX(CASE WHEN c = cur THEN w END) OVER (PARTITION BY id) AS wcur,
         ROW_NUMBER() OVER (PARTITION BY id
           ORDER BY w DESC, (c = cur) DESC, c ASC) AS rk
  FROM (
    SELECT cd.id, cd.c, cd.w, p.part AS cur
    FROM {prefix}cd{r} cd JOIN {prefix}rp{r} p ON p.id = cd.id
    LEFT JOIN {prefix}ld{r} l ON l.part = cd.c
    WHERE cd.c = p.part OR COALESCE(l.load, 0) < ({cap_select})
  )
),
{prefix}mv{r} AS MATERIALIZED (
  SELECT b.id, b.target,
         COALESCE(l.load, 0) + SUM(s.size) OVER (
           PARTITION BY b.target ORDER BY b.wbest DESC, b.id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) <= ({cap_select}) AS admit
  FROM (SELECT * FROM {prefix}bs{r}
        WHERE rk = 1 AND target <> cur AND wbest > wcur AND {gate}) b
  JOIN {sizes_name} s ON s.id = b.id
  LEFT JOIN {prefix}ld{r} l ON l.part = b.target
),
{prefix}rp{r + 1} AS MATERIALIZED (
  SELECT p.id, CASE WHEN m.admit THEN m.target ELSE p.part END AS part
  FROM {prefix}rp{r} p LEFT JOIN {prefix}mv{r} m ON m.id = p.id
)""")
    return ",\n".join(out)


def vcycle_oracle_sql(
    edges_cte: str,
    k: int,
    levels: int = 2,
    match_rounds: int = 8,
    refine_rounds: int = 4,
    slack_pct: int = REFINE_SLACK_PCT,
    peel_rounds: int = PEEL_ROUNDS,
    lpa_iters: int = LPA_INIT_ITERS,
) -> str:
    """DuckDB twin of ``partition_multilevel(..., exact_levels=levels)``
    — the whole V-cycle unrolled into one query: pendant collapse,
    ``levels`` matching+contraction descents, weighted-LPA packing at
    the coarsest level, then a weighted refine at every level on the
    way back up with the projection joins in between, and the final
    pendant projection. Output (id, part) ordered by id.

    Assumes the coarsening never fully empties (true whenever the core
    graph has edges) — the ``exact_levels`` Spark mode only stops
    early on an empty edge set."""
    from centrality_gpu_spark.operators.labelprop import lpa_ctes
    from centrality_gpu_spark.operators.matching import matching_ctes

    parts = [
        edges_cte,
        _peel_ctes(peel_rounds),
        f"lv0e AS (SELECT src, dst, weight FROM p{peel_rounds}e)",
        "cmf0 AS MATERIALIZED (SELECT id, anchor AS rep FROM pmap)",
    ]
    for lv in range(levels):
        parts.append(
            matching_ctes(
                f"lv{lv}e", match_rounds, prefix=f"l{lv}", by_weight=True
            )
        )
        parts.append(f"""lv{lv}map AS MATERIALIZED (
  SELECT v.id, COALESCE(m.src, v.id) AS rep
  FROM (SELECT DISTINCT src AS id FROM lv{lv}e) v
  LEFT JOIN l{lv}m{match_rounds} m ON m.dst = v.id
),
lv{lv + 1}e AS MATERIALIZED (
  SELECT a.rep AS src, b.rep AS dst, SUM(e.weight) AS weight
  FROM lv{lv}e e
  JOIN lv{lv}map a ON a.id = e.src
  JOIN lv{lv}map b ON b.id = e.dst
  WHERE a.rep <> b.rep
  GROUP BY 1, 2
),
cmf{lv + 1} AS MATERIALIZED (
  SELECT c.id, COALESCE(m.rep, c.rep) AS rep
  FROM cmf{lv} c LEFT JOIN lv{lv}map m ON m.id = c.rep
)""")
    for lv in range(levels + 1):
        parts.append(
            f"sz{lv} AS MATERIALIZED (SELECT rep AS id, COUNT(*) AS size "
            f"FROM cmf{lv} GROUP BY rep)"
        )
    parts.append(
        f"vcap AS (SELECT (COUNT(*) * {100 + slack_pct} + {100 * k} - 1) "
        f"// {100 * k} AS cap FROM cmf0)"
    )
    parts.append(
        lpa_ctes(f"lv{levels}e", lpa_iters, weighted=True, prefix="q")
    )
    h = _MD5_INT_SQL.format(col="z.id")
    parts.append(f"""qsz AS (
  SELECT l.label, SUM(z.size) AS csz
  FROM ql{lpa_iters} l JOIN sz{levels} z ON z.id = l.id
  GROUP BY l.label
),
qpk AS (
  SELECT label,
         CAST((ROW_NUMBER() OVER (ORDER BY csz DESC, label ASC) - 1) % {k}
              AS INTEGER) AS part
  FROM qsz WHERE csz <= (SELECT cap FROM vcap)
),
qsp AS (
  SELECT l.id,
         CAST((ROW_NUMBER() OVER (PARTITION BY l.label
               ORDER BY z.size DESC, l.id ASC) - 1) % {k}
              AS INTEGER) AS part
  FROM ql{lpa_iters} l
  JOIN sz{levels} z ON z.id = l.id
  JOIN qsz s ON s.label = l.label
  WHERE s.csz > (SELECT cap FROM vcap)
),
asg{levels} AS MATERIALIZED (
  SELECT l.id, p.part
  FROM ql{lpa_iters} l JOIN qpk p ON p.label = l.label
  UNION ALL
  SELECT id, part FROM qsp
  UNION ALL
  SELECT z.id, CAST({h} % {k} AS INTEGER) AS part
  FROM sz{levels} z WHERE z.id NOT IN (SELECT id FROM ql{lpa_iters})
)""")
    prev = f"asg{levels}"
    for lv in range(levels, -1, -1):
        parts.append(
            _wrefine_ctes(
                f"w{lv}", f"lv{lv}e", f"sz{lv}", prev, k, refine_rounds,
                "SELECT cap FROM vcap",
            )
        )
        if lv > 0:
            parts.append(f"""asg{lv - 1} AS MATERIALIZED (
  SELECT v.id, p.part
  FROM sz{lv - 1} v
  LEFT JOIN lv{lv - 1}map m ON m.id = v.id
  JOIN w{lv}rp{refine_rounds} p ON p.id = COALESCE(m.rep, v.id)
)""")
            prev = f"asg{lv - 1}"
    return (
        f"WITH {','.join(parts)}\n"
        f"SELECT p.id, a.part FROM pmap p "
        f"JOIN w0rp{refine_rounds} a ON a.id = p.anchor ORDER BY p.id"
    )
