"""BPE tokenizer training and application (Sennrich, Haddow, Birch,
ACL 2016) — the tokenizer-fit step of a pretraining data pipeline.

Classic word-internal BPE trained on the WORD-TYPE HISTOGRAM, not the
raw corpus: one explode + groupBy(word) collapses a 100 TB corpus to a
vocabulary-sized (word, count) table (tens of millions of rows at web
scale — trivially partitionable), and every merge round then runs on
that small table. Per round:

1. adjacent-pair counts: explode each word's symbol array into
   (left, right) pairs weighted by the word count — one groupBy;
2. pick the max-count pair (ties: lexicographic (left, right) — makes
   the whole merge SEQUENCE deterministic, which the pure-Python
   reference test pins exactly);
3. rewrite every symbol array with the merged pair via a left-to-right
   greedy fold — a single ``F.aggregate`` expression (JVM codegen, no
   Python in the loop), matching the reference implementation's scan
   order (so "aaaa" under merge (a,a) becomes [aa, aa], never
   [a, aa, a]).

The merge loop is inherently sequential (each round's counts depend on
the previous round's rewrite) — the same structure as every superstep
operator here; rounds cost O(vocab) each, independent of corpus size.
Verification is the pure-Python reference (exact merge-sequence and
segmentation equality) — the per-round argmax-then-rewrite recurrence
has no tractable SQL unroll, so this operator is pytest-verified like
the streaming accumulators (G, disclosed in SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_histogram(documents: DataFrame) -> DataFrame:
    """(word, cnt) — lowercased whitespace-token counts, the BPE
    training input."""
    words = F.explode(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
        )
    )
    return (
        documents.select(words.alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols():
    """word → its character array with the end-of-word marker appended
    (the marker lets merges learn suffixes, per the paper)."""
    return F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
    )


def _merge_fold(l: str, r: str):
    """Greedy left-to-right merge of adjacent (l, r) in ``syms`` — one
    aggregate expression. After a merge the joined symbol cannot
    immediately re-merge as the left part (matches the reference
    scan)."""
    joined = l + r

    def step(acc, x):
        # a just-merged element can never equal l (l+r != l, r is
        # non-empty), so the fold can't cascade within one pass —
        # exactly the non-overlapping left-to-right scan of the
        # reference's regex substitution
        can_merge = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(l))
            & (x == F.lit(r))
        )
        return F.when(
            can_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


def _fold_py(s: list[str], l: str, r: str) -> list[str]:
    """Pure-Python twin of ``_merge_fold`` — identical greedy
    left-to-right non-cascading scan."""
    out: list[str] = []
    for x in s:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return out


_PAIR_SEP = "\x00"


def _multi_merge_fold(pairs: list[tuple[str, str]]):
    """One-pass fold applying a BATCH of pairwise-non-interfering merges
    (see ``_select_batch``): the (last, next) key is probed in a map
    literal, so the expression size is O(1) in the batch size (a
    when-chain per pair would blow up codegen at B=64+). Non-cascading
    by construction — no pair's joined symbol is another pair's left
    (rejected at selection), and l+r != l."""
    entries = []
    for l, r in pairs:
        entries += [F.lit(l + _PAIR_SEP + r), F.lit(l + r)]
    m = F.create_map(*entries)

    def step(acc, x):
        hit = F.try_element_at(
            m, F.concat(F.element_at(acc, -1), F.lit(_PAIR_SEP), x)
        )
        can = (F.size(acc) > 0) & hit.isNotNull()
        return F.when(
            can,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(hit)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


def _multi_fold_py(s: list[str], pairs: list[tuple[str, str]]) -> list[str]:
    """Pure-Python twin of ``_multi_merge_fold``."""
    mm = {l + _PAIR_SEP + r: l + r for l, r in pairs}
    out: list[str] = []
    for x in s:
        hit = mm.get(out[-1] + _PAIR_SEP + x) if out else None
        if hit is not None:
            out[-1] = hit
        else:
            out.append(x)
    return out


def _select_batch(
    ranked: list[tuple[str, str, int]], limit: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    """Greedy prefix of ``ranked`` ((l, r, n) in (n desc, l, r) order)
    of pairwise NON-INTERFERING pairs, at most ``limit``.

    Two pairs interfere when their symbol sets — including the joined
    symbol l+r — intersect. Under that disjointness (a) applying one
    batch member cannot create or destroy occurrences of another, so
    every accepted pair's count stays exact at its application time,
    and (b) the one-pass multi-fold equals applying the accepted merges
    sequentially in any order. The only divergence from classic BPE is
    the interleaving: classic BPE would re-rank after each merge and
    might promote a pair *produced* by an earlier one before the rest
    of the batch. ``limit=1`` degenerates to the exact classic
    sequence."""
    taken: list[tuple[str, str, int]] = []
    blocked: set[str] = set()
    for l, r, n in ranked:
        if len(taken) >= limit or n < min_pair_count:
            break
        syms = {l, r, l + r}
        if syms & blocked:
            continue
        taken.append((l, r, n))
        blocked |= syms
    return taken


def _bpe_fit_inmemory(
    items: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> tuple[list[tuple[str, str, int]], list[tuple[str, int, list[str]]]]:
    """Classic heap-based BPE fit on a collected (word, cnt) histogram
    (Sennrich et al. 2016 §3.2's incremental variant): pair counts are
    updated only for the words a merge touched, and a lazy max-heap
    picks each round's argmax — no per-merge corpus pass, no per-merge
    Spark job. Tie-break: lexicographically smallest (l, r) among the
    max-count pairs (same order as the distributed twin's
    ``orderBy(desc(n), asc(l), asc(r))``)."""
    import heapq
    from collections import defaultdict

    syms: list[list[str]] = []
    cnts: list[int] = []
    counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (word, cnt) in enumerate(items):
        s = list(word) + [END_OF_WORD]
        syms.append(s)
        cnts.append(cnt)
        for pair in zip(s, s[1:]):
            counts[pair] += cnt
            where[pair].add(i)

    # lazy heap: stale entries are skipped when their recorded count no
    # longer matches the live counts dict
    heap = [(-n, p[0], p[1]) for p, n in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        neg_n, l, r = heapq.heappop(heap)
        n = -neg_n
        if counts.get((l, r), 0) != n:
            continue  # stale
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        touched: set[tuple[str, str]] = set()
        for i in sorted(where[(l, r)]):
            old = syms[i]
            new = _fold_py(old, l, r)
            c = cnts[i]
            for pair in zip(old, old[1:]):
                counts[pair] -= c
                touched.add(pair)
                if counts[pair] <= 0:
                    counts.pop(pair, None)
                where[pair].discard(i)
            for pair in zip(new, new[1:]):
                counts[pair] += c
                touched.add(pair)
                where[pair].add(i)
            syms[i] = new
        for pair in touched:
            if pair in counts:
                heapq.heappush(heap, (-counts[pair], pair[0], pair[1]))
    return merges, [
        (w, c, s) for (w, _), c, s in zip(items, cnts, syms)
    ]


def bpe_train(
    documents: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
    fit_mode: str = "auto",
    max_vocab_rows: int = 2_000_000,
    merge_batch: int = 64,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, segmented)``: the ordered merge list
    [(left, right, count), ...] and the final (word, cnt, syms)
    segmentation table (the broadcast-able word→tokens mapping
    ``bpe_tokenize`` applies). Stops early when no pair reaches
    ``min_pair_count``.

    The word-type histogram is vocabulary-sized regardless of corpus
    size, so the merge recurrence itself is NOT distributed work:
    ``fit_mode='driver'`` (the default when the histogram fits
    ``max_vocab_rows``) collects it once and runs the classic
    incremental heap fit — 32k merges in seconds instead of 32k
    sequential Spark jobs. ``fit_mode='distributed'`` keeps the rounds
    on the cluster for vocabularies past the guard, merging up to
    ``merge_batch`` pairwise-non-interfering pairs per round (classic
    vocab-parallel batched BPE): O(n_merges / merge_batch) jobs
    instead of one job per merge. Batch members' counts are exact at
    application time (the disjointness rule in ``_select_batch``
    guarantees non-interference); only the merge *interleaving* may
    differ from the classic sequence, so the parity test for the
    batched mode is segmentation equality against the pure-Python
    batched twin rather than merge-sequence equality.
    ``merge_batch=1`` reproduces the classic sequence exactly.

    **Auto-mode seam**: a corpus whose vocabulary grows past
    ``max_vocab_rows`` crosses from the driver fit (classic sequence)
    to the batched distributed fit, and the learned merge ORDER may
    change at that seam (vocab-parallel BPE's standard trade; both
    sides stay fully deterministic). Pin ``fit_mode`` + ``merge_batch``
    (e.g. ``fit_mode='distributed', merge_batch=1``) when bit-stable
    tokenization across corpus growth matters more than fit latency.
    """
    hist = word_histogram(documents)
    if fit_mode == "auto":
        fit_mode = (
            "driver" if hist.count() <= max_vocab_rows else "distributed"
        )
    if fit_mode == "driver":
        items = [
            (r.word, int(r.cnt))
            for r in hist.orderBy("word").collect()
        ]
        merges, seg = _bpe_fit_inmemory(items, n_merges, min_pair_count)
        segmented = documents.sparkSession.createDataFrame(
            seg, "word string, cnt long, syms array<string>"
        )
        return merges, segmented
    if fit_mode != "distributed":
        raise ValueError(f"unknown fit_mode {fit_mode!r}")

    vocab = (
        hist
        .select("word", "cnt", _initial_symbols().alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
        )
        # over-fetch candidates, then DEEPEN on exhaustion: the greedy
        # selection must see the same ranking the pure-Python twin scans
        # in full, so if interference consumes the fetched prefix before
        # the batch is filled — while deeper candidates could still be
        # eligible — re-fetch with a larger limit instead of silently
        # taking a thinner batch than the twin would.
        want = min(merge_batch, n_merges - len(merges))
        ranked_df = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
        )
        fetch = max(8 * want, 64)
        while True:
            top = ranked_df.limit(fetch).collect()
            ranked = [(t.l, t.r, int(t.n)) for t in top]
            batch = _select_batch(ranked, want, min_pair_count)
            # conclusive when: batch filled, ranking exhausted (fewer
            # rows than asked for), or the fetched tail already fell
            # below min_pair_count (everything unseen ranks lower still)
            if (
                len(batch) >= want
                or len(top) < fetch
                or ranked[-1][2] < min_pair_count
            ):
                break
            fetch *= 4
        if not batch:
            break
        merges.extend(batch)
        if len(batch) == 1:
            l, r, _ = batch[0]
            fold = _merge_fold(l, r)
        else:
            fold = _multi_merge_fold([(l, r) for l, r, _ in batch])
        vocab = vocab.select(
            "word", "cnt", fold.alias("syms")
        ).localCheckpoint()
    return merges, vocab


def bpe_tokenize(
    documents: DataFrame, segmented: DataFrame
) -> DataFrame:
    """(doc_id, tokens) — each document's text as BPE tokens: words
    looked up in the broadcast word→syms mapping (OOV words fall back
    to their character segmentation), concatenated in word order.

    One posexplode + broadcast join + groupBy(doc_id) reassembly — the
    mapping is vocabulary-sized, never the corpus.
    """
    words = documents.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("pos", "word"),
    )
    seg = segmented.select("word", "syms")
    joined = words.join(F.broadcast(seg), "word", "left").select(
        "doc_id",
        "pos",
        F.coalesce(
            "syms",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))),
        ).alias("syms"),
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
        .join(documents.select("doc_id"), "doc_id", "right")
        .select(
            "doc_id",
            F.coalesce("tokens", F.array().cast("array<string>")).alias(
                "tokens"
            ),
        )
    )
