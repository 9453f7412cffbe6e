"""BPE training: the Spark merge sequence and final segmentation must
EXACTLY equal a pure-Python reference implementation (same greedy
left-to-right merge scan, same (count desc, pair asc) tie-break)."""

import collections

from centrality_gpu_spark.operators.bpe import (
    END_OF_WORD,
    bpe_tokenize,
    bpe_train,
    word_histogram,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


# ----------------------------------------------- pure-Python reference

def _ref_histogram(texts):
    h = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            h[w] += 1
    return h


def _ref_merge(syms, l, r):
    out = []
    for x in syms:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return out


def _ref_bpe(texts, n_merges, min_pair_count=2):
    hist = _ref_histogram(texts)
    vocab = {w: list(w) + [END_OF_WORD] for w in hist}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += hist[w]
        if not pairs:
            break
        (l, r), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        vocab = {w: _ref_merge(s, l, r) for w, s in vocab.items()}
    return merges, vocab


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "low new wide lower newer",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t, "en", "s", 0) for i, t in enumerate(texts)], DOC_SCHEMA
    )


def test_word_histogram(spark):
    got = {r.word: r.cnt for r in word_histogram(_docs(spark)).collect()}
    assert got == dict(_ref_histogram(TEXTS))


def test_merge_sequence_matches_reference(spark):
    merges, segmented = bpe_train(_docs(spark), n_merges=12)
    ref_merges, ref_vocab = _ref_bpe(TEXTS, n_merges=12)
    assert merges == ref_merges
    got = {r.word: list(r.syms) for r in segmented.collect()}
    assert got == ref_vocab


def test_greedy_scan_on_repeats(spark):
    # "aaaa" under merge (a, a) must segment [aa, aa, </w>], never
    # [a, aa, a, </w>] — pins the left-to-right non-overlapping scan
    texts = ["aaaa aaaa aa"]
    merges, segmented = bpe_train(_docs(spark, texts), n_merges=1)
    assert merges[0][:2] == ("a", "a")
    got = {r.word: list(r.syms) for r in segmented.collect()}
    assert got["aaaa"] == ["aa", "aa", END_OF_WORD]
    assert got["aa"] == ["aa", END_OF_WORD]


def test_tokenize_and_oov_fallback(spark):
    docs = _docs(spark)
    merges, segmented = bpe_train(docs, n_merges=12)
    _, ref_vocab = _ref_bpe(TEXTS, n_merges=12)
    new_docs = spark.createDataFrame(
        [(100, "low newest zzz", "en", "s", 0), (101, "", "en", "s", 0)],
        DOC_SCHEMA,
    )
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_tokenize(new_docs, segmented).collect()
    }
    want_100 = (
        ref_vocab["low"]
        + ref_vocab["newest"]
        + list("zzz")
        + [END_OF_WORD]  # OOV -> character fallback
    )
    assert got[100] == want_100
    assert got[101] == []  # empty doc stays, with no tokens


def test_driver_and_distributed_fits_agree(spark):
    """merge_batch=1 distributed mode must emit the identical merge
    sequence and final segmentation as the driver heap fit (the driver
    fit is an optimization, not a new semantics)."""
    docs = _docs(spark)
    m_drv, seg_drv = bpe_train(docs, n_merges=12, fit_mode="driver")
    m_dst, seg_dst = bpe_train(
        docs, n_merges=12, fit_mode="distributed", merge_batch=1
    )
    assert m_drv == m_dst
    got_drv = {r.word: list(r.syms) for r in seg_drv.collect()}
    got_dst = {r.word: list(r.syms) for r in seg_dst.collect()}
    assert got_drv == got_dst


def test_select_batch_rejects_interfering_pairs():
    from centrality_gpu_spark.operators.bpe import _select_batch

    ranked = [
        ("a", "b", 10),   # taken
        ("b", "c", 9),    # shares b -> rejected
        ("ab", "z", 8),   # 'ab' == joined of (a,b) -> rejected
        ("x", "y", 7),    # disjoint -> taken
        ("q", "xy", 6),   # 'xy' == joined of (x,y) -> rejected
        ("m", "n", 1),    # below min_pair_count -> stops
    ]
    got = _select_batch(ranked, limit=10, min_pair_count=2)
    assert got == [("a", "b", 10), ("x", "y", 7)]
    # limit=1 degenerates to the classic argmax
    assert _select_batch(ranked, 1, 2) == [("a", "b", 10)]


def _batched_fit_py(items, n_merges, min_pair_count, batch):
    """Pure-Python twin of the batched distributed fit: full pair
    recount per round, (n desc, l, r) ranking, the same greedy
    non-interference selection, one multi-fold rewrite per round."""
    from centrality_gpu_spark.operators.bpe import (
        _multi_fold_py,
        _select_batch,
    )

    sym_list = [list(w) + [END_OF_WORD] for w, _ in items]
    merges = []
    while len(merges) < n_merges:
        counts = {}
        for (w, c), s in zip(items, sym_list):
            for p in zip(s, s[1:]):
                counts[p] = counts.get(p, 0) + c
        ranked = sorted(
            ((l, r, n) for (l, r), n in counts.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        sel = _select_batch(
            ranked, min(batch, n_merges - len(merges)), min_pair_count
        )
        if not sel:
            break
        merges.extend(sel)
        prs = [(l, r) for l, r, _ in sel]
        sym_list = [_multi_fold_py(s, prs) for s in sym_list]
    return merges, {
        w: s for (w, _), s in zip(items, sym_list)
    }


def test_batched_distributed_matches_python_twin(spark):
    """The batched fallback (VERDICT r3 item #6): merges and final
    segmentation must equal the pure-Python batched reference — and the
    round count is ceil-ish in n_merges/batch, not one job per merge."""
    docs = _docs(spark)
    from centrality_gpu_spark.operators.bpe import word_histogram

    items = [
        (r.word, int(r.cnt))
        for r in word_histogram(docs).orderBy("word").collect()
    ]
    for batch in (4, 8):
        m_ref, seg_ref = _batched_fit_py(items, 12, 2, batch)
        m_got, seg_got = bpe_train(
            docs, n_merges=12, fit_mode="distributed", merge_batch=batch
        )
        assert m_got == m_ref
        got = {r.word: list(r.syms) for r in seg_got.collect()}
        assert got == seg_ref
