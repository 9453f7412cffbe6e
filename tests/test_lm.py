"""Corpus-distribution curation ops: unigram-LM perplexity, duplicated
n-gram fraction, DSIR importance weights — pure-Python reference
equality + the semantic ordering each signal exists to provide."""

import math

import pytest

from centrality_gpu_spark.operators.lm import (
    DSIR_BUCKET_HEX,
    dsir_weights,
    duplicate_ngram_fraction,
    perplexity,
    unigram_lm,
)


def _tokens(text: str) -> list[str]:
    return [w for w in text.lower().split() if w]


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the mat"),
    (2, "quantum flux capacitors destabilize rapidly"),
    (3, "the the the the the the"),
    (4, ""),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _ref_lm(rows):
    from collections import Counter

    cnt = Counter(t for _, text in rows for t in _tokens(text))
    n, v = sum(cnt.values()), len(cnt)
    return {t: math.log((c + 1) / (n + v)) for t, c in cnt.items()}, cnt


def test_unigram_lm_formula(spark, docs):
    lm = {r.token: (r.cnt, r.logp) for r in unigram_lm(docs).collect()}
    ref, cnt = _ref_lm(DOCS)
    assert set(lm) == set(ref)
    for t, (c, logp) in lm.items():
        assert c == cnt[t]
        assert logp == pytest.approx(ref[t], rel=1e-12)


def test_perplexity_self_scored(spark, docs):
    ref, _ = _ref_lm(DOCS)
    got = {r.doc_id: r for r in perplexity(docs).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for doc_id, text in DOCS:
        toks = _tokens(text)
        assert got[doc_id].n_tokens == len(toks)
        if toks:
            exp = math.exp(-sum(ref[t] for t in toks) / len(toks))
            assert got[doc_id].ppl == pytest.approx(exp, abs=1e-5)
        else:
            assert got[doc_id].ppl == 0.0
    # the all-"the" doc is the most predictable; the jargon doc the least
    ppls = {d: got[d].ppl for d in (0, 1, 2, 3)}
    assert ppls[3] == min(ppls.values())
    assert ppls[2] == max(ppls.values())


def test_perplexity_external_lm_requires_oov(spark, docs):
    lm = unigram_lm(docs)
    with pytest.raises(ValueError, match="oov_logp"):
        perplexity(docs, lm=lm)
    other = spark.createDataFrame(
        [(9, "the unseen zebra")], "doc_id long, text string"
    )
    oov = math.log(1e-6)
    got = {r.doc_id: r for r in perplexity(other, lm=lm, oov_logp=oov).collect()}
    ref, _ = _ref_lm(DOCS)
    exp = math.exp(-(ref["the"] + oov + oov) / 3)
    assert got[9].ppl == pytest.approx(exp, abs=1e-5)


def test_duplicate_ngram_fraction_exact(spark, docs):
    # 2-grams: doc0/doc1 share "sat on", "on the", "the mat" (each
    # corpus count 2); doc3's "the the" appears 5 times in itself.
    got = {r.doc_id: r for r in duplicate_ngram_fraction(docs, n=2).collect()}
    assert (got[0].n_grams, got[0].dup_grams) == (5, 3)
    assert (got[1].n_grams, got[1].dup_grams) == (5, 3)
    assert (got[2].n_grams, got[2].dup_grams) == (4, 0)
    assert (got[3].n_grams, got[3].dup_grams) == (5, 5)
    assert (got[4].n_grams, got[4].dup_grams) == (0, 0)
    assert got[0].dup_frac == pytest.approx(0.6)
    assert got[4].dup_frac == 0.0


def test_dsir_weights_rank_target_like_docs_higher(spark):
    rows = [(i, "alpha beta gamma delta") for i in range(8)] + [
        (8, "alpha beta gamma delta"),   # pool doc identical to target
        (9, "omega sigma tau upsilon"),  # pool doc unlike target
        (10, ""),                         # featureless
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.where("doc_id < 8")
    got = {r.doc_id: r for r in dsir_weights(df, target).collect()}
    assert got[8].dsir_logratio > got[9].dsir_logratio
    assert got[10].n_feats == 0 and got[10].dsir_logratio == 0.0
    # exact reference: unigram+bigram features, md5-prefix buckets
    import hashlib

    def buckets(text):
        w = _tokens(text)
        feats = w + [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        return [
            hashlib.md5(g.encode()).hexdigest()[:DSIR_BUCKET_HEX]
            for g in feats
        ]

    B = 16 ** DSIR_BUCKET_HEX
    from collections import Counter

    tc = Counter(b for i, t in rows if i < 8 for b in buckets(t))
    rc = Counter(b for _, t in rows for b in buckets(t))
    tt, rt = sum(tc.values()), sum(rc.values())
    for doc_id, text in rows:
        bs = buckets(text)
        if not bs:
            continue
        s = sum(
            math.log((tc[b] + 1) / (tt + B)) - math.log((rc[b] + 1) / (rt + B))
            for b in bs
        )
        assert got[doc_id].dsir_logratio == pytest.approx(
            s / len(bs), abs=1e-5
        ), doc_id
