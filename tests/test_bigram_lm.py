"""Interpolated bigram-LM perplexity (text.bigram_lm /
bigram_perplexity_scores)."""

import math

import pytest
from pyspark.sql import functions as F

from pysparkline.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the mat"),  # duplicate — transitions dominate
        (2, "the dog sat on the mat"),
        (3, "zq xv qqj zzk vvw pq"),  # divergent noise
        (4, "one"),  # single token — no bigram, dropped
        (5, ""),  # empty — dropped
        (6, None),  # null — dropped
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_reference_values(spark, docs):
    """Hand-computed model probabilities on a 3-doc corpus."""
    small = docs.where("doc_id <= 2")
    out = {
        r.doc_id: r
        for r in text.bigram_perplexity_scores(small, "doc_id", "text").collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0].n_bigrams == 5
    # p(cat|the): c2=2, cc(the)=6 (the->cat x2, the->dog, the->mat x3)
    # unigram: N=18 tokens, V=6; p1(cat) = (2+1)/(18+6)
    lam = 0.7
    p_cat_given_the = lam * (2 / 6) + (1.0 - lam) * ((2 + 1) / (18 + 6))
    # first bigram of doc0 is (the, cat); recompute full nll for doc 0
    pairs = [("the", "cat"), ("cat", "sat"), ("sat", "on"), ("on", "the"),
             ("the", "mat")]
    c2 = {("the", "cat"): 2, ("cat", "sat"): 2, ("sat", "on"): 3,
          ("on", "the"): 3, ("the", "mat"): 3, ("the", "dog"): 1,
          ("dog", "sat"): 1}
    cc = {"the": 6, "cat": 2, "sat": 3, "on": 3, "dog": 1}
    c1 = {"the": 6, "cat": 2, "sat": 3, "on": 3, "mat": 3, "dog": 1}
    p1 = {w: (c + 1) / (18 + 6) for w, c in c1.items()}
    nll = -sum(
        math.log(lam * (c2[p] / cc[p[0]]) + (1.0 - lam) * p1[p[1]])
        for p in pairs
    ) / len(pairs)
    assert math.isclose(out[0].nll, round(nll, 6), abs_tol=2e-6)
    assert out[0].nll == out[1].nll  # identical docs score identically
    assert math.isclose(
        lam * (2 / 6) + 0.30000000000000004 * (3 / 24), p_cat_given_the
    )


def test_self_scoring_semantics(spark, docs):
    """Self-scoring = in-corpus typicality: the duplicated template doc
    scores below its one-off variant; short/empty/null docs are dropped.
    NOTE the overfit regime the docstring documents: one-off noise's
    singleton contexts get ML probability ~1, so noise scores LOW here —
    the reference-model path (test below) is the quality filter."""
    out = {
        r.doc_id: r.nll
        for r in text.bigram_perplexity_scores(docs, "doc_id", "text").collect()
    }
    assert out[0] == out[1] < out[2]  # duplicated template < one-off variant
    assert out[3] < out[0]  # the documented singleton-context overfit
    assert 4 not in out and 5 not in out and 6 not in out


def test_external_lm_skips_unknown_bigrams(spark, docs):
    """Scoring a corpus against a model built elsewhere: bigrams absent
    from the model are skipped (inner join), and a doc with NO known
    bigrams disappears — the unigram operator's convention."""
    lm = text.bigram_lm(docs.where("doc_id <= 2"), "text")
    scored = text.bigram_perplexity_scores(
        docs, "doc_id", "text", lm=lm
    ).collect()
    ids = {r.doc_id for r in scored}
    assert 3 not in ids  # pure-noise doc shares no bigram with the model
    known = {r.doc_id: r.n_bigrams for r in scored}
    assert known[0] == 5 and known[2] == 5


def test_lambda_one_is_pure_bigram(spark, docs):
    """lam=1 degenerates to the ML bigram model: a duplicated doc's
    every transition has p = c2/cc with no unigram mixing."""
    small = docs.where("doc_id IN (0, 1)")  # two identical docs
    out = text.bigram_perplexity_scores(
        small, "doc_id", "text", lam=1.0
    ).collect()
    # all transitions occur exactly as often as their context -> p=1 except
    # 'the' which branches (the->cat 2/4, the->mat 2/4)
    expect = -(2 * math.log(0.5) + 3 * math.log(1.0)) / 5
    for r in out:
        assert math.isclose(r.nll, round(expect, 6), abs_tol=2e-6)
