"""Property test for fuzzy_join's actual contract vs brute force.

- NO false positives, ever: every emitted pair is in the brute-force
  exact-Jaccard set with the identical rounded value (the exact verify
  guarantees this deterministically).
- Recall is the BANDING's: probabilistic at mid-range similarities (a
  j=0.74 pair misses 16x4 banding with p ~ 0.3% — a first draft of this
  test asserted full set equality and hypothesis found exactly such a
  miss), but effectively certain at j >= 0.9 (miss p ~ 3e-8), so the
  high-similarity subset is asserted present.
- NULL-text rows never appear.
Scaled by PYSPARKLINE_FUZZ_SCALE.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pysparkline.operators import dedup

_FUZZ_SCALE = int(os.environ.get("PYSPARKLINE_FUZZ_SCALE", "1"))

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


@st.composite
def two_corpora(draw):
    rnd = draw(st.randoms(use_true_random=False))
    n_l = draw(st.integers(3, 12))
    n_r = draw(st.integers(3, 12))

    def doc():
        return " ".join(
            rnd.choice(_WORDS) for _ in range(rnd.randint(6, 14))
        )

    left = [(i, doc()) for i in range(n_l)]
    right = [(i, doc()) for i in range(n_r)]
    # plant near-copies of random left docs into right (1-word mutation)
    for _ in range(draw(st.integers(0, 3))):
        li = rnd.randrange(n_l)
        toks = left[li][1].split()
        toks[rnd.randrange(len(toks))] = rnd.choice(_WORDS)
        ri = rnd.randrange(n_r)
        right[ri] = (right[ri][0], " ".join(toks))
    # occasional NULL text on either side (must be excluded, never match)
    if draw(st.booleans()):
        left.append((900, None))
    if draw(st.booleans()):
        right.append((901, None))
    return left, right


@settings(
    max_examples=10 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(corpora=two_corpora(), data=st.data())
def test_fuzzy_join_equals_brute_force(spark, corpora, data):
    left_rows, right_rows = corpora
    threshold = data.draw(st.sampled_from([0.5, 0.7, 0.8]))
    L = spark.createDataFrame(left_rows, "doc_id long, text string")
    R = spark.createDataFrame(right_rows, "doc_id long, text string")
    got = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup.fuzzy_join(L, R, threshold=threshold).collect()
    }
    # brute force: exact rounded shingle Jaccard over the full cross
    # product, NULL text excluded — the operator's documented contract
    sh = lambda d: d.where(F.col("text").isNotNull()).select(  # noqa: E731
        "doc_id", dedup.shingle_set_col(F.col("text"), 5).alias("s")
    )
    inter = F.size(F.array_intersect("a.s", "b.s"))
    uni = F.size("a.s") + F.size("b.s") - inter
    jac = F.round(inter.cast("double") / uni, 6)
    brute = {
        (r.x, r.y): r.j
        for r in sh(L)
        .alias("a")
        .crossJoin(sh(R).alias("b"))
        .select(
            F.col("a.doc_id").alias("x"),
            F.col("b.doc_id").alias("y"),
            jac.alias("j"),
        )
        .where(F.col("j") >= threshold)
        .collect()
    }
    # exact verify -> no false positives, identical rounded values
    for k, v in got.items():
        assert k in brute and brute[k] == v, (k, v, brute.get(k))
    # banding recall is certain in the high-similarity regime
    for k, v in brute.items():
        if v >= 0.9:
            assert k in got, (k, v)
    assert all(k[0] != 900 and k[1] != 901 for k in got)
