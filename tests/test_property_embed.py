"""Property tests for embedding-compression operators (hypothesis).

Scaled by PYSPARKLINE_FUZZ_SCALE like the other property suites.
"""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pysparkline.operators import embed, similarity

_FUZZ_SCALE = int(os.environ.get("PYSPARKLINE_FUZZ_SCALE", "1"))

# finite float32-representable components, including exact zeros and
# near-zero tinies. Built from INTEGER draws: this container's Python
# rejects hypothesis' st.floats outright (hypothesis detects the
# interpreter cannot represent -0.0 — unsafe-math build), so floats are
# derived as int * scale, which also guarantees exact float32 values.
# both branches are power-of-two scaled so every drawn value is EXACTLY
# float32-representable (n needs <= 20 significand bits): the double
# arithmetic this test recomputes then matches Spark's float32->double
# cast bit-for-bit. (n * 1e-10 was NOT float32-exact — the cast shifted
# values across int8 code boundaries; review r7b #2.)
component = st.one_of(
    st.just(0.0),
    st.integers(-10**6, 10**6).map(lambda n: float(n) / 1024.0),
    st.integers(-100, 100).map(lambda n: float(n) * 2.0**-40),
)


@st.composite
def corpora(draw):
    dim = draw(st.integers(1, 70))
    n = draw(st.integers(1, 8))
    return [
        (i, draw(st.lists(component, min_size=dim, max_size=dim)))
        for i in range(n)
    ]


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=corpora())
def test_quantize_roundtrip_and_pack_invariants(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r
        for r in embed.dequantize_int8(
            embed.quantize_int8(df), out_col="recon"
        ).collect()
    }
    bits = {r.vec_id: r.bits for r in embed.quantize_1bit(df).collect()}
    for vid, vec in rows:
        r = got[vid]
        amax = max((abs(float(x)) for x in vec), default=0.0)
        # scale definition + code range + reconstruction bound
        assert math.isclose(r.scale, amax / 127.0, rel_tol=1e-7)
        assert all(abs(c) <= 127 for c in r.codes)
        for x, c, rx in zip(vec, r.codes, r.recon):
            # scale/2 is the round-half-up quantization bound; the extra
            # term is the FLOAT32 representation of the reconstruction
            # (array<float> output): ulp(recon) <= 2^-23 * amax. A scale-6
            # fuzz drew x = amax/2 exactly — error lands ON scale/2 and the
            # f32 cast pushed it ~1.2e-9 past the old 1e-9*amax slack.
            assert abs(float(rx) - float(x)) <= r.scale / 2 + 1.2e-7 * amax
            if r.scale > 0:
                assert c == math.floor(float(x) / r.scale + 0.5)
            else:
                assert c == 0
        # 1-bit packing: word count and per-bit sign equality
        words = bits[vid]
        assert len(words) == (len(vec) + 63) // 64
        for i, x in enumerate(vec):
            bit = (words[i // 64] >> (i % 64)) & 1
            assert bit == (1 if float(x) > 0 else 0), (vid, i)
        # trailing pad bits are zero
        if len(vec) % 64 and words:
            tail = words[-1] >> (len(vec) % 64)
            assert tail & ((1 << (64 - len(vec) % 64)) - 1) == 0


@settings(
    max_examples=8 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=corpora(), data=st.data())
def test_funnel_full_shortlist_equals_exact(spark, rows, data):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    dim = len(rows[0][1])
    sub = data.draw(st.integers(1, dim))
    q = df.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_cosine_topk(df, q, k=3, round_to=6)
    funnel = embed.matryoshka_funnel_topk(
        df, q, k=3, dim=sub, shortlist=len(rows), round_to=6
    )
    ka = sorted(map(tuple, exact.collect()))
    kb = sorted(map(tuple, funnel.collect()))
    assert ka == kb


def test_quantize_exact_half_step_regression(spark):
    """The scale-6 fuzz counterexample pinned deterministically: a vector
    whose component is EXACTLY amax/2 sits on the round-half-up boundary
    (x/scale = 63.5 -> code 64); reconstruction error equals scale/2 plus
    the float32 cast of the recon — within the f32-ulp-aware bound."""
    import math

    from pysparkline.operators import embed

    df = spark.createDataFrame(
        [(0, [0.0439453125, 0.087890625])],
        "vec_id long, embedding array<float>",
    )
    r = embed.dequantize_int8(
        embed.quantize_int8(df), out_col="recon"
    ).collect()[0]
    amax = 0.087890625
    assert math.isclose(r.scale, amax / 127.0, rel_tol=1e-7)
    assert r.codes == [64, 127]  # exact half rounds UP (floor(x/s + 0.5))
    for x, rx in zip([0.0439453125, amax], r.recon):
        assert abs(float(rx) - float(x)) <= r.scale / 2 + 1.2e-7 * amax
