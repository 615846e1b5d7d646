"""Embedding-compression operators (pysparkline.operators.embed)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pysparkline.operators import embed, similarity

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries_df(emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_quantize_roundtrip_error_bound(spark, emb):
    """|dequant - v| <= scale/2 per component (round-half quantization)."""
    q = embed.quantize_int8(emb)
    dq = embed.dequantize_int8(q, out_col="recon")
    bad = dq.select(
        F.aggregate(
            F.zip_with(
                "recon",
                "embedding",
                lambda r, v: F.abs(r.cast("double") - v.cast("double")),
            ),
            F.lit(0.0),
            lambda a, x: F.greatest(a, x),
        ).alias("maxerr"),
        (F.col("scale") / 2 + F.lit(1e-7)).alias("bound"),
    ).where(F.col("maxerr") > F.col("bound"))
    assert bad.count() == 0


def test_quantize_codes_in_range_and_types(spark, emb):
    q = embed.quantize_int8(emb)
    out = q.select(
        F.aggregate(
            "codes", F.lit(0), lambda a, c: F.greatest(a, F.abs(c))
        ).alias("amax")
    ).agg(F.max("amax")).first()[0]
    assert out <= 127
    assert dict(q.dtypes)["codes"] == "array<int>"
    assert dict(q.dtypes)["scale"] == "double"


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id int, embedding array<float>",
    )
    q = embed.quantize_int8(df)
    rows = {r.vec_id: r for r in embed.dequantize_int8(q, out_col="recon").collect()}
    assert rows[0].scale == 0.0
    assert list(rows[0].codes) == [0, 0, 0]
    assert list(rows[0].recon) == [0.0, 0.0, 0.0]
    assert rows[1].codes[1] in (-127, 127) and abs(rows[1].codes[1]) == 127


def test_matryoshka_truncates_and_renormalizes(spark, emb):
    m = embed.matryoshka(emb, dim=16)
    row = m.select(
        F.size("embedding").alias("n"),
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sq"),
    ).first()
    assert row.n == 16
    assert math.isclose(row.sq, 1.0, rel_tol=1e-5)


def test_matryoshka_rank_invariant_to_renormalize(spark, emb, queries_df):
    """Cosine rankings are identical with/without renormalization (scalar
    factors cancel) — the operator contract the docstring promises."""
    a = embed.matryoshka_topk(emb, queries_df, k=5, dim=16, round_to=6)
    b = similarity.brute_force_cosine_topk(
        embed.matryoshka(emb, dim=16, renormalize=True),
        embed.matryoshka(queries_df, dim=16, renormalize=True),
        k=5,
        round_to=4,  # renorm introduces per-vector float noise; compare coarser
    )
    ka = {(r.query_id, r.rank): r.neighbor_id for r in a.collect()}
    kb = {(r.query_id, r.rank): r.neighbor_id for r in b.collect()}
    agree = sum(ka[k] == kb[k] for k in ka)
    assert agree >= len(ka) - 2  # ties at coarser rounding may swap order


def test_matryoshka_funnel_exact_within_shortlist(spark, emb, queries_df):
    """With shortlist = corpus size, the funnel IS the exact full-dim
    ranking; with a small shortlist it returns k rows per query ranked by
    exact full-dim cosine over the shortlist."""
    full = similarity.brute_force_cosine_topk(emb, queries_df, k=5, round_to=6)
    funnel = embed.matryoshka_funnel_topk(
        emb, queries_df, k=5, dim=16, shortlist=500, round_to=6
    )
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, full.collect()), key=lambda t: (t[0], t[3])) == \
        sorted(map(tuple, funnel.collect()), key=lambda t: (t[0], t[3]))
    small = embed.matryoshka_funnel_topk(
        emb, queries_df, k=5, dim=16, shortlist=20, round_to=6
    ).collect()
    per_q = {}
    for r in small:
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 5 for v in per_q.values())
    for qid, rs in per_q.items():
        assert min(rs, key=lambda r: r.rank).neighbor_id == qid


def test_quantized_topk_recall(spark, emb, queries_df):
    exact = similarity.brute_force_cosine_topk(emb, queries_df, k=5, round_to=6)
    quant = embed.quantized_cosine_topk(emb, queries_df, k=5, round_to=6)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    assert len(e & q) / len(e) >= 0.8  # int8 rounding barely moves cosines


def test_quantize_1bit_packing_matches_sign_count(spark):
    """hamming64 over packed words == direct sign-disagreement count,
    including a dim that is NOT a multiple of 64 (trailing pad bits)."""
    rng = np.random.default_rng(3)
    dim = 70
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    b = embed.quantize_1bit(df).select("vec_id", "bits", "embedding").collect()
    assert all(len(r.bits) == 2 for r in b)
    for x in b:
        for y in b:
            ham = sum(
                bin((wx ^ wy) & 0xFFFFFFFFFFFFFFFF).count("1")
                for wx, wy in zip(x.bits, y.bits)
            )
            direct = sum(
                (vx > 0) != (vy > 0)
                for vx, vy in zip(x.embedding, y.embedding)
            )
            assert ham == direct, (x.vec_id, y.vec_id)


def test_quantize_1bit_empty_and_null(spark):
    """F.sequence(0, -1) runs DESCENDING — an empty vector must pack to []
    (not two garbage words) and NULL must stay NULL (review r7 #2)."""
    df = spark.createDataFrame(
        [(0, []), (1, None), (2, [1.0, -1.0])],
        "vec_id int, embedding array<float>",
    )
    rows = {r.vec_id: r.bits for r in embed.quantize_1bit(df).collect()}
    assert list(rows[0]) == []
    assert rows[1] is None
    assert len(rows[2]) == 1 and rows[2][0] == 1


def test_zero_vector_cosine_is_zero_not_nan(spark):
    """cosine_similarity_col floors the norm: a zero vector scores 0.0
    (ranked below any positive cosine), never NaN (which Spark's DESC
    ordering ranks GREATEST) — and brute_force therefore agrees with
    knn_join's numpy kernel on zero-norm rows (review r7 #4)."""
    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [-1.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(9, [1.0, 0.0])], "query_id int, embedding array<float>"
    )
    bf = similarity.brute_force_cosine_topk(corpus, q, k=3, round_to=6)
    got = {r.neighbor_id: r for r in bf.collect()}
    assert got[0].cosine == 0.0 and not got[0].cosine != got[0].cosine
    assert got[1].rank == 1 and got[0].rank == 2 and got[2].rank == 3
    kj = similarity.knn_join(
        corpus, q, k=3, n_cells=2, cache_assignment=False
    )
    kj_rows = {r.neighbor_id: r.rank for r in kj.collect()}
    assert kj_rows == {1: 1, 0: 2, 2: 3}


def test_hamming_topk_self_first_and_k_rows(spark, emb, queries_df):
    ht = embed.hamming_topk(emb, queries_df, k=5)
    rows = ht.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for qid, rs in per_q.items():
        assert len(rs) == 5
        best = min(rs, key=lambda r: r.rank)
        assert best.neighbor_id == qid and best.cosine == 1.0


def test_hamming_raw_ranking_deterministic(spark, emb, queries_df):
    a = embed.hamming_topk(emb, queries_df, k=10, rerank=False).collect()
    b = embed.hamming_topk(
        emb.repartition(7), queries_df, k=10, rerank=False
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
