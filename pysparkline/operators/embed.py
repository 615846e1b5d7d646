"""Embedding-column compression operators (array<float>).

At 100 TB the embedding column dominates both storage and ANN index I/O
(a 1024-dim float32 vector is 4 KiB/row — 4 TB per billion rows), so the
standard serving levers are dimension truncation and scalar quantization:

- **Matryoshka truncation** (Kusupati et al. 2022, "Matryoshka
  Representation Learning"): MRL-trained embeddings carry a usable
  representation in every prefix, so keeping the first ``dim`` components
  is a 1-line dim/full-dim storage cut. Truncation happens in the SCAN
  projection (a narrow per-row map) — no shuffle, and Parquet still reads
  the full column; for a persisted 4x cut, write the truncated column
  once and index THAT.
- **Symmetric int8 quantization**: per-vector scale = max|v|/127,
  code_i = round(v_i/scale) — 4x smaller, and the quantized cosine needs
  only INTEGER dot products (the per-vector scales cancel in the cosine,
  so ranking quality degrades only by the rounding itself).
- **1-bit (sign) quantization**: dim/64 packed BIGINT words per vector —
  32x smaller; Hamming distance over packed words approximates angle
  (the SimHash bound with coordinate hyperplanes). The serving pattern is
  Hamming shortlist -> exact re-rank, same shape as ``pq_topk``.

Everything here is pure Column algebra (JVM codegen, no Python in the
hot path) over deterministic formulas, so results are reproducible
across engines — quantization codes are exact integer math and the
driver oracles replay them bit-for-bit in SQL.

No reference analog (the reference's query IR has no vector surface);
this extends the LLM-pipeline family (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pysparkline.operators.similarity import brute_force_cosine_topk

__all__ = [
    "matryoshka",
    "quantize_int8",
    "dequantize_int8",
    "quantize_1bit",
    "hamming64",
    "matryoshka_topk",
    "matryoshka_funnel_topk",
    "quantized_cosine_topk",
    "hamming_topk",
]


def matryoshka(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 16,
    renormalize: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Keep the first ``dim`` components of ``vec_col`` (optionally
    re-normalized to unit length — cosine RANKINGS are identical either
    way because per-vector scalar factors cancel; renormalize when the
    column feeds dot-product-only consumers). Zero vectors stay zero
    (norm floored at 1e-12, matching ``knn_join``'s convention)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    out = out_col or vec_col
    sl = F.slice(F.col(vec_col), 1, dim)
    if renormalize:
        norm = F.sqrt(
            F.aggregate(
                F.transform(sl, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        norm = F.greatest(norm, F.lit(1e-12))
        sl = F.transform(sl, lambda x: (x.cast("double") / norm).cast("float"))
    return df.withColumn(out, sl)


def _abs_max(vec) -> F.Column:
    return F.aggregate(
        F.transform(vec, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    scale_col: str = "scale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max|v|/127``,
    ``code_i = floor(v_i/scale + 0.5)`` in [-127, 127]. The explicit
    floor(x + 0.5) formulation (round-half-UP, not banker's) is chosen
    because it is bit-reproducible across engines — SQL ``round()``
    half-way semantics differ between Spark/DuckDB/Postgres. Zero
    vectors quantize to all-zero codes with scale 0 (dequantization
    maps them back to exact zeros)."""
    amax = _abs_max(F.col(vec_col))
    scale = (amax / F.lit(127.0)).alias(scale_col)
    df = df.withColumn(scale_col, scale)
    code = lambda x: F.when(  # noqa: E731
        F.col(scale_col) > 0,
        F.floor(x.cast("double") / F.col(scale_col) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("int")
    return df.withColumn(codes_col, F.transform(F.col(vec_col), code))


def dequantize_int8(
    df: DataFrame,
    codes_col: str = "codes",
    scale_col: str = "scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_int8` up to rounding:
    ``v_i ~= code_i * scale`` (float32 output — the storage type the
    original column had)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(codes_col),
            lambda c: (c.cast("double") * F.col(scale_col)).cast("float"),
        ),
    )


def quantize_1bit(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "bits",
) -> DataFrame:
    """Pack sign bits (v_i > 0) into BIGINT words, 64 components per word
    (dim/64 words per vector — a 32x storage cut for float32). Bit i of
    word w holds component 64*w + i; trailing components of a partial
    final word are zero. OR-composed via shiftleft — no arithmetic
    overflow even for bit 63 (ANSI mode would throw on SUM(2^63))."""
    vec = F.col(vec_col)
    n_words = F.ceil(F.size(vec) / F.lit(64)).cast("int")
    # F.sequence(0, n-1) runs DESCENDING for n=0 (default step -1 when
    # start > stop), which would fabricate two garbage words for an empty
    # vector — guard empty to [] and NULL to NULL explicitly
    idx = (
        F.when(vec.isNull(), F.lit(None).cast("array<int>"))
        .when(n_words <= 0, F.array().cast("array<int>"))
        .otherwise(F.sequence(F.lit(0), n_words - 1))
    )
    word = lambda w: F.aggregate(  # noqa: E731
        F.zip_with(
            F.slice(vec, w * 64 + 1, 64),
            F.sequence(F.lit(0), F.least(F.size(vec) - w * 64, F.lit(64)) - 1),
            lambda x, i: F.when(
                x.cast("double") > 0,
                # F.shiftleft only takes a literal bit count; the SQL
                # function accepts an expression
                F.call_function("shiftleft", F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b),
    )
    return df.withColumn(out_col, F.transform(idx, word))


def hamming64(a, b) -> F.Column:
    """Hamming distance between two equal-length array<bigint> packed-bit
    columns (sum of popcounts of XORed words)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k over the first ``dim`` components of both
    sides — the low-dim pass of an MRL funnel (shortlist at dim, re-rank
    the shortlist at full dimension)."""
    return brute_force_cosine_topk(
        matryoshka(corpus, corpus_vec, dim, renormalize=False),
        matryoshka(queries, query_vec, dim, renormalize=False),
        k,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        query_id=query_id,
        query_vec=query_vec,
        round_to=round_to,
    )


def matryoshka_funnel_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    shortlist: int | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """The full MRL funnel: brute-force cosine over the first ``dim``
    components shortlists ``shortlist`` (default 4*k) candidates per
    query, then the shortlist alone is re-ranked at FULL dimension —
    exact top-k w.r.t. the shortlist. The heavy pass touches dim/D of
    the vector bytes; the full-dim pass reads only shortlist x queries
    rows. Recall depends on how much ranking the prefix preserves
    (MRL-trained embeddings: a lot; per-dim-independent noise: see the
    recall test)."""
    from pyspark.sql import Window

    sl = shortlist or 4 * k
    # round_to applies to the shortlist phase too: the CUT at rank sl must
    # fall on a value both engines agree on, or 1-ULP ties make the
    # shortlist membership itself engine-dependent
    short = matryoshka_topk(
        corpus,
        queries,
        k=sl,
        dim=dim,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        query_id=query_id,
        query_vec=query_vec,
        round_to=round_to,
    ).select("query_id", "neighbor_id")
    cj = short.join(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(corpus_vec).alias("__cv"),
        ),
        "neighbor_id",
    ).join(
        F.broadcast(
            queries.select(
                F.col(query_id).alias("query_id"),
                F.col(query_vec).alias("__qv"),
            )
        ),
        "query_id",
    )
    from pysparkline.operators.similarity import cosine_similarity_col

    cos = cosine_similarity_col(F.col("__cv"), F.col("__qv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    # rank filter directly above the window: keeps Spark's
    # WindowGroupLimit(Partial) below the exchange (per-partition top-k
    # before shuffling) — plan-shape pinned in tests/test_plan_shape.py
    return (
        cj.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors. The
    per-vector scales cancel in the cosine, so this ranks by
    ``cos(code_c, code_q)`` — INTEGER dot products (exact, engine-
    reproducible); only the final normalize is float. The 4x-smaller
    scan is the point at 100 TB; accuracy loss is the int8 rounding
    only (recall vs the float ranking is test-asserted)."""
    qc = quantize_int8(corpus, corpus_vec, codes_col="__codes")
    qq = quantize_int8(queries, query_vec, codes_col="__codes")
    return brute_force_cosine_topk(
        qc.select(F.col(corpus_id), F.col("__codes").alias(corpus_vec)),
        qq.select(F.col(query_id), F.col("__codes").alias(query_vec)),
        k,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        query_id=query_id,
        query_vec=query_vec,
        round_to=round_to,
    )


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    rerank: bool = True,
    shortlist: int | None = None,
) -> DataFrame:
    """1-bit top-k: Hamming shortlist over packed sign bits (32x less
    data scanned; 21x smaller on-disk parquet measured), then exact
    float cosine re-rank of the shortlist (``shortlist`` per query,
    default 4*k) — the binary-MRL serving pattern. ``rerank=False``
    returns the raw Hamming ranking (ties broken by neighbor id).

    Sizing ``shortlist`` (measured, SCALE.md "embedding compression
    probe"): sign bits resolve CLUSTER-level structure but not
    within-cluster order — on a 500k corpus with ~15k-point clusters,
    recall@10 vs the float ranking was 0.11 at shortlist 100, 0.41 at
    1000, and 0.95 at 8000 (~ the cluster mass), still 2.6x faster than
    the float brute force. Set ``shortlist`` to the expected mass of a
    query's neighborhood cluster, not a small multiple of k, for
    clustered (i.e. real) embedding distributions."""
    from pyspark.sql import Window

    sl = shortlist or 4 * k
    bc = quantize_1bit(corpus, corpus_vec, out_col="__bits").select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        "__bits",
    )
    bq = F.broadcast(
        quantize_1bit(queries, query_vec, out_col="__qbits").select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("__qv"),
            "__qbits",
        )
    )
    joined = bc.crossJoin(bq).withColumn(
        "hamming", hamming64(F.col("__bits"), F.col("__qbits"))
    )
    # all vectors must share one dimension (the standard embedding-ops
    # contract); a dimension-mismatched row yields NULL hamming (zip_with
    # pads, popcount of null is null) — asc_nulls_last keeps such rows out
    # of the shortlist instead of ranking them first (Spark default is
    # NULLS FIRST on ASC)
    wh = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    # rank filter directly above the window: keeps Spark's
    # WindowGroupLimit(Partial) below the exchange (per-partition top-k
    # before shuffling) — plan-shape pinned in tests/test_plan_shape.py
    short = joined.withColumn("__hrank", F.row_number().over(wh)).where(
        F.col("__hrank") <= (sl if rerank else k)
    )
    if not rerank:
        return short.select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.col("__hrank").alias("rank"),
        )
    from pysparkline.operators.similarity import cosine_similarity_col

    cos = F.round(cosine_similarity_col(F.col("__cv"), F.col("__qv")), 6)
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        short.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
    )
