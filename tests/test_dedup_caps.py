"""Bounded-fan-out guarantees of the dedup operators: hot-gram capping,
candidate-then-verify equivalence, and the engine-portable simhash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkline.operators import dedup


@pytest.fixture(scope="module")
def stopgram_corpus(spark):
    """A corpus where one 3-gram ('the same thing') appears in EVERY doc —
    the quadratic-join hazard — plus one true near-dup pair."""
    base = (
        "the same thing appears in every single document here because all"
        " web pages share one boilerplate navigation footer block"
    )
    rows = [(i, f"{base} unique{i} filler{i}") for i in range(60)]
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_max_df_bounds_join(spark, stopgram_corpus):
    """With max_df below the corpus size, stop-grams leave the inverted index:
    the join fans out over rare grams only, and the true near-dup pair (whose
    overlap is in rare grams) still surfaces."""
    out = dedup.ngram_jaccard_pairs(
        stopgram_corpus, "doc_id", "text", n=3, threshold=0.5, max_df=10
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (100, 101) in pairs
    # the boilerplate docs share ONLY capped grams -> no quadratic pair dump
    assert all(a == 100 for a, _ in pairs)


def test_max_df_none_is_exact(spark, stopgram_corpus):
    """Uncapped: the boilerplate docs share most of their grams, so the full
    quadratic pair set appears (why the cap exists)."""
    out = dedup.ngram_jaccard_pairs(
        stopgram_corpus, "doc_id", "text", n=3, threshold=0.5, max_df=None
    ).collect()
    assert len(out) > 1000  # ~60*59/2 boilerplate pairs + the alpha pair


def test_minhash_verify_equals_exact(spark):
    """LSH candidates + exact verify == brute-force exact pairs on a corpus
    with clear near-dups (the oracle identity the entry query relies on)."""
    rows = []
    for i in range(30):
        rows.append((i, f"totally distinct document number {i} with words {i * 7}"))
    # two near-dup clusters
    rows.append((200, "the quick brown fox jumps over the lazy dog again and again"))
    rows.append((201, "the quick brown fox jumps over the lazy dog again and again!"))
    rows.append((300, "pack my box with five dozen liquor jugs right now please ok"))
    rows.append((301, "pack my box with five dozen liquor jugs right now please okay"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    verified = dedup.verify_pairs_exact_jaccard(
        cand, docs, "doc_id", "text", threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in verified.collect()}
    # brute-force exact shingle jaccard
    sh = docs.select(
        "doc_id", dedup.shingle_set_col(F.col("text"), 5).alias("s")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.s", "b.s"))
    uni = F.size("a.s") + F.size("b.s") - inter
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(inter / uni >= 0.5)
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .collect()
    )
    assert got == {(r.x, r.y) for r in brute}
    assert (200, 201) in got and (300, 301) in got


def test_simhash_matches_duckdb(spark, duck):
    """The md5-based 60-bit simhash is bit-identical across engines — the
    portability property the driver oracle depends on."""
    docs = spark.createDataFrame(
        [(1, "hello world foo bar"), (2, "completely different text here"),
         (3, "hello world foo baz")],
        "doc_id long, text string",
    )
    got = {r.id: r.simhash for r in dedup.simhash(docs, "doc_id", "text").collect()}
    bits = dedup.SIMHASH_BITS
    rows = duck.execute(rf"""
WITH t(doc_id, text) AS (VALUES (1, 'hello world foo bar'),
                                (2, 'completely different text here'),
                                (3, 'hello world foo baz')),
toks AS (SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
         FROM t),
hs AS (SELECT doc_id,
       list_transform(t, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hl
       FROM toks)
SELECT doc_id, list_sum(list_transform(range(0, {bits}), b ->
  CASE WHEN list_sum(list_transform(hl, h ->
           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       THEN 1::BIGINT << b ELSE 0::BIGINT END)) AS sh
FROM hs
""").fetchall()
    assert {r[0]: r[1] for r in rows} == got


def test_plan_cache_reuses_dataframe(ctx):
    from pysparkline import ir

    spec = ir.TimeseriesQuery(
        granularity="all", aggregations=[ir.CountAgg("n")]
    )
    d1 = ctx.query(spec)
    d2 = ctx.query(spec)
    assert d1 is d2  # compiled-plan cache hit
    assert ctx.query_history[-1].backing == ctx.query_history[-2].backing
    ctx.clear_cache()
    assert ctx.query(spec) is not d1


def test_cluster_pairs_components(spark):
    """Chain, triangle, and isolated pair resolve to min-id components."""
    from pysparkline.operators import dedup

    pairs = spark.createDataFrame(
        [
            # chain 1-2-3-4 (diameter 3: needs multiple propagation rounds)
            (1, 2), (2, 3), (3, 4),
            # triangle 10-11-12
            (10, 11), (11, 12), (10, 12),
            # isolated pair
            (20, 21),
        ],
        "id_a long, id_b long",
    )
    out = {r.id: r.cluster_id for r in dedup.cluster_pairs(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_cluster_pairs_long_chain_converges(spark):
    from pysparkline.operators import dedup

    n = 12  # diameter > default few rounds; still << max_iter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in dedup.cluster_pairs(pairs).collect()}
    assert out == {i: 0 for i in range(n + 1)}


def test_cluster_pairs_nonconvergence_raises(spark):
    import pytest as _pytest

    from pysparkline.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.cluster_pairs(pairs, max_iter=2)


def test_signature_store_incremental(spark, tmp_path):
    """Incremental dedup against a persisted store: batch 2 dedups against
    batch 1 (no recompute of batch 1) and against its own earlier docs;
    batch 3 then sees batch 2's survivors in the store."""
    from pysparkline.operators.dedup import SignatureStore

    def base(i: int) -> str:
        # genuinely disjoint shingle sets per i (a shared suffix-varied
        # template would make every doc a true near-dup of every other)
        return " ".join(f"w{i}x{j}q{i * 31 + j}" for j in range(40))

    b1 = spark.createDataFrame(
        [(i, base(i)) for i in range(5)], "doc_id long, text string"
    )
    store = SignatureStore.create(
        spark, str(tmp_path / "store"), threshold=0.5
    )
    store.append(b1, "doc_id", "text")

    # batch 2: 10 = dup of 1; 11 fresh; 12 = dup of 11 (internal); 13 fresh
    b2 = spark.createDataFrame(
        [
            (10, base(1)),
            (11, base(100)),
            (12, base(100)),
            (13, base(200)),
        ],
        "doc_id long, text string",
    )
    v2 = {
        r.id: r.kept
        for r in store.dedup_and_append(
            b2, "doc_id", "text", history_docs=b1
        ).collect()
    }
    assert v2 == {10: False, 11: True, 12: False, 13: True}

    # batch 3: dup of batch-2 SURVIVOR 11 must be caught; dup of the dropped
    # 12's text too (11's signature represents that content in the store)
    b3 = spark.createDataFrame(
        [(20, base(100)), (21, base(300))], "doc_id long, text string"
    )
    v3 = {
        r.id: r.kept
        for r in store.dedup_and_append(
            b3, "doc_id", "text",
            history_docs=b1.unionByName(b2.where("doc_id in (11, 13)")),
        ).collect()
    }
    assert v3 == {20: False, 21: True}

    # reload from disk: same store state
    reloaded = SignatureStore.load(spark, store.path)
    v4 = {
        r.id: r.kept
        for r in reloaded.dedup_and_append(
            spark.createDataFrame(
                [(30, base(300))], "doc_id long, text string"
            ),
            "doc_id", "text",
            history_docs=b3.where("doc_id = 21"),
        ).collect()
    }
    assert v4 == {30: False}


def test_signature_store_estimate_path(spark, tmp_path):
    """Without history texts the signature estimate decides — exact dups
    estimate to 1.0 and are still caught."""
    from pysparkline.operators.dedup import SignatureStore

    txt = "the same exact document text repeated across batches " * 3
    store = SignatureStore.create(spark, str(tmp_path / "s2"))
    store.append(
        spark.createDataFrame([(1, txt)], "doc_id long, text string"),
        "doc_id", "text",
    )
    v = {
        r.id: r.kept
        for r in store.dedup_and_append(
            spark.createDataFrame(
                [(2, txt), (3, "completely different content here" * 4)],
                "doc_id long, text string",
            ),
            "doc_id", "text",
        ).collect()
    }
    assert v == {2: False, 3: True}
