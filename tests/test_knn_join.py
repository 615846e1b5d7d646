"""Distributed kNN join: corpus-scale queries, no broadcast/collect of either
side. Exact mode (all cells probed) must equal the brute-force join under the
same total order; the block-salted path must be invariant to max_block."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from pysparkline.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _brute_excl_self(emb, q, k):
    bf = similarity.brute_force_cosine_topk(emb, q, k=k + 1, round_to=6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        bf.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("r2", F.row_number().over(w))
        .where(F.col("r2") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("r2").alias("rank"))
    )


def test_exact_knn_join_equals_brute_force(spark, emb):
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    kj = similarity.knn_join(emb, q, k=5, n_cells=8, exclude_self=True)
    bf = _brute_excl_self(emb, q, 5)
    assert {tuple(r) for r in kj.collect()} == {tuple(r) for r in bf.collect()}


def test_block_salting_is_result_invariant(spark, emb):
    """max_block small enough to force multi-block cells must not change the
    result: per-block top-(k+1) under the global total order is lossless."""
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    big = similarity.knn_join(
        emb, q, k=3, n_cells=4, exclude_self=True, max_block=100_000
    )
    salted = similarity.knn_join(
        emb, q, k=3, n_cells=4, exclude_self=True, max_block=17
    )
    assert {tuple(r) for r in big.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_approximate_probe_subset(spark, emb):
    """n_probe < n_cells: <= k rows per query, every cosine exact for its
    pair, and recall against the exact join is material (not a degenerate
    candidate set)."""
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    ap = similarity.knn_join(
        emb, q, k=5, n_cells=8, n_probe=2, exclude_self=True
    )
    ex = similarity.knn_join(emb, q, k=5, n_cells=8, exclude_self=True)
    a = {(r.query_id, r.neighbor_id) for r in ap.collect()}
    e = {(r.query_id, r.neighbor_id) for r in ex.collect()}
    per_q = {}
    for qid, _ in a:
        per_q[qid] = per_q.get(qid, 0) + 1
    assert all(v <= 5 for v in per_q.values())
    # near-uniform corpus, 2/8 cells probed: measured ~0.66 — bound w/ margin
    assert len(a & e) / len(e) >= 0.4


def test_self_included_when_not_excluded(spark, emb):
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kj = similarity.knn_join(emb, q, k=3, n_cells=4).collect()
    top1 = {r.query_id: (r.neighbor_id, r.cosine) for r in kj if r.rank == 1}
    for qid, (nid, cos) in top1.items():
        assert nid == qid and cos == 1.0


def test_string_ids_and_tiny_corpus(spark):
    """String ids rank by Spark's binary string order in both the kernel and
    the window; corpora smaller than k return all rows."""
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.9, 0.1]),
        ("c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    q = df.select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.knn_join(
        df, q, k=5, n_cells=2, exclude_self=True
    ).collect()
    got = {(r.query_id, r.rank): r.neighbor_id for r in out}
    assert got[("a", 1)] == "b"
    assert len([r for r in out if r.query_id == "a"]) == 2


def test_precomputed_centroids_identical_and_reused(spark, emb):
    """Passing a persisted index's centroids (here: the same fit) yields the
    identical result with zero KMeans work — the IvfIndex composition."""
    from pysparkline.operators.similarity import _fit_centroids

    q = emb.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = _fit_centroids(emb, "embedding", 8, seed=42)
    a = similarity.knn_join(emb, q, k=4, n_cells=8, exclude_self=True)
    b = similarity.knn_join(
        emb, q, k=4, n_cells=8, exclude_self=True, centroids=cents
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_hard_negatives_excludes_dups_and_self(spark, emb):
    """Every anchor gets k most-similar NON-duplicate neighbors: dup pairs
    (both orientations) and self never appear; result equals brute-force
    re-ranking after exclusion."""
    dup = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 400, 10)], "id_a long, id_b long"
    )
    out = similarity.hard_negatives(emb, dup, k=3, n_cells=8)
    rows = out.collect()
    dup_set = {(r.id_a, r.id_b) for r in dup.collect()}
    dup_set |= {(b, a) for a, b in dup_set}
    for r in rows:
        assert r.query_id != r.neighbor_id
        assert (r.query_id, r.neighbor_id) not in dup_set
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())

    # brute-force twin: full pairwise, exclude self+dups, top-3
    bf = similarity.brute_force_cosine_topk(
        emb,
        emb.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=emb.count(),
        round_to=6,
    )
    bf = bf.where(F.col("query_id") != F.col("neighbor_id"))
    excl = spark.createDataFrame(
        [(a, b) for a, b in dup_set], "query_id long, neighbor_id long"
    )
    bf = bf.join(excl, ["query_id", "neighbor_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    want = {
        (r.query_id, r.neighbor_id, r.cosine, r.r2)
        for r in bf.withColumn("r2", F.row_number().over(w))
        .where(F.col("r2") <= 3).collect()
    }
    got = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in rows}
    assert got == want


def test_exact_knn_join_with_duplicate_vectors(spark):
    """Duplicate vectors create exact cosine ties everywhere — the rounded
    (cosine DESC, id ASC) total order must still make block-local top-k
    provably lossless: exact join == brute force on a corpus drawn from
    only 4 distinct vectors."""
    import random

    rng = random.Random(3)
    base = [[1.0, 0.0, 0.0], [0.9, 0.1, 0.0], [0.0, 1.0, 0.0], [0.5, 0.5, 0.5]]
    rows = [(i, base[rng.randrange(4)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.select(F.col("vec_id").alias("query_id"), "embedding")
    kj = similarity.knn_join(
        df, q, k=7, n_cells=3, exclude_self=True, max_block=11
    )
    bf = _brute_excl_self(df, q, 7)
    assert {tuple(r) for r in kj.collect()} == {tuple(r) for r in bf.collect()}


def test_hard_negatives_two_phase_depth(spark, emb):
    """One anchor with many dups must not widen everyone's retrieval: the
    two-phase form still gives every anchor its exact top-k non-dups —
    verified against the single-pass full-depth formulation."""
    # anchor 0 gets 20 dups; everyone else 0-1
    dups = [(0, j) for j in range(1, 21)] + [(30, 31)]
    dup = spark.createDataFrame(dups, "id_a long, id_b long")
    got = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in similarity.hard_negatives(emb, dup, k=3, n_cells=8).collect()
    }
    # independent full-depth single-pass twin
    both = dup.union(dup.select(F.col("id_b").alias("id_a"),
                                F.col("id_a").alias("id_b"))).distinct()
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    cand = similarity.knn_join(emb, q, k=3 + 20, n_cells=8, exclude_self=True)
    kept = cand.join(
        both.select(F.col("id_a").alias("query_id"),
                    F.col("id_b").alias("neighbor_id")),
        ["query_id", "neighbor_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    want = {
        (r.query_id, r.neighbor_id, r.cosine, r.r2)
        for r in kept.withColumn("r2", F.row_number().over(w))
        .where(F.col("r2") <= 3).collect()
    }
    assert got == want


def test_knn_join_cache_assignment_off_identical(spark, emb):
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding")
    a = similarity.knn_join(emb, q, k=4, n_cells=8, exclude_self=True)
    b = similarity.knn_join(emb, q, k=4, n_cells=8, exclude_self=True,
                            cache_assignment=False)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_hard_negatives_zero_survivor_anchor_not_dropped(spark, emb):
    """ADVICE r6 (high): an anchor whose ENTIRE shallow candidate list is
    duplicates (dups are by nature its nearest neighbors — the boilerplate
    cluster case) must still get exactly k rows. The old form derived the
    re-mine set from surviving rows, so a zero-survivor anchor was silently
    omitted; the split is now decided from dup_pairs alone, up front."""
    k = 3
    # make anchor 0's 2k nearest non-self neighbors ALL duplicates: with
    # slack = min(max_dups, k) = k, phase-1 depth is k + k and every
    # candidate anti-joins away
    q0 = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    near = _brute_excl_self(emb, q0, 2 * k).collect()
    dups = [(0, int(r.neighbor_id)) for r in near]
    dup = spark.createDataFrame(dups, "id_a long, id_b long")
    out = similarity.hard_negatives(emb, dup, k=k, n_cells=8)
    rows0 = out.where(F.col("query_id") == 0).collect()
    assert len(rows0) == k, f"anchor 0 dropped/short: {rows0}"
    # and the rows equal the full-depth twin for anchor 0
    deep = _brute_excl_self(emb, q0, 2 * k + k).where(
        ~F.col("neighbor_id").isin([d[1] for d in dups])
    ).collect()
    want = {(r.query_id, r.neighbor_id, r.cosine) for r in deep[:k]}
    assert {(r.query_id, r.neighbor_id, r.cosine) for r in rows0} == want


def test_no_cache_residue_across_loop_calls(spark, emb):
    """VERDICT r6 #5 / ADVICE r6 (low): per-epoch hard-negative loops must
    not accumulate session-lifetime cache residue — knn_join with
    cache_assignment=False and hard_negatives (which now defaults the inner
    joins to False and fits centroids once) leave getPersistentRDDs flat."""
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dup = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    for _ in range(3):
        similarity.knn_join(
            emb, q, k=3, n_cells=8, cache_assignment=False
        ).collect()
        similarity.hard_negatives(emb, dup, k=2, n_cells=8).collect()
    assert jsc.getPersistentRDDs().size() == base


def test_default_cache_retired_across_loop_calls(spark, emb):
    """VERDICT r6 #5: even with the DEFAULT cache_assignment=True, a loop
    holds at most ONE assignment cache — each call retires the prior
    call's — and release_assignment_caches() drops the last one. The
    retired-then-recomputed result stays correct (lineage intact)."""
    jsc = spark.sparkContext._jsc
    similarity.release_assignment_caches()
    base = jsc.getPersistentRDDs().size()
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    results = []
    for _ in range(4):
        out = similarity.knn_join(emb, q, k=3, n_cells=8)
        results.append({tuple(r) for r in out.collect()})
        assert jsc.getPersistentRDDs().size() <= base + 1  # never accumulates
    assert all(r == results[0] for r in results)
    # a PRIOR call's lazy result collected AFTER its cache was retired
    # must still be correct (recomputes through intact lineage)
    stale = similarity.knn_join(emb, q, k=3, n_cells=8)
    similarity.knn_join(emb, q, k=3, n_cells=8).collect()  # retires stale's
    assert {tuple(r) for r in stale.collect()} == results[0]
    similarity.release_assignment_caches()
    assert jsc.getPersistentRDDs().size() == base
