"""Persisted IVF index: build/load roundtrip, search == in-memory ivf_topk
(same corpus/params/seed), and static partition pruning of probed cells."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkline.operators.similarity import IvfIndex, ivf_topk
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def ivf(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    return IvfIndex.build(spark, emb, path, n_clusters=8, seed=42)


def _queries(emb):
    return emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_search_matches_in_memory_ivf(spark, emb, ivf):
    """Same (corpus, n_clusters, seed, n_probe) => identical result sets:
    the persisted index changes where the corpus lives, never the answer."""
    q = _queries(emb)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf.search(q, k=5, n_probe=3).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, q, k=5, n_clusters=8, n_probe=3).collect()
    }
    assert got == want and got


def test_load_roundtrip(spark, ivf):
    loaded = IvfIndex.load(spark, ivf.path)
    assert loaded.centroids == ivf.centroids
    assert loaded.manifest["nClusters"] == 8


def test_probed_partitions_only(spark, emb, ivf):
    """The scan must touch only probed cells' files — the partition-pruning
    contract (PartitionFilters with literal cell ids, no full-corpus read)."""
    from pysparkline.operators.similarity import _nearest_cells_expr

    q = _queries(emb).limit(1)
    cells = {
        r["c"]
        for r in q.select(
            F.explode(
                _nearest_cells_expr(F.col("embedding"), ivf.centroids, 2)
            ).alias("c")
        ).collect()
    }
    # the corpus side search() builds: literal IN over the partition column
    corpus = spark.read.parquet(f"{ivf.path}/cells").where(
        F.col("__cell").isin([int(c) for c in cells])
    )
    files = corpus.select(F.input_file_name().alias("f")).distinct().collect()
    touched = {int(f.f.split("__cell=")[1].split("/")[0]) for f in files}
    assert touched <= cells and len(touched) <= 2  # pruned to probed cells
    plan = corpus._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__cell" in plan
    # and the full search plan keeps the partition filter on its scan
    splan = (
        ivf.search(q, k=3, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in splan and "__cell" in splan


def test_search_self_top1(spark, emb, ivf):
    """Every query's own vector lives in one of its probed cells (its nearest
    cell is probe #1), so rank-1 must be the query itself at cosine ~1."""
    q = _queries(emb)
    top1 = ivf.search(q, k=1, n_probe=1).collect()
    assert top1 and all(r.query_id == r.neighbor_id for r in top1)
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in top1)


# --------------------------------------------------------------- IVF-PQ


@pytest.fixture(scope="module")
def ivfpq(spark, emb, tmp_path_factory):
    from pysparkline.operators.similarity import IvfPqIndex

    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    return IvfPqIndex.build(
        spark, emb, path, n_clusters=8, m_subspaces=8, n_codes=64, seed=42
    )


def test_ivfpq_recall_vs_brute_force(spark, emb, ivfpq):
    """IVF-PQ search (probed-cell pruning -> ADC shortlist -> exact
    re-rank) against ground truth: per-query recall@5 vs the exact
    brute-force top-5. (vs the plain-IVF result only rank swaps from the
    6 dp rounding grid and union-of-probed-cells candidates appear — both
    documented semantics, so the assertion anchors on ground truth.)"""
    from pysparkline.operators.similarity import brute_force_cosine_topk

    q = _queries(emb)
    got: dict = {}
    for r in ivfpq.search(q, k=5, n_probe=3).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    want: dict = {}
    for r in brute_force_cosine_topk(emb, q, k=5, round_to=6).collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert got
    for qid, ids in want.items():
        assert len(got.get(qid, set()) & ids) / len(ids) >= 0.6, qid


def test_ivfpq_load_roundtrip(spark, ivfpq):
    from pysparkline.operators.similarity import IvfPqIndex

    loaded = IvfPqIndex.load(spark, ivfpq.path)
    assert loaded.centroids == ivfpq.centroids
    assert len(loaded.codebooks) == 8


def test_ivfpq_adc_scan_is_column_and_partition_pruned(spark, emb, ivfpq):
    """The ADC scan must read only (neighbor_id, __codes) — NOT the float
    vectors — and only the probed cells' partitions: the two pruning
    mechanisms that make the compressed scan ~32x narrower than the corpus."""
    q = _queries(emb).limit(2)
    plan = ivfpq.search(q, k=3, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.split("\n") if "Scan parquet" in l or "ReadSchema" in l or "PartitionFilters" in l]
    txt = "\n".join(scans)
    # at least one scan reads codes without the vector column
    assert "__codes" in txt
    import re
    code_scan = [s for s in txt.split("Scan parquet") if "__codes" in s and "__cv" not in s]
    assert code_scan, f"no column-pruned code scan in:\n{txt}"
    assert "PartitionFilters" in txt and "__cell" in txt


# ---------------------------------------------------------------------------
# incremental append / compaction (round 6)
# ---------------------------------------------------------------------------


def _exact_probed_topk(emb_pdf, centroids, queries, k, n_probe):
    """numpy reference: assign every corpus vector to its nearest centroid,
    probe n_probe cells per query, exact cosine top-k within them."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    X = np.vstack(emb_pdf["embedding"].to_numpy())
    ids = emb_pdf["vec_id"].to_numpy()
    cell = np.argmin(
        c2[None, :] - 2.0 * (X @ C.T), axis=1
    )
    out = {}
    for qid, qv in queries:
        qv = np.asarray(qv, dtype=np.float64)
        probed = np.argsort(
            c2 - 2.0 * (C @ qv), kind="stable"
        )[:n_probe]
        mask = np.isin(cell, probed)
        sims = (X[mask] @ qv) / (
            np.linalg.norm(X[mask], axis=1) * np.linalg.norm(qv)
        )
        order = np.lexsort((ids[mask], -sims))[:k]
        out[qid] = [int(i) for i in ids[mask][order]]
    return out


def test_append_matches_exact_probed_topk(spark, emb, tmp_path):
    """build(first half) + append(second half): search == exact numpy
    cosine top-k within the probed cells over the UNION — appended vectors
    are first-class citizens of their cells."""
    path = str(tmp_path / "idx_app")
    first = emb.where(F.col("vec_id") % 2 == 0)
    second = emb.where(F.col("vec_id") % 2 == 1)
    idx = IvfIndex.build(spark, first, path, n_clusters=8, seed=42)
    idx.append(second)
    q = _queries(emb)
    got = {}
    for r in idx.search(q, k=5, n_probe=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    got = {k_: [n for _, n in sorted(v)] for k_, v in got.items()}
    qrows = [(r.query_id, r.embedding) for r in q.collect()]
    want = _exact_probed_topk(
        emb.toPandas(), idx.centroids, qrows, 5, 3
    )
    assert got == want and got


def test_append_uncommitted_batch_invisible(spark, emb, tmp_path):
    """A batch directory without a manifest commit (the crash window) is
    never read: search results match the pre-append index exactly."""
    import os
    import shutil

    path = str(tmp_path / "idx_crash")
    idx = IvfIndex.build(spark, emb, path, n_clusters=8, seed=42)
    q = _queries(emb)
    before = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in idx.search(q, k=5, n_probe=3).collect()
    }
    # simulate a crash mid-append: data landed, manifest rewrite never ran
    shutil.copytree(
        os.path.join(path, "cells"), os.path.join(path, "cells_b1")
    )
    reloaded = IvfIndex.load(spark, path)
    after = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in reloaded.search(q, k=5, n_probe=3).collect()
    }
    assert after == before


def test_compaction_equivalence(spark, emb, tmp_path):
    """compact() folds batches into one directory: identical results,
    old directories deleted, one committed batch left."""
    import os

    path = str(tmp_path / "idx_cmp")
    idx = IvfIndex.build(
        spark, emb.where(F.col("vec_id") % 2 == 0), path,
        n_clusters=8, seed=42,
    )
    idx.append(emb.where(F.col("vec_id") % 2 == 1))
    q = _queries(emb)
    before = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in idx.search(q, k=5, n_probe=3).collect()
    }
    olds = list(idx._batch_dirs())
    new = idx.compact()
    after = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in idx.search(q, k=5, n_probe=3).collect()
    }
    assert after == before
    assert idx._batch_dirs() == [new]
    for b in olds:
        assert not os.path.exists(os.path.join(path, b))
    # totals preserved
    total = idx.cell_counts().agg(F.sum("n")).collect()[0][0]
    assert total == emb.count()


def test_append_empty_batch_is_not_committed(spark, emb, tmp_path):
    """A zero-row append must NOT commit (the partitioned write leaves a
    directory with no parquet files — committing it would poison every
    later read); the index stays fully usable (round-6 review)."""
    path = str(tmp_path / "idx_empty")
    idx = IvfIndex.build(spark, emb, path, n_clusters=8, seed=42)
    before = list(idx._batch_dirs())
    assert idx.append(emb.where(F.lit(False))) is None
    assert idx._batch_dirs() == before
    q = _queries(emb)
    assert idx.search(q, k=3, n_probe=2).count() > 0
    reloaded = IvfIndex.load(spark, path)
    assert reloaded._batch_dirs() == before


def test_compact_sweeps_crashed_append_orphan(spark, emb, tmp_path):
    """compact() removes uncommitted cells_b* directories left by crashed
    appends, not only the merged-away batches (round-6 review: the sweep
    previously skipped orphans)."""
    import os
    import shutil

    path = str(tmp_path / "idx_sweep")
    idx = IvfIndex.build(
        spark, emb.where(F.col("vec_id") % 2 == 0), path,
        n_clusters=8, seed=42,
    )
    idx.append(emb.where(F.col("vec_id") % 2 == 1))
    shutil.copytree(
        os.path.join(path, "cells"), os.path.join(path, "cells_b77")
    )  # orphan: never committed
    new = idx.compact()
    dirs = {
        d for d in os.listdir(path)
        if d == "cells" or d.startswith("cells_b")
    }
    assert dirs == {new}
