"""Reciprocal-rank fusion (search.rrf_fuse)."""

import pytest
from pyspark.sql import functions as F

from pysparkline.operators import search


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_reference_values(spark):
    """Hand-computed: doc in both lists beats single-list docs."""
    a = _ranking(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranking(spark, [(2, 1), (4, 2), (1, 3)])
    out = {r.doc_id: r for r in search.rrf_fuse([a, b], k=4).collect()}
    s = lambda *ranks: round(sum(1.0 / (60 + r) for r in ranks), 9)  # noqa: E731
    assert out[2].rrf_score == s(2, 1) and out[2].n_lists == 2
    assert out[1].rrf_score == s(1, 3) and out[1].n_lists == 2
    assert out[3].rrf_score == s(3) and out[3].n_lists == 1
    assert out[2].rank == 1 and out[1].rank == 2
    # doc3 (rank 3) vs doc4 (rank 2): 1/63 < 1/62 -> doc4 third
    assert out[4].rank == 3 and out[3].rank == 4


def test_rrf_k_cut_and_tie_break(spark):
    a = _ranking(spark, [(10, 1), (20, 2)])
    b = _ranking(spark, [(20, 1), (10, 2)])
    out = search.rrf_fuse([a, b], k=1).collect()
    # identical scores (1/61 + 1/62 both) -> id ascending wins
    assert len(out) == 1 and out[0].doc_id == 10 and out[0].rank == 1


def test_rrf_per_query_partition(spark):
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (1, 2, 1)], "query_id int, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 2, 1), (1, 9, 1)], "query_id int, doc_id long, rank int"
    )
    out = search.rrf_fuse([a, b], k=1, query_col="query_id").collect()
    by_q = {r.query_id: r for r in out}
    assert by_q[0].doc_id == 2  # in both lists for q0
    assert by_q[1].rank == 1 and by_q[1].doc_id in (2, 9)


def test_rrf_three_lists_rounding_stable(spark):
    """3-list sums exercise the association-order rounding guard: the
    score must be identical across partition layouts."""
    import random

    rnd = random.Random(5)
    lists = []
    for _ in range(3):
        docs = list(range(30))
        rnd.shuffle(docs)
        lists.append(
            _ranking(spark, [(d, i + 1) for i, d in enumerate(docs)])
        )
    a = search.rrf_fuse(lists, k=30).collect()
    b = search.rrf_fuse(
        [df.repartition(7) for df in lists], k=30
    ).collect()
    key = lambda r: (r.rank, r.doc_id)  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r.n_lists for r in a} == {3}
