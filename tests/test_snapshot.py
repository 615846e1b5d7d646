"""snapshot_diff + select_token_budget vs DuckDB truth / exact-scale
equivalence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pysparkline.operators import snapshot

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_snapshot_diff_statuses(spark, docs):
    old = docs.select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 11 != 0)  # removals
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        )
    )
    got = {r.id: r.status for r in snapshot.snapshot_diff(old, new).collect()}
    n = old.count()
    for r in old.collect():
        i = r.doc_id
        if i % 11 == 0:
            assert got[i] == "removed"
        elif i % 7 == 0:
            assert got[i] == "changed"
        else:
            assert got[i] == "unchanged"
        if i % 13 == 0:
            assert got[i + 1_000_000] == "added"
    assert len(got) == n + old.where(F.col("doc_id") % 13 == 0).count()


def test_snapshot_diff_null_text(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    got = {r.id: r.status for r in snapshot.snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed"}


def _with_quality(docs):
    return docs.select(
        "doc_id",
        (F.pmod(F.col("doc_id") * 37, F.lit(100))).cast("double").alias("quality"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )


def test_budget_exact_matches_duckdb(spark, docs, duck):
    d = _with_quality(docs)
    total = d.agg(F.sum("n_tokens")).first()[0]
    budget = int(total // 3)
    got = sorted(
        r.doc_id
        for r in snapshot.select_token_budget(d, budget, exact=True).collect()
    )
    want = [
        r[0]
        for r in duck.execute(f"""
            WITH q AS (
              SELECT doc_id, CAST((doc_id * 37) % 100 AS DOUBLE) AS quality,
                     len(string_split_regex(trim(text), '\\s+')) AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, CAST(SUM(n_tokens) OVER (
                ORDER BY quality DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM q
            )
            SELECT doc_id FROM c WHERE cum <= {budget} ORDER BY doc_id
        """).fetchall()
    ]
    assert got == want and got


def test_budget_bucketed_equals_exact(spark, docs):
    d = _with_quality(docs)
    total = d.agg(F.sum("n_tokens")).first()[0]
    for frac, nb in [(3, 16), (2, 4096), (10, 7)]:
        budget = int(total // frac)
        a = {r.doc_id for r in snapshot.select_token_budget(
            d, budget, exact=True).collect()}
        b = {r.doc_id for r in snapshot.select_token_budget(
            d, budget, exact=False, n_buckets=nb).collect()}
        assert a == b


def test_budget_edges(spark):
    d = spark.createDataFrame(
        [(1, 5.0, 10), (2, 9.0, 10), (3, 9.0, 10)],
        "doc_id long, quality double, n_tokens long",
    )
    # budget covers the two quality-9 docs (tie broken by id) only
    got = sorted(r.doc_id for r in snapshot.select_token_budget(d, 20).collect())
    assert got == [2, 3]
    assert snapshot.select_token_budget(d, 5).count() == 0
    assert snapshot.select_token_budget(d.limit(0), 100).count() == 0
    assert snapshot.select_token_budget(
        d.limit(0), 100, exact=False).count() == 0
    # everything fits
    assert snapshot.select_token_budget(d, 1000, exact=False).count() == 3
