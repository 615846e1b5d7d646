"""Salting never changes answers — only physical placement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkline.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key (the AQE-resistant hot-key shape)."""
    hot = spark.range(0, 9000).select(
        F.lit(7).alias("k"), (F.col("id") % 50).alias("v")
    )
    rest = spark.range(0, 1000).select(
        (F.col("id") % 20).alias("k"), (F.col("id") % 500).alias("v")
    )
    return hot.unionByName(rest)


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(20)], "k long, name string"
    )
    plain = skewed.join(dim, ["k"]).groupBy("k", "name").count()
    salted = skew.salted_join(skewed, dim, ["k"], n_salts=8).groupBy(
        "k", "name"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([(7, "hot")], "k long, name string")
    out = skew.salted_join(skewed, dim, ["k"], n_salts=4, how="left")
    rows = out.groupBy("name").count().collect()
    got = {r["name"]: r["count"] for r in rows}
    # k=7: 9000 hot rows + 50 in rest (id % 20 == 7)
    assert got["hot"] == 9050 and got[None] == 950
    # exact row count preserved (left join, unique dim keys)
    assert out.count() == skewed.count()


def test_salted_count_distinct_exact(spark, skewed):
    plain = {
        (r.k,): r.d
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
    }
    salted = {
        (r.k,): r.distinct_v
        for r in skew.salted_count_distinct(skewed, ["k"], "v", 8).collect()
    }
    assert plain == salted


def test_salt_collision_guard(spark, skewed):
    with pytest.raises(ValueError):
        skew.salted_join(
            skewed.withColumn("__salt", F.lit(1)), skewed, ["k"]
        )
