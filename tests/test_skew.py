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


# ---------------------------------------------------------------------------
# planner-integrated distinct-agg skew guard
# ---------------------------------------------------------------------------


def _distinct_spec(with_avg=False):
    from pysparkline import ir

    aggs = [
        ir.DistinctAgg(name="users", field_name="c_custkey"),
        ir.CountAgg(name="cnt"),
        ir.FieldAgg(name="qty", field_name="l_quantity", fn="sum"),
    ]
    if with_avg:
        aggs.append(ir.AvgAgg(name="avg_qty", field_name="l_quantity"))
    return ir.GroupByQuery(
        dimensions=[ir.DefaultDim(dimension="l_returnflag", output_name="flag")],
        aggregations=aggs,
    )


def test_planner_flags_low_group_distinct(ctx):
    """Few groups + exact distinct -> the planner bucket-spreads the value
    space and the lowered plan carries the __dbucket partial stage."""
    spec, backing, decision = ctx.plan(_distinct_spec())
    assert backing.distinct_buckets > 1
    assert any("skew guard" in n for n in decision.notes)
    from pysparkline import lowering

    plan = lowering.lower(spec, backing)._jdf.queryExecution().toString()
    assert "__dbucket" in plan


def test_two_stage_distinct_matches_one_stage(ctx, duck):
    out = {
        tuple(r): None for r in ctx.query(_distinct_spec(with_avg=True)).collect()
    }
    want = {
        tuple(r): None
        for r in duck.execute(
            """
            SELECT l_returnflag AS flag,
                   COUNT(DISTINCT c_custkey) AS users,
                   COUNT(*) AS cnt,
                   SUM(l_quantity) AS qty,
                   AVG(l_quantity) AS avg_qty
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
            """
        ).fetchall()
    }
    assert out == want


def test_high_group_distinct_not_bucketed(ctx):
    """Plenty of groups -> no guard; the one-stage plan parallelizes fine."""
    from pysparkline import ir

    spec = ir.GroupByQuery(
        dimensions=[ir.DefaultDim(dimension="o_orderkey", output_name="ok")],
        aggregations=[ir.DistinctAgg(name="users", field_name="c_custkey")],
    )
    _, backing, _ = ctx.plan(spec)
    assert backing.distinct_buckets == 1


def test_two_stage_distinct_null_values(spark):
    """NULLs in the distinct column: countDistinct ignores them in both the
    one-stage and bucketed plans (hash(NULL) lands in one bucket, counts 0)."""
    from pysparkline import lowering
    from pysparkline.lowering import Backing
    from pysparkline import ir

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("b", None), ("b", None),
         ("a", 1), ("b", 7)],
        "g string, v int",
    )
    spec = ir.GroupByQuery(
        dimensions=[ir.DefaultDim(dimension="g")],
        aggregations=[ir.DistinctAgg(name="d", field_name="v"),
                      ir.CountAgg(name="n")],
    )
    one = Backing.base(df)
    two = Backing.base(df)
    two.distinct_buckets = 8
    r1 = {r.g: (r.d, r.n) for r in lowering.lower(spec, one).collect()}
    r2 = {r.g: (r.d, r.n) for r in lowering.lower(spec, two).collect()}
    assert r1 == r2 == {"a": (2, 4), "b": (1, 3)}
