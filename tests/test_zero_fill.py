"""Druid timeseries zero-fill semantics (skipEmptyBuckets=false default):
every bucket of the queried intervals is emitted, empties carry aggregator
identities (count/sum-family -> 0, min/max/avg -> NULL), post-aggs compute
over the filled values. DruidQuerySpec.scala:709-765 timeseries contract.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pysparkline import ir
from pysparkline.lowering import _bucket_floor_py, _zero_fill_names


def test_bucket_floor_py():
    dt = datetime.datetime(2024, 8, 14, 13, 47, 31, 250000)
    f = _bucket_floor_py
    assert f(dt, "year", None) == datetime.datetime(2024, 1, 1)
    assert f(dt, "quarter", None) == datetime.datetime(2024, 7, 1)
    assert f(dt, "month", None) == datetime.datetime(2024, 8, 1)
    assert f(dt, "week", None) == datetime.datetime(2024, 8, 12)  # Monday
    assert f(dt, "day", None) == datetime.datetime(2024, 8, 14)
    assert f(dt, "hour", None) == datetime.datetime(2024, 8, 14, 13)
    assert f(dt, "minute", None) == datetime.datetime(2024, 8, 14, 13, 47)
    # duration + origin: 90-minute buckets anchored at 00:30
    got = f(dt, "duration:5400s", "2024-08-14 00:30:00")
    assert got == datetime.datetime(2024, 8, 14, 12, 30)
    with pytest.raises(ValueError):
        f(dt, "fortnight", None)


def test_zero_fill_names():
    aggs = [
        ir.CountAgg("n"),
        ir.FieldAgg("sum", "s", "v"),
        ir.FieldAgg("min", "mn", "v"),
        ir.AvgAgg("a", "v"),
        ir.ThetaAgg("t", "u"),
        ir.FilteredAgg("fs", ir.SelectorFilter("d", "x"), ir.FieldAgg("sum", "", "v")),
        ir.FilteredAgg("fm", ir.SelectorFilter("d", "x"), ir.FieldAgg("max", "", "v")),
    ]
    assert _zero_fill_names(aggs) == ["n", "s", "t", "fs"]


@pytest.fixture(scope="module")
def sparse(spark):
    # 3 sparse days: rows only on day 1 and day 3
    rows = [
        ("2024-03-01 10:00:00", 5.0),
        ("2024-03-01 11:00:00", 7.0),
        ("2024-03-03 09:30:00", 11.0),
    ]
    return spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )


def _ctx(spark, df, tmp):
    from pysparkline.index import IndexConfig, MetricSpec, OlapIndex
    from pysparkline.session import OlapContext

    cfg = IndexConfig(time_col="ts", metrics=[MetricSpec("v_sum", "v", "sum")])
    idx = OlapIndex.build(spark, df, cfg, str(tmp / "zfidx"))
    return OlapContext(spark, idx, fact_name="zf")


def test_zero_fill_daily(spark, sparse, tmp_path):
    ctx = _ctx(spark, sparse, tmp_path)
    spec = ir.TimeseriesQuery(
        granularity="day",
        intervals=[ir.Interval("2024-03-01", "2024-03-05")],
        aggregations=[
            ir.CountAgg("n"),
            ir.FieldAgg("sum", "sv", "v"),
            ir.FieldAgg("min", "mn", "v"),
        ],
        post_aggregations=[ir.ArithmeticPostAgg("n2", "`n` * 2")],
        zero_fill=True,
        time_output_name="bucket",
    )
    rows = {r["bucket"].day: r for r in ctx.query(spec).collect()}
    assert sorted(rows) == [1, 2, 3, 4]  # 4 buckets, 2 of them empty
    assert rows[1]["n"] == 2 and rows[1]["sv"] == 12.0 and rows[1]["mn"] == 5.0
    assert rows[2]["n"] == 0 and rows[2]["sv"] == 0.0 and rows[2]["mn"] is None
    assert rows[2]["n2"] == 0  # post-agg over filled identity
    assert rows[3]["n"] == 1 and rows[4]["n"] == 0
    # without zero_fill: only the 2 non-empty buckets
    spec2 = ir.TimeseriesQuery(
        granularity="day",
        intervals=[ir.Interval("2024-03-01", "2024-03-05")],
        aggregations=[ir.CountAgg("n")],
        time_output_name="bucket",
    )
    assert len(ctx.query(spec2).collect()) == 2


def test_zero_fill_multi_interval_distinct(spark, sparse, tmp_path):
    ctx = _ctx(spark, sparse, tmp_path)
    spec = ir.TimeseriesQuery(
        granularity="day",
        intervals=[
            ir.Interval("2024-03-01", "2024-03-03"),
            ir.Interval("2024-03-02", "2024-03-04"),  # overlaps day 2
        ],
        aggregations=[ir.CountAgg("n")],
        zero_fill=True,
        time_output_name="bucket",
    )
    out = ctx.query(spec).collect()
    assert [r["bucket"].day for r in out] == [1, 2, 3]  # deduped spine


def test_zero_fill_requires_bounds(spark, sparse, tmp_path):
    ctx = _ctx(spark, sparse, tmp_path)
    spec = ir.TimeseriesQuery(
        granularity="day",
        intervals=[ir.Interval("2024-03-01", None)],
        aggregations=[ir.CountAgg("n")],
        zero_fill=True,
    )
    with pytest.raises(ValueError):
        ctx.query(spec).collect()
