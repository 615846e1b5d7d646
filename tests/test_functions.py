"""datetime compat surface vs DuckDB-computed expectations."""

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (datetime.datetime(1996, 3, 13, 10, 30, 45),),
        (datetime.datetime(2001, 1, 1, 0, 0, 0),),
        (datetime.datetime(1998, 12, 31, 23, 59, 59),),
    ]
    return spark.createDataFrame(rows, "ts timestamp")


def test_extractors(df):
    from pysparkline import functions as dtf

    out = df.select(
        dtf.year_("ts").alias("y"),
        dtf.month_of_year("ts").alias("mo"),
        dtf.day_of_month("ts").alias("d"),
        dtf.day_of_week("ts").alias("dow"),
        dtf.day_of_year("ts").alias("doy"),
        dtf.hour_of_day("ts").alias("h"),
        dtf.minute_of_hour("ts").alias("mi"),
        dtf.second_of_minute("ts").alias("s"),
        dtf.week_of_weekyear("ts").alias("ww"),
        dtf.year_of_century("ts").alias("yc"),
    ).collect()
    r = out[0]
    assert (r.y, r.mo, r.d) == (1996, 3, 13)
    assert r.dow == 3  # 1996-03-13 was a Wednesday; ISO Monday=1
    assert (r.h, r.mi, r.s) == (10, 30, 45)
    assert r.yc == 96
    r2 = out[1]
    assert (r2.y, r2.dow) == (2001, 1)  # 2001-01-01 was a Monday


def test_period_arithmetic(df):
    from pysparkline import functions as dtf

    out = df.select(
        dtf.date_plus("ts", "P1M").alias("plus_m"),
        dtf.date_minus("ts", "P1D").alias("minus_d"),
        dtf.date_plus("ts", "PT12H").alias("plus_h"),
    ).collect()[0]
    assert out.plus_m == datetime.datetime(1996, 4, 13, 10, 30, 45)
    assert out.minus_d == datetime.datetime(1996, 3, 12, 10, 30, 45)
    assert out.plus_h == datetime.datetime(1996, 3, 13, 22, 30, 45)
    with pytest.raises(ValueError):
        dtf.period("1 month")


def test_comparisons(df):
    from pysparkline import functions as dtf

    n = df.where(
        dtf.date_is_before("ts", F.lit("1999-01-01").cast("timestamp"))
    ).count()
    assert n == 2


def test_millis_and_weekyear(df):
    from pysparkline import functions as dtf

    rows = df.select(
        dtf.millis_of_second("ts").alias("ms"),
        dtf.weekyear("ts").alias("wy"),
    ).collect()
    assert rows[0].ms == 0 and rows[0].wy == 1996
    import datetime

    spark = df.sparkSession
    frac = spark.createDataFrame(
        [(datetime.datetime(2020, 1, 1, 0, 0, 1, 456000),)], "ts timestamp"
    )
    assert frac.select(dtf.millis_of_second("ts").alias("ms")).collect()[0].ms == 456


def test_no_python_udf_in_plan(df):
    """Every compat function must stay JVM-side (no BatchEvalPython)."""
    from pysparkline import functions as dtf

    out = df.select(
        dtf.date_plus("ts", "P1Y").alias("a"),
        dtf.day_of_week("ts").alias("b"),
        dtf.weekyear("ts").alias("c"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
