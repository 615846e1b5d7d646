"""profile_table: single-pass per-column stats vs DuckDB-computed truth."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pysparkline.operators import profile

SF = "/root/testdata/sf0.001"


def test_profile_exact_matches_duckdb(spark, duck):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {
        r.column: r.asDict()
        for r in profile.profile_table(
            df,
            ["l_orderkey", "l_returnflag", "l_shipdate", "l_quantity"],
            exact_ndv=True,
        ).collect()
    }
    for c in got:
        w = duck.execute(
            f"SELECT COUNT(*), COUNT({c}), COUNT(DISTINCT {c}),"
            f" CAST(MIN({c}) AS VARCHAR), CAST(MAX({c}) AS VARCHAR)"
            f" FROM lineitem"
        ).fetchone()
        g = got[c]
        assert g["n_rows"] == w[0]
        assert g["n_nulls"] == w[0] - w[1]
        assert g["n_distinct"] == w[2]
        assert g["min_value"] == w[3]
        assert g["max_value"] == w[4]


def test_profile_nulls_and_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "k long, v string"
    ).withColumn("allnull", F.lit(None).cast("double"))
    got = {r.column: r for r in profile.profile_table(df).collect()}
    assert got["v"].n_nulls == 2 and got["v"].n_distinct == 1
    assert got["allnull"].n_nulls == 3 and got["allnull"].n_distinct == 0
    assert got["allnull"].min_value is None
    assert got["k"].dtype == "bigint" and got["k"].min_value == "1"


def test_profile_approx_ndv_within_rsd(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {
        r.column: r
        for r in profile.profile_table(
            df, ["l_orderkey", "l_partkey"], exact_ndv=False, rsd=0.05
        ).collect()
    }
    exact = {
        r.column: r
        for r in profile.profile_table(
            df, ["l_orderkey", "l_partkey"], exact_ndv=True
        ).collect()
    }
    for c in got:
        e, a = exact[c].n_distinct, got[c].n_distinct
        assert abs(a - e) / e < 0.15  # 3x the 5% rsd as margin


def test_profile_is_single_job_single_scan(spark):
    """The plan holds ONE aggregate over one scan — no per-column scans."""
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = profile.profile_table(
        df, ["l_orderkey", "l_returnflag"], exact_ndv=False
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2  # 1 scan node (string may appear twice in one node)
