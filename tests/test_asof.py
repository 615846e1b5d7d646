"""asof_join semantics: NULL keys unmatched, deterministic tie-break,
tolerance — checked against DuckDB's native ASOF LEFT JOIN."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frames(spark):
    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10)),
            (1, T(2024, 1, 1, 12)),
            (2, T(2024, 1, 1, 11)),
            (None, T(2024, 1, 1, 11)),
        ],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9), 100.0),
            (1, T(2024, 1, 1, 11), 200.0),
            (2, T(2024, 1, 1, 12), 300.0),  # after left's 11:00: no match
            (None, T(2024, 1, 1, 9), 999.0),
        ],
        "k long, ts timestamp, v double",
    )
    return left, right


def test_asof_matches_duckdb(spark, frames):
    from pysparkline.operators.asof import asof_join

    left, right = frames
    got = sorted(
        [
            (r.k, r.ts.isoformat(), r.v_right)
            for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
        ],
        key=str,
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    exp = sorted(
        [
            (a, b.isoformat(), c)
            for a, b, c in con.execute(
                "SELECT l.k, l.ts, r.v FROM l ASOF LEFT JOIN r"
                " ON l.k = r.k AND r.ts <= l.ts"
            ).fetchall()
        ],
        key=str,
    )
    assert got == exp
    # the NULL-key left row must be unmatched
    null_rows = [g for g in got if g[0] is None]
    assert null_rows and null_rows[0][2] is None


def test_asof_tie_break_deterministic(spark):
    from pysparkline.operators.asof import asof_join

    T = dt.datetime
    left = spark.createDataFrame([(1, T(2024, 1, 1, 12))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 11), 5.0), (1, T(2024, 1, 1, 11), 7.0)],
        "k long, ts timestamp, v double",
    )
    vals = {
        asof_join(left, right, "k", "ts", "ts", ["v"]).collect()[0].v_right
        for _ in range(3)
    }
    assert vals == {7.0}  # max payload struct wins, every run


def test_interval_join_matches_range_join(spark, duck):
    """Bucketed interval join == DuckDB naive range join, across bucket
    widths (matching must be bucket-width-invariant), incl. boundary
    semantics [start, end)."""
    from pyspark.sql import functions as F

    from pysparkline.operators import events as ev

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("w_end"),
    )
    exp = duck.execute("""
        WITH p AS (SELECT event_id AS pid, user_id, ts AS w_start,
                          ts + INTERVAL 90 MINUTE AS w_end
                   FROM events WHERE event_type = 'purchase')
        SELECT p.pid, e.event_id FROM p JOIN events e
          ON e.user_id = p.user_id AND e.ts >= p.w_start AND e.ts < p.w_end
    """).fetchall()
    exp = {tuple(r) for r in exp}
    for bucket in (600, 3600, 86400):
        got = {
            (r.pid, r.event_id)
            for r in ev.interval_join(
                e, p, "ts", "w_start", "w_end", on=["user_id"],
                bucket_seconds=bucket,
            ).select("pid", "event_id").collect()
        }
        assert got == exp, f"bucket={bucket}"
