"""Event-stream batch operators: sessionization and windowed analytics.

Sessionization is the classic gap-based algorithm as two window passes over
one shuffle (partitionBy user): flag rows whose gap from the previous event
exceeds the timeout, then a running sum of flags numbers the sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Adds ``session_seq`` (1-based per user) to every event row."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # integer-microsecond gap: exact, engine-portable boundary comparison
    gap_us = F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > int(gap_minutes * 60 * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new", new_session).withColumn(
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """One row per session: event count, span seconds, value sum (exact
    decimal)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        # integer micros subtraction, then one division: bit-identical across
        # engines (double-per-endpoint rounding would not be)
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1000000.0)
        ).alias("span_seconds"),
        F.sum(F.expr("CAST(value AS DECIMAL(12,2))")).alias("value_sum"),
    )


def running_totals(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running event count and running value sum ordered by time —
    the window-function surface the reference never rewrote (SURVEY §2
    'notably absent') but Spark provides natively."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        F.col(user_col),
        F.col(ts_col),
        F.count(F.lit(1)).over(w).alias("running_events"),
        F.sum(F.expr(f"CAST({value_col} AS DECIMAL(12,2))")).over(w).alias(
            "running_value"
        ),
    )
