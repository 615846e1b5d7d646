"""As-of join: for each left row, the latest right row with
right_ts <= left_ts (optionally within a tolerance), per key.

Spark has no native as-of join. The scalable implementation is the
**union + last_value window** trick:

1. tag left/right rows and union them on (key, ts);
2. one window sorted by (ts, side) per key carries the last non-null right
   payload forward (``last(ignorenulls=True)``);
3. keep left rows, now annotated with the most recent right row at-or-before.

Cost: ONE shuffle on the key (the window partition) — same as a regular join —
instead of the naive range-join explosion. Skewed keys behave like any skewed
window; AQE or salting applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _null_struct(df: DataFrame, cols: list[str]):
    typ = "struct<" + ",".join(
        f"{c}:{df.schema[c].dataType.simpleString()}" for c in cols
    ) + ">"
    return F.lit(None).cast(typ)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left-outer as-of join (DuckDB ``ASOF LEFT JOIN`` semantics): columns of
    ``right`` (``right_cols`` or all non-key/ts columns) are appended to each
    left row from the latest right row with right_ts <= left_ts; nulls when no
    prior right row exists."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        _null_struct(right, right_cols).alias("__right"),
        F.lit(None).cast(right.schema[right_ts].dataType.simpleString()).alias("__rts"),
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        _null_struct(left, list(left.columns)).alias("__left"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__right"),
        F.col(right_ts).alias("__rts"),
    )

    # deterministic tie-break among right rows at equal (key, ts): order by
    # the payload struct itself, so F.last always picks the same row
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__right").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__last_right", F.last("__right", ignorenulls=True).over(w))
        .withColumn("__last_rts", F.last("__rts", ignorenulls=True).over(w))
    )

    # SQL join equality never matches NULL = NULL: left rows with a NULL key
    # must come out unmatched, not annotated from the NULL-key partition
    annotated = annotated.withColumn(
        "__last_right",
        F.when(F.col("__key").isNotNull(), F.col("__last_right")),
    ).withColumn(
        "__last_rts",
        F.when(F.col("__key").isNotNull(), F.col("__last_rts")),
    )

    out = annotated.where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("__ts").cast("double") - F.col("__last_rts").cast("double")
        ) <= F.lit(tolerance_seconds)
        out = out.withColumn("__last_right", F.when(within, F.col("__last_right")))
    return out.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__last_right.{c}").alias(c + suffix) for c in right_cols],
    )
