"""Table profiling: per-column statistics in ONE pass over the data —
the ANALYZE TABLE / data-quality-report surface of the engine
(reference analog: Druid's segment metadata queries,
SegmentAnalyzer.java-style column stats, re-expressed as a single Spark
aggregate instead of per-segment metadata merges).

Scale shape: one job, one wide aggregate row (2 + 4*n_columns partial
aggregates, all map-side combined), exploded to n_columns output rows.
NDV is HyperLogLog (``approx_count_distinct``) by default — exact
``count_distinct`` is opt-in for small tables / oracle checks, since an
exact distinct per column is a shuffle per column at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_ndv: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min_value, max_value)
    per profiled column. min/max are rendered as strings so one schema
    covers every column type; NULL for all-null columns."""
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        ndv = (
            F.count_distinct(F.col(c))
            if exact_ndv
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}"),
            ndv.alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_nulls"),
                F.col(f"__ndv_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(entries).alias("p")).select("p.*")
