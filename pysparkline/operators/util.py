"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the fleet before a CPU-bound Python/Arrow
    stage (decode, hashing, matmul): a corpus read from one or two parquet
    files would otherwise run the stage on one or two cores. No-op when the
    input is already at least as wide as the default parallelism — wide
    production inputs never pay the shuffle."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
