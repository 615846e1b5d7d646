"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, width: int | None = None) -> DataFrame:
    """Spread a narrow input across the fleet before a CPU-bound Python/Arrow
    stage (decode, hashing, matmul): a corpus read from one or two parquet
    files would otherwise run the stage on one or two cores. No-op when the
    input is already at least as wide as the default parallelism — wide
    production inputs never pay the shuffle.

    Width probe: the caller's hint, else the source file count (a pure
    listing call — at production file sizes maxPartitionBytes makes scan
    partitions track files ~1:1). Never ``df.rdd.getNumPartitions()``, which
    forces a full physical-planning pass per invocation just to read a
    number. Non-file sources (in-memory test frames) report no files and
    repartition — the safe direction for the narrow inputs they are."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if width is None:
        try:
            width = len(df.inputFiles())
        except Exception:
            width = 0
    if width >= par:
        return df
    return df.repartition(par)
