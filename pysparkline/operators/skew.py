"""Skew mitigation: salted join and salted exact count-distinct.

AQE's skew-join handling splits oversized sort-merge partitions at runtime,
which covers most cases; these operators are for the shapes AQE cannot fix:

- ``salted_join``: a shuffle join where ONE key dominates (a null-like
  sentinel, a mega-customer). The big side gets a random salt in [0, n);
  the small side is replicated n times, so the hot key's rows spread over n
  reduce tasks instead of one. Replication multiplies the small side's
  shuffle volume by n — use only when the small side is modest but above
  the broadcast threshold.
- ``salted_count_distinct``: exact COUNT(DISTINCT x) GROUP BY k where one
  group holds most of the data. Stage 1 groups by (k, hash(x) % n) — the
  hot group's distinct-set build spreads over n tasks; buckets partition the
  value space, so per-bucket distinct counts SUM exactly (no overlap).
  This is the same two-shuffle shape Spark plans for distinct aggregates,
  with the expand keyed to spread a single hot group.

Both are deterministic in their results (salting only changes physical
placement, never the answer) — verified against unsalted equivalents in
tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on`` with an n-way salt.

    The join keys shuffle as (on..., __salt): the big side draws a random
    salt per row, the small side is exploded across every salt value, so
    each reduce task sees 1/n of any hot key's rows."""
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("__salt column name collides; rename it first")
    big_s = big.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact distinct count of ``value_col`` per group, hot-group-safe.

    hash-bucket the value space into ``n_salts`` disjoint buckets; distinct
    counts per (group, bucket) sum to the group's exact distinct count."""
    bucket = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts))
    partial = (
        df.groupBy(*group_cols, bucket.alias("__bucket"))
        .agg(F.countDistinct(value_col).alias("__d"))
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__d").alias(f"distinct_{value_col}")
    )
