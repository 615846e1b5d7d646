"""Corpus snapshot management: diff two corpus versions, and select a
quality-ranked subset under a token budget — the bookkeeping operators of an
iterating training-data pipeline (what changed since the last crawl; which
documents make the cut for this run's budget).

Scale notes:
- ``snapshot_diff`` is ONE full outer join on the id column (the unavoidable
  shuffle) with change detection on content hashes computed as narrow maps.
- ``select_token_budget`` exact mode globally sorts by (quality, id) — fine
  while the candidate set fits a sort (it is the correctness oracle).
  The scale mode finds the quality CUTOFF from a bounded histogram
  (one aggregate over quality buckets, driver-side prefix sum over
  n_buckets rows), keeps everything above the cutoff and orders only the
  single boundary bucket — the full sort never happens; only
  budget-boundary ties shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status, old_hash, new_hash) with status in
    'added' / 'removed' / 'changed' / 'unchanged' — content equality by
    md5(text), NULL-text rows hash to NULL and compare null-safely."""
    o = old.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("old_hash"),
        F.lit(True).alias("__in_old"),  # presence, distinct from NULL text
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("new_hash"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, "id", "full_outer")
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    status = (
        F.when(~in_old & in_new, F.lit("added"))
        .when(in_old & ~in_new, F.lit("removed"))
        .when(F.col("old_hash").eqNullSafe(F.col("new_hash")),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("id", status.alias("status"), "old_hash", "new_hash")


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    exact: bool = True,
    n_buckets: int = 4096,
) -> DataFrame:
    """Keep the highest-quality documents whose cumulative token count stays
    within ``budget`` — the kept set is the PREFIX of the (quality DESC,
    id ASC) ranking whose running token sum is <= budget: deterministic,
    reproducible by an oracle and across re-runs (documents are ranked and
    cut, not bin-packed — the first overflowing document ends the prefix).
    Quality ties cannot straddle buckets (buckets partition quality
    values), so the scale mode is exactly equivalent, not approximate.

    ``exact=True``: one global window over (quality DESC, id ASC) — the
    correctness baseline / oracle twin. ``exact=False``: the 100 TB path —
    a histogram over quality buckets finds the bucket where the budget
    boundary falls (n_buckets-row collect), everything strictly above it is
    kept WITHOUT any global sort, the boundary bucket alone is sorted to
    spend the remaining budget."""
    # Rows with NULL quality or NULL token counts are excluded in BOTH
    # modes (they can neither be ranked nor budgeted deterministically) —
    # keeps exact and scale modes equivalent on dirty data.
    d = (
        df.where(
            F.col(quality_col).isNotNull() & F.col(tokens_col).isNotNull()
        )
        .withColumn("__q", F.col(quality_col).cast("double"))
    )
    if exact:
        w = (
            Window.orderBy(F.col("__q").desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            d.withColumn("__cum", F.sum(F.col(tokens_col)).over(w))
            .where(F.col("__cum") <= budget)
            .drop("__q", "__cum")
        )

    # Scale mode: bucket by quality, find the boundary bucket.
    lo, hi = d.agg(F.min("__q"), F.max("__q")).first()
    if lo is None:
        return df.limit(0)
    span = (hi - lo) or 1.0
    bkt = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("__q") - F.lit(lo)) / F.lit(span) * n_buckets).cast(
            "int"
        ),
    )
    d = d.withColumn("__bkt", bkt)
    hist = {
        r["__bkt"]: r["t"]
        for r in d.groupBy("__bkt")
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    }
    running = 0
    boundary = -1
    for b in range(n_buckets - 1, -1, -1):
        t = hist.get(b) or 0
        if running + t > budget:
            boundary = b
            break
        running += t
    if boundary < 0:
        return d.drop("__q", "__bkt")  # everything fits
    kept_above = d.where(F.col("__bkt") > boundary)
    rem = budget - running
    w = (
        Window.orderBy(F.col("__q").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary_kept = (
        d.where(F.col("__bkt") == boundary)
        .withColumn("__cum", F.sum(F.col(tokens_col)).over(w))
        .where(F.col("__cum") <= rem)
        .drop("__cum")
    )
    return kept_above.unionByName(boundary_kept).drop("__q", "__bkt")
