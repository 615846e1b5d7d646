"""Event-stream batch operators: sessionization and windowed analytics.

Sessionization is the classic gap-based algorithm as two window passes over
one shuffle (partitionBy user): flag rows whose gap from the previous event
exceeds the timeout, then a running sum of flags numbers the sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .util import pinned_shuffle


def _epoch_us(c) -> Column:
    """Exact integer epoch-microseconds of a timestamp column.

    Accepts both TIMESTAMP and TIMESTAMP_NTZ (parquet `timestamp[us]` without
    UTC adjustment loads as NTZ, which `unix_micros` rejects). The cast to
    TIMESTAMP interprets NTZ wall-clock in the session timezone; the engine
    pins that to UTC (session.prep), so the mapping is deterministic and
    matches DuckDB's naive-timestamp epoch.
    """
    c = c if isinstance(c, Column) else F.col(c)
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Adds ``session_seq`` (1-based per user) to every event row."""
    # event rows are byte-tiny; AQE coalesces the window's exchange to 1-2
    # tasks, serializing both window passes (pinned_shuffle doc). The pin
    # replaces the ENSURE_REQUIREMENTS exchange — no extra shuffle.
    df = pinned_shuffle(df, user_col)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # integer-microsecond gap: exact, engine-portable boundary comparison
    gap_us = _epoch_us(ts_col) - F.lag(_epoch_us(ts_col)).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > round(gap_minutes * 60 * 1_000_000)), F.lit(1)
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
    value_col: str = "value",
) -> DataFrame:
    """One row per session: event count, span seconds, value sum (exact
    decimal)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        # integer micros subtraction, then one division: bit-identical across
        # engines (double-per-endpoint rounding would not be)
        (
            (_epoch_us(F.max(ts_col)) - _epoch_us(F.min(ts_col)))
            / F.lit(1000000.0)
        ).alias("span_seconds"),
        F.sum(F.col(value_col).cast("decimal(12,2)")).alias("value_sum"),
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
    df = pinned_shuffle(df, user_col)  # see sessionize: keeps fleet width
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


def grouped_topn(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group (partitioned TopN — the per-group analog of the
    TopN query shape). One shuffle on the group keys; rank computed in-
    partition; deterministic via tiebreak columns."""
    if "rank" in df.columns:
        raise ValueError(
            "input already has a 'rank' column; rename it before grouped_topn"
        )
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_span: str = "7 days",
) -> DataFrame:
    """Ordered-sequence funnel: per user, the furthest step reached where each
    step strictly follows the previous one, with the whole sequence inside
    ``max_span`` of the first step. Returns (user, steps_completed).

    Semantics note: the span window anchors at the user's EARLIEST step-0
    event (first-touch attribution). A user whose only completed sequence
    starts at a later step-0 occurrence counts as incomplete — the
    any-qualifying-window variant needs per-occurrence state and is out of
    scope here.

    Scale shape: one shuffle on user_col; per-user state is the min timestamp
    of each step-so-far (a running min over an ordered window is unnecessary —
    a conditional min aggregate per step suffices, computed iteratively with
    earlier steps' mins as the lower bound). No cross join, no explode.
    """
    u, t, e = F.col(user_col), F.col(ts_col), F.col(type_col)
    # min timestamp of step 0 per user; then min timestamp of step i AFTER
    # step i-1's chosen time — expressible as chained conditional aggregates
    # over one grouped pass per step (steps are few; each pass is a map-side
    # combinable min on the same user partitioning, reused by Catalyst)
    base = events.select(u.alias("user"), t.alias("ts"), e.alias("et"))
    per_user = base.groupBy("user").agg(
        F.min(F.when(F.col("et") == steps[0], F.col("ts"))).alias("t0")
    )
    joined = base.join(per_user, "user")
    for i, step in enumerate(steps[1:], start=1):
        prev = f"t{i - 1}"
        agg = joined.groupBy("user").agg(
            F.min(
                F.when(
                    (F.col("et") == step)
                    & (F.col("ts") > F.col(prev))
                    & (F.col("ts") <= F.col("t0") + F.expr(f"INTERVAL {max_span}")),
                    F.col("ts"),
                )
            ).alias(f"t{i}")
        )
        per_user = per_user.join(agg, "user")
        joined = base.join(per_user, "user")
    # steps_completed = longest prefix of steps with non-null times
    out = per_user
    completed = F.lit(0)
    for i in reversed(range(len(steps))):
        cond = None
        for j in range(i + 1):
            c = F.col(f"t{j}").isNotNull()
            cond = c if cond is None else (cond & c)
        completed = F.when(cond & (completed == 0), F.lit(i + 1)).otherwise(completed)
    return out.select("user", completed.alias("steps_completed"))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner interval join: rows of ``left`` whose ``left_ts`` falls in a
    ``right`` row's half-open window [right_start, right_end) — with equal
    ``on`` keys when given. The attribution/feature-window shape ("events
    inside each purchase window").

    Spark plans a raw range predicate as a nested-loop/broadcast theta join
    — quadratic per key at scale. Here both sides resolve to time BUCKETS:
    intervals explode to the buckets they cover (one sequence() per row),
    event rows carry their single bucket, and the match is an ordinary
    shuffle EQUI-join on (keys..., bucket) + the exact containment filter.
    Each qualifying pair matches exactly once — in the bucket of left_ts —
    so no dedup pass. Cost scales with rows x ceil(window/bucket): pick
    ``bucket_seconds`` near the typical window length (explode factor
    ~2), never with |left| x |right|.
    """
    us = F.lit(int(bucket_seconds) * 1_000_000)
    lb = F.floor(_epoch_us(F.col(left_ts)) / us).cast("long")
    lo = F.floor(_epoch_us(F.col(right_start)) / us).cast("long")
    hi = F.floor((_epoch_us(F.col(right_end)) - 1) / us).cast("long")
    exploded = right.where(
        F.col(right_start) < F.col(right_end)
    ).withColumn("__bucket", F.explode(F.sequence(lo, hi)))
    keys = list(on or []) + ["__bucket"]
    return (
        left.withColumn("__bucket", lb)
        .join(exploded, keys)
        .where(
            (F.col(right_start) <= F.col(left_ts))
            & (F.col(left_ts) < F.col(right_end))
        )
        .drop("__bucket")
    )
