"""Planner NDV-feedback loop: observed group counts correct estimator drift.

The NDV-product estimator (planner.estimate_groups) overshoots on correlated
dimensions the FD graph doesn't know about. After a query executes, the
context harvests the actual output row count from the executed plan's SQL
metrics (session._executed_output_rows) and the next planning pass corrects
with it (planner.GroupCountFeedback) — the adaptive analog of the reference's
cost-model inputs (DruidQueryCostModel.scala took static per-segment stats;
we additionally learn from execution).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkline import ir
from pysparkline.index import CubeSpec, IndexConfig, MetricSpec, OlapIndex
from pysparkline.planner import GroupCountFeedback
from pysparkline.session import OlapContext


@pytest.fixture(scope="module")
def corr_ctx(spark, tmp_path_factory):
    """Two perfectly correlated 60-NDV columns: NDV-product estimate 3600,
    actual group count 60."""
    df = spark.range(0, 6000).select(
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
        F.concat(F.lit("a"), (F.col("id") % 60).cast("string")).alias("a"),
        F.concat(F.lit("b"), (F.col("id") % 60).cast("string")).alias("b"),
        (F.col("id") % 97).alias("v"),
    )
    cfg = IndexConfig(
        time_col="ts",
        metrics=[MetricSpec("v_sum", "v", "sum")],
        cubes=[CubeSpec("ab", ("a", "b"), "day")],
    )
    idx = OlapIndex.build(
        spark, df, cfg, str(tmp_path_factory.mktemp("fb") / "idx")
    )
    return OlapContext(spark, idx, fact_name="corr", max_result_cardinality=1000)


def _spec():
    return ir.GroupByQuery(
        dimensions=[ir.DefaultDim("a"), ir.DefaultDim("b")],
        aggregations=[ir.FieldAgg("sum", "s", "v")],
    )


def test_misestimate_replans_on_second_execution(corr_ctx):
    ctx = corr_ctx
    df1 = ctx.query(_spec())
    rec1 = ctx.query_history[-1]
    # cold planning: est 60*60=3600 > cap 1000 -> pre-agg rejected -> flat
    assert rec1.backing == "flat"
    assert rec1.estimated_groups is not None and rec1.estimated_groups > 1000
    assert len(df1.collect()) == 60  # execute: metrics now carry 60 rows

    df2 = ctx.query(_spec())
    rec2 = ctx.query_history[-1]
    # harvest corrected the estimate (exact-signature tier) -> cube chosen
    assert rec1.observed_rows == 60
    assert rec2.backing == "cube"
    assert "feedback" in rec2.decision
    assert sorted(map(tuple, df2.collect())) == sorted(map(tuple, df1.collect()))


def test_plan_cache_not_thrashed_when_estimate_close(corr_ctx):
    """A re-planned query whose estimate now matches observation keeps its
    memoized plan across further executions (no evict-replan loop)."""
    ctx = corr_ctx
    df = ctx.query(_spec())
    df.collect()
    df2 = ctx.query(_spec())  # harvest: obs 60 vs est 60 -> no eviction
    assert df2 is df


def test_drift_tier_applies_to_new_filters():
    """Same dims-key under a DIFFERENT filter gets the median ratio (<1
    clamp: feedback can only shrink an estimate)."""
    fb = GroupCountFeedback()
    q1 = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("a"), ir.DefaultDim("b")],
        aggregations=[ir.CountAgg("n")],
    )
    fb.record(q1, estimated=3600.0, observed=60)
    q2 = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("a"), ir.DefaultDim("b")],
        filter=ir.SelectorFilter("a", "a1"),
        aggregations=[ir.CountAgg("n")],
    )
    est, note = fb.correct(q2, 3600.0)
    assert est == pytest.approx(60.0)
    assert note and "ratio" in note
    # exact tier wins over drift tier
    fb.record(q2, estimated=3600.0, observed=1)
    est2, note2 = fb.correct(q2, 3600.0)
    assert est2 == 1.0 and "exact" in note2


def test_feedback_never_inflates():
    fb = GroupCountFeedback()
    q = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("a")], aggregations=[ir.CountAgg("n")]
    )
    fb.record(q, estimated=10.0, observed=500)  # estimator UNDERSHOT
    q_other = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("a")],
        filter=ir.SelectorFilter("a", "x"),
        aggregations=[ir.CountAgg("n")],
    )
    # drift ratio clamped to 1: a >1 observed/est never scales estimates up
    est, note = fb.correct(q_other, 10.0)
    assert est == 10.0 and note is None
    # but the exact tier still reports the true larger count
    est2, _ = fb.correct(q, 10.0)
    assert est2 == 500.0


def test_drift_tier_excludes_interval_restricted(spark):
    """estimate_groups ignores intervals (full-span time NDV), so an
    interval-restricted query's observed/estimated ratio measures the
    interval's selectivity — it must not deflate full-span estimates."""
    from pysparkline import ir
    from pysparkline.planner import GroupCountFeedback

    fb = GroupCountFeedback()
    restricted = ir.TimeseriesQuery(
        granularity="month",
        aggregations=[ir.CountAgg("n")],
        intervals=[ir.Interval("1996-01-01", "1996-02-01")],
    )
    fb.record(restricted, estimated=84.0, observed=1)
    full = ir.TimeseriesQuery(
        granularity="month", aggregations=[ir.CountAgg("n")]
    )
    est, note = fb.correct(full, 84.0)
    assert est == 84.0 and note is None
    # unrestricted observations still feed the drift tier: a query with a
    # DIFFERENT filter (not in the exact signature) gets the median ratio
    fb.record(full, estimated=84.0, observed=42)
    est2, note2 = fb.correct(
        ir.TimeseriesQuery(
            granularity="month",
            aggregations=[ir.CountAgg("n")],
            filter=ir.SelectorFilter("l_returnflag", "A"),
        ),
        84.0,
    )
    assert est2 == 42.0 and "ratio" in note2


def test_zero_fill_not_feedback_eligible(spark):
    from pysparkline import ir
    from pysparkline.session import OlapContext

    zf = ir.TimeseriesQuery(
        granularity="day", aggregations=[ir.CountAgg("n")], zero_fill=True
    )
    plain = ir.TimeseriesQuery(
        granularity="day", aggregations=[ir.CountAgg("n")]
    )
    assert not OlapContext._feedback_eligible(zf)
    assert OlapContext._feedback_eligible(plain)


def test_feedback_persists_across_sessions(spark, tmp_path):
    """VERDICT r3 #8: with persist_feedback, a misestimate learned in
    session 1 corrects the FIRST plan of a fresh session 2 over the same
    index directory (feedback.json sidecar, atomic write)."""
    import os

    df = spark.range(0, 6000).select(
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
        F.concat(F.lit("a"), (F.col("id") % 60).cast("string")).alias("a"),
        F.concat(F.lit("b"), (F.col("id") % 60).cast("string")).alias("b"),
        (F.col("id") % 97).alias("v"),
    )
    cfg = IndexConfig(
        time_col="ts",
        metrics=[MetricSpec("v_sum", "v", "sum")],
        cubes=[CubeSpec("ab", ("a", "b"), "day")],
    )
    idx = OlapIndex.build(spark, df, cfg, str(tmp_path / "idx"))

    # session 1: misestimate (3600 > cap) -> flat; execute; harvest persists
    s1 = OlapContext(
        spark, idx, fact_name="corr", max_result_cardinality=1000,
        persist_feedback=True,
    )
    s1.query(_spec()).collect()
    s1.query(_spec())  # triggers the harvest (and the sidecar write)
    assert os.path.exists(os.path.join(idx.path, "feedback.json"))

    # session 2: FRESH context over the same index — first plan corrected
    idx2 = OlapIndex.load(spark, idx.path)
    s2 = OlapContext(
        spark, idx2, fact_name="corr", max_result_cardinality=1000,
        persist_feedback=True,
    )
    s2.query(_spec())
    rec = s2.query_history[-1]
    assert rec.backing == "cube", rec.decision
    assert "feedback" in rec.decision

    # default (no persist_feedback): same fresh session stays uncorrected
    s3 = OlapContext(
        spark, OlapIndex.load(spark, idx.path), fact_name="corr",
        max_result_cardinality=1000,
    )
    s3.query(_spec())
    assert s3.query_history[-1].backing == "flat"
