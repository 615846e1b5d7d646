"""Theta (KMV) sketches: exact-while-not-full semantics, bit-identical
cube/flat evaluation, exact partial merge through append+compaction, set
operations vs ground truth, and the full-sketch estimator error bound.

Reference surface: thetaSketch column type (DruidRelationInfo type map) and
Druid's thetaSketchSetOp post-aggregations, rebuilt Spark-native in
pysparkline/functions/theta.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkline import ir, lowering
from pysparkline.functions import theta as T
from pysparkline.lowering import Backing
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ectx(spark):
    from pysparkline.events_index import build_or_load_events_index
    from pysparkline.session import OlapContext

    return OlapContext(spark, build_or_load_events_index(spark, SF_DIR))


def _spec(k=4096, field="user_id"):
    return ir.GroupByQuery(
        dimensions=[ir.DefaultDim("event_type")],
        aggregations=[ir.ThetaAgg("du", field, k=k)],
    )


# ------------------------------------------------------------------ unit level


def test_exact_below_k_and_null_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, None), (5, "c")], ["id", "v"]
    )
    row = df.agg(
        T.theta_estimate(T.theta_sketch_agg(F.col("v"), 16), 16).alias("e")
    ).collect()[0]
    assert row.e == 3.0  # exact, NULL not counted (approx_count_distinct parity)


def test_merge_equals_rebuild(spark):
    """k smallest of the union == merge of per-part k-smallest — the property
    that makes cube partials exact. Asserted on the raw arrays (bit level)."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 10).alias("g"), (F.col("id") % 997).alias("v")
    )
    k = 64
    parts = df.groupBy("g").agg(T.theta_sketch_agg(F.col("v"), k).alias("sk"))
    merged = parts.agg(T.theta_merge_agg(F.col("sk"), k).alias("sk")).collect()[0].sk
    direct = df.agg(T.theta_sketch_agg(F.col("v"), k).alias("sk")).collect()[0].sk
    assert merged == direct and len(merged) == k


def test_set_ops_exact_vs_ground_truth(spark):
    a_vals = set(range(0, 600))
    b_vals = set(range(400, 900))
    rows = [(x, "a") for x in a_vals] + [(x, "b") for x in b_vals]
    df = spark.createDataFrame(rows, ["v", "side"])
    k = 4096  # not full: every set op is exact
    sk = df.groupBy("side").agg(T.theta_sketch_agg(F.col("v"), k).alias("sk"))
    a = sk.where("side = 'a'").select(F.col("sk").alias("a"))
    b = sk.where("side = 'b'").select(F.col("sk").alias("b"))
    row = a.crossJoin(b).select(
        T.theta_intersect_estimate(F.col("a"), F.col("b"), k).alias("i"),
        T.theta_diff_estimate(F.col("a"), F.col("b"), k).alias("d"),
        T.theta_union_estimate(F.col("a"), F.col("b"), k).alias("u"),
    ).collect()[0]
    assert row.i == len(a_vals & b_vals)
    assert row.d == len(a_vals - b_vals)
    assert row.u == len(a_vals | b_vals)


def test_full_sketch_estimator_error_bound(spark):
    """Estimator branch (theta < 1): k=256 over 50k distincts lands within
    5x the theoretical RSE (1/sqrt(k-2) ~ 6.3%) — deterministic given data."""
    df = spark.range(0, 50_000)
    k = 256
    est = df.agg(
        T.theta_estimate(T.theta_sketch_agg(F.col("id"), k), k).alias("e")
    ).collect()[0].e
    assert abs(est - 50_000) / 50_000 < 0.32


def test_clipped_intersection_estimator(spark):
    """Set ops on FULL sketches: clip to min-theta, scale — the estimate must
    land near the true overlap, and stay consistent when one side is much
    smaller (the small side's theta dominates)."""
    n, overlap = 20_000, 5_000
    a = spark.range(0, n).select(F.col("id").alias("v"), F.lit("a").alias("s"))
    b = spark.range(n - overlap, 2 * n - overlap).select(
        F.col("id").alias("v"), F.lit("b").alias("s")
    )
    k = 512
    sk = a.union(b).groupBy("s").agg(T.theta_sketch_agg(F.col("v"), k).alias("sk"))
    aa = sk.where("s = 'a'").select(F.col("sk").alias("a"))
    bb = sk.where("s = 'b'").select(F.col("sk").alias("b"))
    est = aa.crossJoin(bb).select(
        T.theta_intersect_estimate(F.col("a"), F.col("b"), k).alias("i")
    ).collect()[0].i
    # RSE of clipped intersection ~ sqrt(U/I)/sqrt(k) (union/intersection
    # ratio amplifies); allow a generous deterministic band
    assert abs(est - overlap) / overlap < 0.35


# ------------------------------------------------------------ engine level


def test_cube_and_flat_bit_identical(ectx):
    spec, backing, dec = ectx.plan(_spec())
    assert dec.backing == "cube"
    cube = {r.event_type: r.du for r in ectx.query(_spec()).collect()}
    flat = {
        r.event_type: r.du
        for r in lowering.lower(spec, Backing.flat(ectx.index)).collect()
    }
    assert cube == flat


def test_exact_at_test_scale(ectx):
    got = {r.event_type: r.du for r in ectx.query(_spec()).collect()}
    want = {
        r.event_type: r.x
        for r in ectx.query(
            ir.GroupByQuery(
                dimensions=[ir.DefaultDim("event_type")],
                aggregations=[ir.DistinctAgg("x", "user_id")],
            )
        ).collect()
    }
    assert got == {t: float(v) for t, v in want.items()}


def test_mismatched_k_falls_back_to_flat(ectx):
    """A sketch built at k=4096 cannot serve a k=512 query (different
    retained set) — the planner must fall back, not serve a wrong answer."""
    spec, backing, dec = ectx.plan(_spec(k=512))
    assert dec.backing != "cube"


def test_no_sketch_column_falls_back(ectx):
    spec, backing, dec = ectx.plan(_spec(field="event_id"))
    assert dec.backing != "cube"


def test_theta_survives_append_and_compaction(spark, tmp_path):
    """Streamed-in partials and compaction preserve the sketch: the merged
    cube answer equals row-grain evaluation over ALL rows (exact merge)."""
    from pysparkline.events_index import events_index_config, events_star
    from pysparkline.index import OlapIndex
    from pysparkline.session import OlapContext
    from pysparkline.streaming.ingest import StreamingIngest
    from pysparkline.tpch import read_events

    ev = read_events(spark, SF_DIR)
    cfg = events_index_config()
    split = "2024-01-15"
    idx = OlapIndex.build(
        spark, ev.where(F.col("ts") < split), cfg, str(tmp_path / "idx"),
        star=events_star(),
    )
    ing = StreamingIngest(idx)
    ing.process_batch(ev.where(F.col("ts") >= split), 0)
    ing.compact("types")
    ctx = OlapContext(spark, idx)
    spec, backing, dec = ctx.plan(_spec())
    assert dec.backing == "cube"
    got = {r.event_type: r.du for r in ctx.query(_spec()).collect()}
    want = {
        r.event_type: r.du
        for r in lowering.lower(spec, Backing.base(ev, "ts")).collect()
    }
    assert got == want


def test_filtered_sketch_cube_equals_base(ectx, spark):
    """FilteredAgg(ThetaSketchAgg) — the funnel shape: filtered partial
    merge over the cube must equal a from-raw filtered build."""
    from pysparkline.functions import theta as T
    from pysparkline.tpch import read_events
    from tests.conftest import SF_DIR as _SF

    k = 4096
    spec = ir.GroupByQuery(
        dimensions=[],
        granularity="day",
        time_output_name="day",
        aggregations=[
            ir.FilteredAgg(
                "sk",
                ir.SelectorFilter("event_type", "view"),
                ir.ThetaSketchAgg("sk", "user_id", k=k),
            ),
        ],
        post_aggregations=[
            ir.ArithmeticPostAgg(
                "viewers", f"CAST({T.estimate_sql('sk', k)} AS BIGINT)"
            )
        ],
        output_order=["day", "viewers"],
    )
    planned, backing, dec = ectx.plan(spec)
    assert dec.backing == "cube"
    got = {str(r.day): r.viewers for r in ectx.query(spec).collect()}
    ev = read_events(ectx.spark, _SF)
    want = {
        str(r.day): r.viewers
        for r in lowering.lower(planned, Backing.base(ev, "ts")).collect()
    }
    assert got == want and got


def test_retention_join_is_broadcast(ectx):
    """The day-pair self-join in the retention pattern must broadcast (the
    joined side is ~#days aggregated rows) — never a sort-merge shuffle."""
    from pyspark.sql import functions as F

    k = 4096
    spec = ir.GroupByQuery(
        dimensions=[],
        granularity="day",
        time_output_name="day",
        aggregations=[ir.ThetaSketchAgg("sk", "user_id", k=k)],
    )
    days = ectx.query(spec)
    cur = days.select(F.col("day").cast("date").alias("day"), "sk")
    prv = cur.select(F.date_add("day", 1).alias("day"), F.col("sk").alias("p"))
    joined = cur.join(prv, "day").select(
        "day", T.theta_intersect_estimate(F.col("p"), F.col("sk"), k).alias("r")
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_bounded_raw_build_engages_and_matches(ectx, spark):
    """From-raw theta builds go through the bounded two-stage plan (stage 1
    keyed by spark_partition_id caps the collect_set buffer at
    partition-local NDV) and stay bit-identical to the one-stage answer."""
    from pysparkline.tpch import read_events

    spec, _, _ = ectx.plan(_spec())
    df = lowering.lower(spec, Backing.flat(ectx.index))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper(), plan
    got = {r.event_type: r.du for r in df.collect()}
    ev = read_events(spark, SF_DIR)
    want = {
        r.event_type: r.x
        for r in ev.groupBy("event_type")
        .agg(T.theta_estimate(T.theta_sketch_agg(F.col("user_id"), 4096), 4096).alias("x"))
        .collect()
    }
    assert got == want and got


def test_bounded_raw_build_mixed_aggs(ectx, spark):
    """Theta alongside mergeable aggs (count/sum) AND a non-mergeable agg
    (exact percentile): the mergeables ride the two stages, the percentile
    aggregates separately and joins back null-safely — values all match the
    one-stage plan."""
    spec = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("event_type")],
        aggregations=[
            ir.ThetaAgg("du", "user_id", k=4096),
            ir.CountAgg("n"),
            ir.FieldAgg("sum", "sv", "value"),
            ir.QuantileAgg("p50", "value", 0.5),
        ],
    )
    planned, backing, dec = ectx.plan(spec)
    flat = Backing.flat(ectx.index)
    got = {
        r.event_type: (r.du, r.n, round(float(r.sv), 6), round(r.p50, 6))
        for r in lowering.lower(planned, flat).collect()
    }
    base = flat.df.groupBy("event_type").agg(
        T.theta_estimate(T.theta_sketch_agg(F.col("user_id"), 4096), 4096).alias("du"),
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
        F.percentile(F.col("value").cast("double"), F.lit(0.5)).alias("p50"),
    )
    want = {
        r.event_type: (r.du, r.n, round(float(r.sv), 6), round(r.p50, 6))
        for r in base.collect()
    }
    assert got == want and got


def test_bounded_build_ndv_smoke(spark):
    """NDV >> k: 200k distinct values into a k=64 sketch through the bounded
    path — the merge stage only ever carries <=k-element partials per input
    partition, and the estimate still lands within the KMV error band."""
    df = spark.range(0, 200_000, 1, 8).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    spec = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("g")],
        aggregations=[ir.ThetaAgg("du", "v", k=64)],
    )
    out = lowering.lower(spec, Backing.base(df.withColumn("ts", F.current_timestamp()), "ts"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()
    for r in out.collect():
        assert abs(r.du - 50_000) / 50_000 < 0.5  # k=64 KMV band
    # bit-identity with the unbounded one-stage build at NDV >> k
    direct = {
        r.g: r.du
        for r in df.groupBy("g")
        .agg(T.theta_estimate(T.theta_sketch_agg(F.col("v"), 64), 64).alias("du"))
        .collect()
    }
    assert {r.g: r.du for r in out.collect()} == direct


def test_cube_build_two_stage_bit_identical(spark, tmp_path):
    """The index cube build (now two-stage when theta specs are present)
    produces bit-identical sketch AND metric columns to the direct one-stage
    aggregation."""
    from pysparkline.events_index import events_index_config, events_star
    from pysparkline.index import OlapIndex
    from pysparkline.tpch import read_events

    ev = read_events(spark, SF_DIR)
    idx = OlapIndex.build(
        spark, ev, events_index_config(), str(tmp_path / "idx"), star=events_star()
    )
    cube = idx.cube_df("types")
    direct = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("__bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("__count"),
        T.theta_sketch_agg(F.col("user_id"), 4096).alias("theta_user_id_k4096"),
        F.sum(F.expr("CAST(value AS DECIMAL(18,6))")).alias("sum_value"),
    )
    got = {
        (str(r["__bucket"]), r.event_type): (
            r["__count"], tuple(r.theta_user_id_k4096), r.sum_value
        )
        for r in cube.select(
            "__bucket", "event_type", "__count", "theta_user_id_k4096", "sum_value"
        ).collect()
    }
    want = {
        (str(r["__bucket"]), r.event_type): (
            r["__count"], tuple(r.theta_user_id_k4096), r.sum_value
        )
        for r in direct.collect()
    }
    assert got == want and got


def test_metadata_view_lists_sketch_columns(ectx):
    """olap_cubes (DruidMetadataViews analog) surfaces the cube's sketch
    metrics — HLL, histogram, and theta — so a BI layer can discover which
    distinct/quantile/set-op queries are cube-servable."""
    ectx.register_metadata_views()
    row = ectx.spark.sql(
        "SELECT sketch_columns FROM olap_cubes WHERE cube_name = 'types'"
    ).collect()[0]
    cols = set(row.sketch_columns.split(","))
    assert {"hll_user_id", "hist_value", "theta_user_id_k4096"} <= cols
