"""Cluster-free unit tests: star validation, FD closure, cardinality
estimation, IR serde round-trips, interval/granularity arithmetic.

The reference's analogs: StarSchemaInfo validation constraints
(StarSchemaInfo.scala:127-175), FunctionalDependency closure + estimate
(:141-190, :59-83), SerTest.scala json round-trips, QueryIntervals arithmetic.
"""

import pytest

from pysparkline import ir
from pysparkline.lowering import gran_coarser_or_equal, interval_aligned
from tests.conftest import SF_DIR
from pysparkline.metadata import (
    N_TO_ONE,
    ONE_TO_ONE,
    EqualityCondition,
    FDGraph,
    FunctionalDependency,
    StarRelation,
    StarSchema,
    StarSchemaError,
)


def _rel(l, r, lc, rc, t=N_TO_ONE):
    return StarRelation(l, r, t, (EqualityCondition(lc, rc),))


# --------------------------------------------------------------- star schema


def test_star_validation_unique_parent():
    with pytest.raises(StarSchemaError, match="two parents"):
        StarSchema(
            "f",
            (_rel("f", "d", "a", "b"), _rel("g", "d", "c", "b")),
        )


def test_star_validation_unique_columns():
    with pytest.raises(StarSchemaError, match="globally unique"):
        StarSchema(
            "f",
            (_rel("f", "d", "k", "dk"),),
            table_columns={"f": ["k", "x"], "d": ["dk", "x"]},
        )


def test_star_validation_disconnected():
    with pytest.raises(StarSchemaError):
        StarSchema("f", (_rel("g", "d", "a", "b"),))


def test_star_join_order_and_is_star_join():
    s = StarSchema(
        "f",
        (_rel("d1", "d2", "x", "y"), _rel("f", "d1", "a", "b")),
    )
    order = [r.right_table for r in s.join_order()]
    assert order == ["d1", "d2"]
    assert s.is_star_join({("a", "b"), ("y", "x")})
    assert not s.is_star_join({("a", "y")})


# ------------------------------------------------------------------- FD graph


def test_fd_closure_composition():
    g = FDGraph(
        [
            FunctionalDependency("a", "b", N_TO_ONE),
            FunctionalDependency("b", "c", N_TO_ONE),
        ]
    )
    assert g.determines("a", "c")  # transitive
    assert not g.determines("c", "a")


def test_fd_one_to_one_bidirectional():
    g = FDGraph([FunctionalDependency("a", "b", ONE_TO_ONE)])
    assert g.determines("a", "b") and g.determines("b", "a")


def test_fd_cardinality_one_to_one_group():
    """A mutually-determining (1-1) pair must count ONE member, not zero."""
    g = FDGraph([FunctionalDependency("a", "b", ONE_TO_ONE)])
    card = {"a": 100.0, "b": 100.0}
    assert g.estimate_cardinality(["a", "b"], card) == 100.0
    assert g.estimate_cardinality(["b", "a"], card) == 100.0


def test_fd_cardinality_collapse():
    # nation determines region: grouping by both costs only |nation|
    g = FDGraph([FunctionalDependency("nation", "region", N_TO_ONE)])
    card = {"nation": 25.0, "region": 5.0, "brand": 40.0}
    assert g.estimate_cardinality(["nation", "region"], card) == 25.0
    assert g.estimate_cardinality(["nation", "region", "brand"], card) == 1000.0
    assert g.estimate_cardinality(["region"], card) == 5.0


# -------------------------------------------------------------------- IR serde


def test_ir_roundtrip_groupby():
    q = ir.GroupByQuery(
        dimensions=[
            ir.DefaultDim("a"),
            ir.TimeFormatDim("t", "yr", "year"),
            ir.ExprDim("upper(b)", "ub", ["b"]),
        ],
        granularity="month",
        filter=ir.and_(
            ir.SelectorFilter("a", "x"),
            ir.or_(
                ir.BoundFilter("m", lower=1, upper=10, upper_strict=True),
                ir.NotFilter(ir.NullFilter("c", True)),
                ir.SpatialFilter(["lat", "lon"], [0.0, 0.0], [1.0, 1.0]),
            ),
        ),
        aggregations=[
            ir.CountAgg("n"),
            ir.AvgAgg("av", "m"),
            ir.FilteredAgg("f", ir.SelectorFilter("a", "y"), ir.FieldAgg("sum", "f", "m")),
            ir.HyperUniqueAgg("hu", "k"),
            ir.ThetaAgg("th", "k", k=512),
            ir.FilteredAgg(
                "fs", ir.SelectorFilter("a", "z"), ir.ThetaSketchAgg("fs", "k")
            ),
        ],
        post_aggregations=[ir.ArithmeticPostAgg("r", "`n` / `av`")],
        having=ir.HavingSpec("`n` > 5"),
        limit_spec=ir.LimitSpec([ir.OrderByColumn("n", "desc")], 10),
        intervals=[ir.Interval("1996-01-01", "1997-01-01")],
        grouping_sets=[["a"], []],
        output_order=["a", "n"],
    )
    d = q.to_dict()
    import json

    q2 = ir.node_from_dict(json.loads(json.dumps(d)))
    assert q2.to_dict() == d


def test_ir_roundtrip_all_shapes():
    shapes = [
        ir.TimeseriesQuery(granularity="day", aggregations=[ir.CountAgg("n")]),
        ir.TopNQuery(
            dimension=ir.DefaultDim("d"), metric="n", threshold=5,
            aggregations=[ir.CountAgg("n")],
        ),
        ir.SearchQuery(dimensions=["a", "b"], value="x", limit=3),
        ir.SelectQuery(columns=["a", ("b", "bb")], limit=7),
    ]
    for q in shapes:
        d = q.to_dict()
        assert ir.node_from_dict(d).to_dict() == d


def test_referenced_columns():
    q = ir.GroupByQuery(
        dimensions=[ir.ExprDim("a+b", "s", ["a", "b"])],
        filter=ir.InFilter("c", [1, 2]),
        aggregations=[ir.FilteredAgg("f", ir.NullFilter("d"), ir.FieldAgg("sum", "f", "e"))],
    )
    assert ir.query_referenced_columns(q) == {"a", "b", "c", "d", "e"}


# -------------------------------------------- granularity/interval arithmetic


def test_gran_coarser_or_equal():
    assert gran_coarser_or_equal("year", "month")
    assert gran_coarser_or_equal("month", "month")
    assert not gran_coarser_or_equal("day", "month")
    assert gran_coarser_or_equal("all", "none")
    assert gran_coarser_or_equal("week", "day")
    assert not gran_coarser_or_equal("week", "month")
    assert not gran_coarser_or_equal("month", "week")


def test_interval_alignment():
    assert interval_aligned(ir.Interval("1996-01-01", "1997-01-01"), "month")
    assert not interval_aligned(ir.Interval("1996-01-15", None), "month")
    assert interval_aligned(ir.Interval("1996-04-01", None), "quarter")
    assert not interval_aligned(ir.Interval("1996-02-01", None), "quarter")
    assert interval_aligned(ir.Interval(None, None), "day")
    assert interval_aligned(ir.Interval("1996-01-02", None), "day")


def test_interval_alignment_sub_day():
    # hour cube: hour-aligned endpoints only
    assert interval_aligned(ir.Interval("1996-01-01 10:00:00", None), "hour")
    assert not interval_aligned(ir.Interval("1996-01-01 10:30:00", None), "hour")
    # minute cube: minute-aligned endpoints are fine (regression: the old
    # check demanded minute == 0 even at minute grain)
    assert interval_aligned(ir.Interval("1996-01-01 10:30:00", None), "minute")
    assert not interval_aligned(ir.Interval("1996-01-01 10:30:30", None), "minute")
    # fractional seconds parse (regression: ValueError) and never align
    assert not interval_aligned(ir.Interval("1996-01-01 10:30:00.5", None), "minute")
    # day+ grains reject any intra-day time
    assert not interval_aligned(ir.Interval("1996-01-01 10:00:00", None), "day")


def test_olapindex_create_one_call(spark, tmp_path):
    """OlapIndex.create = flatten star + build (the CREATE TABLE ... USING
    analog): the resulting context answers a star query from a cube."""
    from pysparkline import ir, tpch
    from pysparkline.index import CubeSpec, IndexConfig, MetricSpec, OlapIndex
    from pysparkline.session import OlapContext

    sf = "/root/testdata/sf0.001"
    tables = tpch.load_star_tables(spark, sf)
    cfg = IndexConfig(
        time_col="l_shipdate",
        metrics=[MetricSpec("qty", "l_quantity", "sum")],
        cubes=[CubeSpec("rf", ("l_returnflag",), "month")],
    )
    idx = OlapIndex.create(
        spark, tables, tpch.tpch_star(tables), cfg, str(tmp_path / "idx")
    )
    ctx = OlapContext(spark, idx, base_tables=tables)
    out = ctx.sql(
        "SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sq "
        "FROM lineitem GROUP BY l_returnflag"
    )
    assert ctx.query_history[-1].backing == "cube"
    assert out.count() == 3


def test_flatten_star_size_gated_broadcast(spark):
    """A fact-sized 'dimension' must not be forced into a broadcast (at
    100 TB, TPC-H orders is ~25% of the dataset — a forced broadcast OOMs
    every executor). With a tiny threshold the oversized side takes the
    planner's shuffle join; small dims still broadcast."""
    from pysparkline import tpch
    from pysparkline.index import flatten_star

    tables = tpch.load_star_tables(spark, SF_DIR)
    star = tpch.tpch_star(tables)

    # disable Catalyst's own auto-broadcast so the plan shows exactly what
    # WE forced: with it on, tiny test dims re-broadcast under the 10MB
    # auto threshold no matter what the hint says
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        normal = flatten_star(spark, tables, star)
        plan_n = normal._jdf.queryExecution().executedPlan().toString()
        # small dims carry the forced broadcast hint as before
        assert "BroadcastHashJoin" in plan_n

        tiny = flatten_star(spark, tables, star, broadcast_max_bytes=1)
        plan_t = tiny._jdf.queryExecution().executedPlan().toString()
        # every forced broadcast declined above the size gate: the planner
        # falls to shuffle joins (at real scale AQE still auto-broadcasts
        # genuinely small sides at runtime)
        assert "BroadcastHashJoin" not in plan_t
        assert "SortMergeJoin" in plan_t or "ShuffledHashJoin" in plan_t
        # results identical either way
        assert normal.count() == tiny.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
