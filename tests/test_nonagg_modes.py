"""nonAggregateQueryHandling modes (DruidRelationInfo.scala:27-32 semantics)."""

import pytest

from pysparkline import ir, tpch
from pysparkline.session import OlapContext

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def parts(spark):
    idx = tpch.build_or_load_index(spark, SF)
    base = tpch.load_star_tables(spark, SF)
    return idx, base


def _scan(filtered: bool) -> ir.SelectQuery:
    return ir.SelectQuery(
        columns=["l_orderkey", "l_quantity"],
        filter=ir.BoundFilter("l_quantity", lower=49) if filtered else None,
        limit=10,
    )


def test_push_none_goes_to_base(spark, parts):
    idx, base = parts
    ctx = OlapContext(spark, idx, base_tables=base, non_agg_handling="push_none")
    _, _, decision = ctx.plan(_scan(True))
    assert decision.backing == "base"


def test_push_filters(spark, parts):
    idx, base = parts
    ctx = OlapContext(spark, idx, base_tables=base, non_agg_handling="push_filters")
    _, _, d1 = ctx.plan(_scan(True))
    assert d1.backing == "flat"  # has a filter: pushable
    _, _, d2 = ctx.plan(_scan(False))
    assert d2.backing == "base"  # bare projection: not pushable


def test_default_pushes_everything(spark, parts):
    idx, base = parts
    ctx = OlapContext(spark, idx, base_tables=base)
    _, _, d = ctx.plan(_scan(False))
    assert d.backing == "flat"
    # aggregates are unaffected by the mode
    ctx2 = OlapContext(spark, idx, base_tables=base, non_agg_handling="push_none")
    spec = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("l_returnflag")],
        aggregations=[ir.CountAgg("n")],
    )
    _, _, d3 = ctx2.plan(spec)
    assert d3.backing in ("cube", "flat")


def test_bad_mode_rejected(spark, parts):
    idx, base = parts
    ctx = OlapContext(spark, idx, base_tables=base, non_agg_handling="bogus")
    with pytest.raises(ValueError):
        ctx.plan(_scan(True))
