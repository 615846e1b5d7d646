"""Approximate TopN via per-cell top-m weight maps (index.TopKSpec) — the
Druid TopN semantics the reference gated behind allowTopN
(DruidPlanner.scala:149-159; Druid merges per-segment top-m lists). The
default lowering stays exact; ``TopNQuery(approx=True)`` opts into the
sketch when a cube carries a matching map.

Covers: exact-regime equivalence on the TPC-H fixture (per-cell NDV <= m,
bounds all zero), the error-bound invariant when cells DO overflow a tiny
m, honest declines back to the exact path, and serde."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pysparkline import OlapContext, ir, tpch
from pysparkline.index import (
    BUCKET_COL, CubeSpec, IndexConfig, OlapIndex, TopKSpec,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ctx(spark):
    idx = tpch.build_or_load_index(spark, SF_DIR)
    return OlapContext(spark, idx, fds=tpch.tpch_fds())


def _spec(approx, **kw):
    kw.setdefault("aggregations", [ir.CountAgg("cnt")])
    return ir.TopNQuery(
        dimension=kw.pop("dimension", ir.DefaultDim("s_name")),
        metric=kw.pop("metric", "cnt"),
        threshold=kw.pop("threshold", 10),
        approx=approx,
        **kw,
    )


def _rows(ctx, spec):
    return [tuple(r) for r in ctx.query(spec).collect()]


def test_sketch_serves_and_matches_exact(ctx):
    spec, backing, dec = ctx.plan(_spec(True))
    assert dec.backing == "cube"
    assert backing.topk is not None
    assert any("approx TopN" in n for n in dec.notes)
    assert _rows(ctx, _spec(True)) == _rows(ctx, _spec(False))


def test_sketch_per_bucket_granularity(ctx):
    a = _rows(ctx, _spec(True, granularity="month", threshold=3,
                         time_output_name="month"))
    b = _rows(ctx, _spec(False, granularity="month", threshold=3,
                         time_output_name="month"))
    assert a == b and len(a) > 50


def test_sketch_with_cell_filter(ctx):
    f = ir.SelectorFilter("l_returnflag", "R")
    assert _rows(ctx, _spec(True, filter=f, threshold=5)) == _rows(
        ctx, _spec(False, filter=f, threshold=5)
    )


def test_declines_fall_back_to_exact(ctx):
    # inverted metric: the maps keep the LARGEST weights
    _, b1, d1 = ctx.plan(_spec(True, inverted=True))
    assert b1.topk is None
    # filter on the sketched dim: would change what the stored maps mean
    _, b2, d2 = ctx.plan(
        _spec(True, filter=ir.ContainsFilter("s_name", "0001"))
    )
    assert b2.topk is None
    # a second aggregation the maps don't carry
    _, b3, d3 = ctx.plan(
        _spec(
            True,
            aggregations=[
                ir.CountAgg("cnt"), ir.FieldAgg("sum", "q", "l_quantity")
            ],
        )
    )
    assert b3.topk is None
    # all three still answer correctly through the exact path
    assert _rows(ctx, _spec(True, inverted=True)) == _rows(
        ctx, _spec(False, inverted=True)
    )


def test_allow_topn_session_gate(spark, ctx):
    """The reference's allowTopN was a SESSION gate (DruidPlanner.scala:
    149-159): with it on, a SQL GROUP BY ... ORDER BY metric DESC LIMIT k
    over the star rewrites to TopN and serves from the sketch; with it off
    (default) the same SQL runs exact. Results identical here (exact
    regime)."""
    sql = """
SELECT s_name, count(*) AS cnt FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name ORDER BY cnt DESC, s_name LIMIT 10"""
    exact = [tuple(r) for r in ctx.sql(sql).collect()]
    assert ctx.query_history[-1].backing in ("cube", "flat")
    actx = OlapContext(
        spark, ctx.index, fds=tpch.tpch_fds(), allow_topn=True
    )
    got = [tuple(r) for r in actx.sql(sql).collect()]
    assert actx.query_history[-1].backing == "cube"
    assert any(
        "approx TopN" in n and "serves" in n
        for n in actx.query_history[-1].decision.splitlines()
    ) or "approx TopN" in actx.query_history[-1].decision
    assert got == exact


def test_serde_round_trips_approx():
    spec = _spec(True)
    rt = ir.node_from_dict(json.loads(json.dumps(spec.to_dict())))
    assert rt.approx is True and rt.to_dict() == spec.to_dict()


def test_bound_invariant_when_cells_overflow(spark):
    """Tiny m so cells genuinely drop values: for EVERY dimension value,
    est <= true <= est + sum(bounds of cells where the value is absent) —
    the merge contract that makes the estimate usable at all."""
    flat = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            F.col("l_shipdate").alias("ship"),
            "l_returnflag",
            F.col("l_suppkey").cast("string").alias("supp"),
        )
    )
    cfg = IndexConfig(
        time_col="ship",
        cubes=[CubeSpec("c", ("l_returnflag",), "month")],
        topk_specs=[TopKSpec("supp", "count", 3)],
    )
    cube = OlapIndex._build_cube(flat, cfg, cfg.cubes[0])
    tk = cfg.topk_specs[0]
    ex = cube.select(
        BUCKET_COL, "l_returnflag", F.col(tk.bound_col_name).alias("b"),
        F.explode_outer(F.col(tk.col_name)).alias("v", "w"),
    ).cache()
    total_bound = ex.groupBy(BUCKET_COL, "l_returnflag").agg(
        F.max("b").alias("b")
    ).agg(F.sum("b")).collect()[0][0]
    est = ex.where(F.col("v").isNotNull()).groupBy("v").agg(
        F.sum("w").alias("est"), F.sum("b").alias("present_bound")
    )
    true = flat.groupBy(F.col("supp").alias("v")).agg(
        F.count(F.lit(1)).alias("true_n")
    )
    joined = est.join(true, "v", "full").select(
        "v",
        F.coalesce("est", F.lit(0)).alias("est"),
        F.coalesce("true_n", F.lit(0)).alias("true_n"),
        (
            F.lit(total_bound) - F.coalesce("present_bound", F.lit(0))
        ).alias("err"),
    )
    bad = joined.where(
        (F.col("est") > F.col("true_n"))
        | (F.col("true_n") > F.col("est") + F.col("err"))
    ).collect()
    assert not bad, bad[:5]
    # the tiny m genuinely overflowed: some cell carries a nonzero bound
    assert total_bound > 0


def test_exact_regime_bounds_are_zero(ctx):
    """At the fixture m (1024 >= per-cell supplier NDV) no cell overflows,
    so every bound is 0 — the provably-exact regime the driver oracle
    relies on."""
    tk = ctx.index.config.topk_specs[0]
    for name in ctx.index.manifest["cubes"]:
        # measure-subset rollups (CubeSpec.measures) legitimately skip
        # top-k sketch state; only cubes carrying the spec are in scope
        if not ctx.index.config.cube_by_name(name).keeps(tk.col_name):
            continue
        mx = (
            ctx.index.cube_df(name)
            .agg(F.max(F.col(tk.bound_col_name)))
            .collect()[0][0]
        )
        assert mx == 0.0, (name, mx)


def test_sketch_dim_filter_post_filters_the_map(ctx):
    """Round-7 widening: selector/IN conjuncts ON the sketched dim no longer
    decline — they post-filter the exploded map (exact w.r.t. the sketch,
    lowering.split_sketch_filter), composing with cell filters on grain
    dims. Equivalence to the exact path holds in the exact regime."""
    names = [f"Supplier#{i:09d}" for i in range(6)]
    shapes = [
        ir.InFilter("s_name", names),
        ir.SelectorFilter("s_name", names[0]),
        ir.and_(
            ir.SelectorFilter("l_returnflag", "R"),
            ir.InFilter("s_name", names),
        ),
    ]
    for f in shapes:
        _, b, d = ctx.plan(_spec(True, filter=f, threshold=5))
        assert b.topk is not None, d.notes
        assert _rows(ctx, _spec(True, filter=f, threshold=5)) == _rows(
            ctx, _spec(False, filter=f, threshold=5)
        ), f
    # non-selector/IN shapes on the sketched dim still decline honestly
    _, b2, _ = ctx.plan(
        _spec(True, filter=ir.BoundFilter("s_name", lower="Supplier#000000003"))
    )
    assert b2.topk is None
