"""LookupDim: Druid registered-lookup extraction used as a dimension."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkline import ir
from pysparkline.lowering import dim_to_column


def _dim(**kw):
    base = dict(dimension="d", output_name="o", lookup={"a": "x", "b": "y"})
    base.update(kw)
    return ir.LookupDim(**base)


@pytest.fixture(scope="module")
def vals(spark):
    return spark.createDataFrame(
        [("a",), ("b",), ("c",), (None,)], "d string"
    )


def _apply(vals, dim):
    from pysparkline.lowering import Backing

    class _B:  # dim_to_column only touches backing for TimeFormatDim
        preagg = False
        index = None

    return {
        tuple(r) for r in vals.select(F.col("d"), dim_to_column(dim, _B())).collect()
    }


def test_lookup_mapping_default_null(vals):
    got = _apply(vals, _dim())
    assert got == {("a", "x"), ("b", "y"), ("c", None), (None, None)}


def test_lookup_retain_missing(vals):
    got = _apply(vals, _dim(retain_missing_value=True))
    assert got == {("a", "x"), ("b", "y"), ("c", "c"), (None, None)}


def test_lookup_replace_missing(vals):
    got = _apply(vals, _dim(replace_missing_with="other"))
    assert got == {("a", "x"), ("b", "y"), ("c", "other"), (None, "other")}


def test_lookup_empty_map(vals):
    got = _apply(vals, _dim(lookup={}, retain_missing_value=True))
    assert got == {("a", "a"), ("b", "b"), ("c", "c"), (None, None)}


def test_lookup_serde_roundtrip():
    d = _dim(retain_missing_value=True)
    back = ir.node_from_dict(d.to_dict())
    assert back == d


def test_lookup_cube_served(spark, ctx):
    """The mapping is a function of the grouped dim — a cube whose grain
    contains the dim serves it."""
    spec = ir.GroupByQuery(
        dimensions=[
            ir.LookupDim(
                "c_nation", "market",
                lookup={"NATION_1": "t1"},
                retain_missing_value=True,
            )
        ],
        aggregations=[ir.CountAgg("n")],
    )
    out = ctx.query(spec)
    rec = ctx.query_history[-1]
    assert rec.backing == "cube", rec.decision
    got = {r["market"]: r["n"] for r in out.collect()}
    flat = ctx.index.flat_df()
    want = {
        r["m"]: r["n"]
        for r in flat.groupBy(
            F.when(F.col("c_nation") == "NATION_1", "t1")
            .otherwise(F.col("c_nation"))
            .alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
