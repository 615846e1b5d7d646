"""Property test: an index grown by appends answers every generated query
identically to a batch-built index over the same data — the merge-form
monoid property (count/sum/min/max/HLL partials re-aggregate associatively),
fuzzed over the full GroupBy surface instead of example-tested.

The planner runs independently on both contexts (their NDV stats differ —
appends update stats incrementally), so agreement also covers "different
backing choice, same answer"."""

from __future__ import annotations

import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F

from pysparkline import tpch
from pysparkline.session import OlapContext

from tests.test_property_oracle import _norm, _rows_equal, _sort_key, groupby_specs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def contexts(spark, tmp_path_factory):
    from pysparkline.index import OlapIndex, flatten_star

    root = tmp_path_factory.mktemp("append_prop")
    batch_idx = tpch.build_or_load_index(spark, SF)

    fact = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    tables = tpch.load_star_tables(spark, SF)
    star = tpch.tpch_star(tables)
    cfg = tpch.tpch_index_config()

    def flat_of(fact_part):
        return flatten_star(
            spark, dict(tables, lineitem=fact_part), star
        ).withColumn("order_year", F.year("o_orderdate"))

    grown = OlapIndex.build(
        spark,
        flat_of(fact.where(F.crc32(F.col("l_orderkey").cast("string")) % 3 == 0)),
        cfg,
        str(root / "index"),
        star=star,
        compute_ndv=False,
    )
    for m in (1, 2):
        grown.append_batch(
            flat_of(fact.where(F.crc32(F.col("l_orderkey").cast("string")) % 3 == m))
        )

    yield (
        OlapContext(spark, batch_idx, fds=tpch.tpch_fds()),
        OlapContext(spark, grown, fds=tpch.tpch_fds()),
    )
    shutil.rmtree(str(root), ignore_errors=True)


def test_appended_hll_stays_within_bound(contexts):
    """HLL sketches built per append segment and UNION-merged at query time
    must estimate within the sketch error bound of the exact count (merged
    unions drop the HIP estimator, so bit-equality with a single-pass sketch
    is not guaranteed — the bound is the correct contract)."""
    from pysparkline import ir

    _, ctx_grown = contexts
    est = {
        r.l_returnflag: r.approx
        for r in ctx_grown.query(
            ir.GroupByQuery(
                dimensions=[ir.DefaultDim("l_returnflag")],
                aggregations=[ir.HyperUniqueAgg("approx", "o_orderkey")],
            )
        ).collect()
    }
    exact = {
        r.l_returnflag: r.exact
        for r in ctx_grown.query(
            ir.GroupByQuery(
                dimensions=[ir.DefaultDim("l_returnflag")],
                aggregations=[ir.DistinctAgg("exact", "o_orderkey")],
            )
        ).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] <= 0.05, (k, est[k], exact[k])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(spec=groupby_specs())
def test_appended_index_matches_batch(contexts, spec):
    ctx_batch, ctx_grown = contexts
    a = [tuple(_norm(x) for x in r) for r in ctx_batch.query(spec).collect()]
    b = [tuple(_norm(x) for x in r) for r in ctx_grown.query(spec).collect()]
    a, b = sorted(a, key=_sort_key), sorted(b, key=_sort_key)
    assert len(a) == len(b) and all(_rows_equal(x, y) for x, y in zip(a, b)), (
        f"\nspec: {spec.to_dict()}\nbatch backing: "
        f"{ctx_batch.query_history[-1].backing}, grown backing: "
        f"{ctx_grown.query_history[-1].backing}\n{len(a)} vs {len(b)} rows"
    )
