"""Property-based dual-execution testing (the reference's cTest, mechanized).

Hypothesis generates random GroupBy specs over the flattened TPC-H star; each
runs through ctx.query (the planner freely picks cube vs flat — so the
merge-form aggregate rewrite is in the loop) AND through DuckDB executing
ir_sql.to_sql over the SAME flat parquet. Results must agree row-for-row.

This is the strongest correctness statement in the suite: any planner routing
bug, merge-form error (count vs sum(count), avg decomposition, filtered agg
over pre-agg rows), or filter-lowering mismatch shows up as a counterexample.
"""

import datetime
import decimal
import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings

import os

# deepen all fuzzers by a factor (one-off robustness sweeps):
#   PYSPARKLINE_FUZZ_SCALE=5 python -m pytest tests/test_property_*.py
_FUZZ_SCALE = int(os.environ.get("PYSPARKLINE_FUZZ_SCALE", "1"))
from hypothesis import strategies as st

from pysparkline import ir, tpch
from pysparkline.ir_sql import to_sql
from pysparkline.session import OlapContext

SF = "/root/testdata/sf0.001"

DIM_DOMAIN = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
    "c_nation": ["FRANCE", "GERMANY", "CHINA", "BRAZIL", "CANADA"],
    "s_region": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}
NUM_COLS = ["l_quantity", "l_discount"]
METRIC_COLS = ["l_quantity", "l_extendedprice"]

dim_col = st.sampled_from(sorted(DIM_DOMAIN))

simple_filter = st.one_of(
    dim_col.flatmap(
        lambda c: st.sampled_from(DIM_DOMAIN[c]).map(
            lambda v: ir.SelectorFilter(c, v)
        )
    ),
    dim_col.flatmap(
        lambda c: st.lists(
            st.sampled_from(DIM_DOMAIN[c]), min_size=1, max_size=3, unique=True
        ).map(lambda vs: ir.InFilter(c, vs))
    ),
    st.tuples(
        st.sampled_from(NUM_COLS),
        st.integers(0, 30),
        st.integers(10, 50),
        st.booleans(),
        st.booleans(),
    ).map(
        lambda t: ir.BoundFilter(
            t[0],
            lower=t[1] if t[0] == "l_quantity" else t[1] / 100.0,
            upper=t[2] if t[0] == "l_quantity" else t[2] / 100.0,
            lower_strict=t[3],
            upper_strict=t[4],
        )
    ),
    dim_col.map(lambda c: ir.NullFilter(c, False)),
)

filters = st.one_of(
    simple_filter,
    simple_filter.map(lambda f: ir.NotFilter(f)),
    st.lists(simple_filter, min_size=2, max_size=3).map(
        lambda fs: ir.LogicalFilter("and", fs)
    ),
    st.lists(simple_filter, min_size=2, max_size=3).map(
        lambda fs: ir.LogicalFilter("or", fs)
    ),
)

aggs = st.lists(
    st.one_of(
        st.builds(lambda: ir.CountAgg("")),  # fresh instance per draw
        st.tuples(st.sampled_from(["sum", "min", "max"]), st.sampled_from(METRIC_COLS)).map(
            lambda t: ir.FieldAgg(t[0], "", t[1])
        ),
        st.sampled_from(METRIC_COLS).map(lambda c: ir.AvgAgg("", c)),
        st.tuples(
            st.sampled_from(METRIC_COLS), st.sampled_from([0.25, 0.5, 0.9])
        ).map(lambda t: ir.QuantileAgg("", t[0], t[1])),
        # exact count-distinct: low-NDV dims keep est_groups under the
        # shuffle parallelism, so these draws routinely trigger the planner's
        # two-stage distinct skew guard (lowering._two_stage_distinct)
        dim_col.map(lambda c: ir.DistinctAgg("", c)),
        # theta distinct in its exact regime (k >> any sf0.001/0.01 NDV):
        # the estimate equals COUNT(DISTINCT), so the oracle is portable —
        # random specs exercise build/merge and the planner fallback paths
        st.one_of(dim_col, st.sampled_from(METRIC_COLS)).map(
            lambda c: ir.ThetaAgg("", c, k=1 << 17)
        ),
        st.tuples(
            dim_col, st.sampled_from(METRIC_COLS)
        ).map(
            lambda t: ir.FilteredAgg(
                "",
                ir.SelectorFilter(t[0], DIM_DOMAIN[t[0]][0]),
                ir.FieldAgg("sum", "", t[1]),
            )
        ),
        # filtered theta in the exact regime (the SQL-funnel shape)
        st.tuples(dim_col, dim_col).map(
            lambda t: ir.FilteredAgg(
                "",
                ir.SelectorFilter(t[0], DIM_DOMAIN[t[0]][0]),
                ir.ThetaAgg("", t[1], k=1 << 17),
            )
        ),
    ),
    min_size=1,
    max_size=3,
)

intervals = st.one_of(
    st.just([]),
    st.tuples(st.integers(1995, 1999), st.integers(1, 3)).map(
        lambda t: [ir.Interval(f"{t[0]}-01-01", f"{t[0] + t[1]}-01-01")]
    ),
)

time_dims = st.one_of(
    st.just(None),
    st.sampled_from(["year", "month", "quarter"]).map(
        lambda p: ir.TimeFormatDim("l_shipdate", f"t_{p}", p)
    ),
)


@st.composite
def groupby_specs(draw):
    ds = [
        ir.DefaultDim(c)
        for c in draw(st.lists(dim_col, min_size=0, max_size=2, unique=True))
    ]
    td = draw(time_dims)
    if td is not None:
        ds.append(td)
    ags = draw(aggs)
    for i, a in enumerate(ags):
        a.name = f"m{i}"
    post = []
    if len(ags) >= 2 and draw(st.booleans()):
        post.append(
            ir.ArithmeticPostAgg(
                "pa", draw(st.sampled_from(["`m0` + `m1`", "`m0` * 2 - `m1`"]))
            )
        )
    having = None
    if draw(st.booleans()):
        # arithmetic predicate over an agg output name (NULL -> dropped on
        # both engines; DuckDB permits select aliases in HAVING)
        having = ir.HavingSpec(
            f"`m0` {draw(st.sampled_from(['>=', '<', '>']))} "
            f"{draw(st.sampled_from([0, 1, 10]))}"
        )
    return ir.GroupByQuery(
        dimensions=ds,
        granularity=draw(st.sampled_from(["all", "all", "year", "month", "day"])),
        filter=draw(st.one_of(st.just(None), filters)),
        aggregations=ags,
        post_aggregations=post,
        having=having,
        intervals=draw(intervals),
    )


@pytest.fixture(scope="module")
def harness(spark):
    idx = tpch.build_or_load_index(spark, SF)
    ctx = OlapContext(spark, idx, fds=tpch.tpch_fds())
    con = duckdb.connect()
    flat_path = f"{idx.path}/flat"
    con.execute(f"CREATE VIEW flat AS SELECT * FROM '{flat_path}/**/*.parquet'")
    return ctx, con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()[:10]
    return v


def _sort_key(row):
    # coarse float snapping for a stable sort; equality uses tolerance
    return str(tuple(f"{x:.4g}" if isinstance(x, float) else x for x in row))


def _rows_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True


def _check(harness, spec, sort=True):
    ctx, con = harness
    sql = to_sql(spec, "flat", "duckdb")
    df = ctx.query(spec)
    got = [tuple(_norm(x) for x in r) for r in df.collect()]
    exp = [tuple(_norm(x) for x in r) for r in con.execute(sql).fetchall()]
    if sort:
        got, exp = sorted(got, key=_sort_key), sorted(exp, key=_sort_key)
    ok = len(got) == len(exp) and all(
        _rows_equal(a, b) for a, b in zip(got, exp)
    )
    assert ok, (
        f"\nspec: {spec.to_dict()}\nsql: {sql}\nbacking: "
        f"{ctx.query_history[-1].backing}\ngot {len(got)} rows, exp {len(exp)}"
        + (f"\nfirst diff: "
           f"{next(((a, b) for a, b in zip(got, exp) if not _rows_equal(a, b)), None)}"
           if got and exp else "")
    )


@settings(
    max_examples=30 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(spec=groupby_specs())
def test_random_groupby_matches_duckdb(harness, spec):
    _check(harness, spec)


@st.composite
def topn_specs(draw):
    # s_name is the TopKSpec-sketched dim: drawing it (with approx below)
    # exercises the approximate serving path in its exact regime, where the
    # oracle must still match EXACTLY; every other combination exercises
    # the honest declines (inverted/multi-agg/unsketched dim), which must
    # also match — approx=True may never change an answer at fuzz SFs
    dim = draw(st.one_of(dim_col, st.just("s_name")))
    ags = draw(aggs)
    for i, a in enumerate(ags):
        a.name = f"m{i}"
    return ir.TopNQuery(
        dimension=ir.DefaultDim(dim),
        metric=ags[0].name,
        threshold=draw(st.integers(1, 4)),
        inverted=draw(st.booleans()),
        filter=draw(st.one_of(st.just(None), simple_filter)),
        aggregations=ags,
        intervals=draw(intervals),
        approx=draw(st.booleans()),
    )


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(spec=topn_specs())
def test_random_topn_matches_duckdb(harness, spec):
    # ordered comparison: both sides order by (metric, dim) deterministically.
    # Equal metric values at the cut boundary can still legally differ only
    # when floats tie beyond the tiebreak — dims are strings, metric+dim
    # ordering is total, so exact match is required.
    _check(harness, spec, sort=False)


@st.composite
def grouping_set_specs(draw):
    import itertools

    ds = draw(st.lists(dim_col, min_size=1, max_size=2, unique=True))
    power = [
        list(s)
        for r in range(len(ds) + 1)
        for s in itertools.combinations(ds, r)
    ]
    # ANSI requires every projected dim to appear in >=1 set: always include
    # the full set (the realistic cube/rollup shape), plus random subsets
    extra = draw(
        st.lists(
            st.sampled_from(power),
            max_size=3,
            unique_by=lambda s: tuple(s),
        )
    )
    sets = [ds] + [s for s in extra if s != ds]
    ags = draw(aggs)
    for i, a in enumerate(ags):
        a.name = f"m{i}"
    return ir.GroupByQuery(
        dimensions=[ir.DefaultDim(c) for c in ds],
        filter=draw(st.one_of(st.just(None), simple_filter)),
        aggregations=ags,
        grouping_sets=sets,
        intervals=draw(intervals),
        output_order=ds + [a.name for a in ags],
    )


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(spec=grouping_set_specs())
def test_random_grouping_sets_match_duckdb(harness, spec):
    """The per-set union lowering (null re-insertion, the reference's
    subtlest logic — AggregateTransform.scala:233-291) vs ANSI GROUPING SETS."""
    _check(harness, spec)


@st.composite
def select_specs(draw):
    cols = ["l_orderkey", "l_linenumber"] + draw(
        st.lists(
            st.sampled_from(["l_quantity", "l_returnflag", "o_orderpriority"]),
            max_size=2,
            unique=True,
        )
    )
    return ir.SelectQuery(
        columns=cols,
        filter=draw(st.one_of(st.just(None), filters)),
        # the synthetic lineitem has no unique key: order by EVERY selected
        # column so the limit prefix is a deterministic multiset
        order_by=[ir.OrderByColumn(c) for c in cols],
        limit=draw(st.integers(1, 200)),
        intervals=draw(intervals),
    )


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(spec=select_specs())
def test_random_select_matches_duckdb(harness, spec):
    # (l_orderkey, l_linenumber) is a unique key: total order, exact match
    _check(harness, spec, sort=False)
