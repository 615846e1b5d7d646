"""WHERE-clause subquery acceleration (round 8): uncorrelated
`col IN (SELECT ...)` and equi-correlated `[NOT] EXISTS (...)` conjuncts
lower as left_semi/left_anti joins into the outer's ROW-GRAIN scan before
its aggregation (ir.SemiJoinQuery, session._lower_semijoin) — the
reference's "SubQry" benchmark family (BenchMarkDetails.org:95-102)
generalized to the WHERE-subquery spelling Catalyst itself rewrites to
semi-joins.

Every accelerated shape runs against the DuckDB oracle; backing strings
assert the statement really was index-served (`semijoin[...]`, not the
spark.sql fallback). Declines (NOT IN, correlated IN, uncorrelated EXISTS,
subquery under OR, LIMIT/aggregates in the subquery) must fall back AND
stay correct."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ctx(spark):
    from pysparkline import tpch
    from pysparkline.session import OlapContext

    idx = tpch.build_or_load_index(spark, SF)
    base = tpch.load_star_tables(spark, SF)
    return OlapContext(spark, idx, base_tables=base)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "part", "customer", "supplier",
              "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _same(ctx, duck, sql, backing=None):
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    b = ctx.query_history[-1].backing
    if backing is not None:
        assert b == backing, f"expected backing {backing}, got {b}"
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert len(got) == len(exp), f"{len(got)} rows != {len(exp)}"
    for r1, r2 in zip(got, exp):
        for a, b2 in zip(r1, r2):
            if isinstance(a, float) or isinstance(b2, float):
                assert abs(float(a) - float(b2)) <= 1e-6 * max(
                    1.0, abs(float(b2))
                )
            else:
                assert a == b2, (r1, r2)
    return got


# -- accelerated shapes ------------------------------------------------------


def test_in_dim_grain_inner(ctx, duck):
    """IN over a dim-table subquery: BaseKeysQuery reads the base table
    (dim grain — flat would drop orders with no lineitems, harmless for
    semi but wrong as a general key set) and semi-joins the flat scan."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_in_fact_grain_inner(ctx, duck):
    """IN over a fact-table subquery: the inner DISTINCT key set plans
    through the index (flat grain == fact grain)."""
    _same(
        ctx,
        duck,
        """SELECT l_linestatus, COUNT(*) AS n FROM lineitem
           WHERE l_partkey IN (SELECT l_partkey FROM lineitem
                               WHERE l_quantity > 45)
           GROUP BY l_linestatus""",
        backing="semijoin[flat<-flat]",
    )


def test_in_with_filters_and_interval(ctx, duck):
    """The subquery conjunct composes with ordinary filters + the time
    interval: pruning still applies to the outer scan."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                       AS DOUBLE) AS rev
           FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_totalprice > 100000)
             AND l_shipdate >= DATE '1996-01-01'
             AND l_shipdate < DATE '1997-01-01'
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_exists_correlated(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderkey = l_orderkey
                           AND o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_not_exists_anti(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey
                               AND o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-anti:base[orders]]",
    )


def test_exists_reversed_eq_sides(ctx, duck):
    """Correlation resolves by star column membership, not operand order."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE l_orderkey = o_orderkey
                           AND o_totalprice > 150000)
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_two_subquery_conjuncts(ctx, duck):
    """Two arms: both key sets semi-join the same pruned scan."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
             AND l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_size > 25)""",
        backing="semijoin[flat<-base[orders],base[part]]",
    )


def test_in_and_not_exists_mixed(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_linestatus, COUNT(*) AS n FROM lineitem
           WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal > 2000)
             AND NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey
                               AND o_orderstatus = 'F')
           GROUP BY l_linestatus""",
        backing="semijoin[flat<-base[supplier],anti:base[orders]]",
    )


def test_in_no_aggregation_select(ctx, duck):
    """SemiJoin around a plain projection outer (SelectQuery)."""
    _same(
        ctx,
        duck,
        """SELECT l_orderkey, l_linenumber FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_totalprice > 400000)
           ORDER BY l_orderkey, l_linenumber""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_in_star_join_outer(ctx, duck):
    """The outer may still be a star join (eliminated onto flat)."""
    _same(
        ctx,
        duck,
        """SELECT p.p_brand AS brand, COUNT(*) AS n
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                                  WHERE o_orderpriority = '2-HIGH')
           GROUP BY p.p_brand""",
        backing="semijoin[flat<-base[orders]]",
    )


# -- scalar subqueries (lazy broadcast 1-row cross join) ----------------------


def test_scalar_avg_fact_grain(ctx, duck):
    """`x > (SELECT AVG(...) FROM fact)`: the 1-row inner plans through
    the index and broadcast-cross-joins the outer's pruned scan — no
    driver-side collect of the scalar."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-scalar:flat]",
    )


def test_scalar_flipped_side_rides_cube(ctx, duck):
    """Scalar on the LEFT of the comparison; the filtered MAX inner is
    cube-servable."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE (SELECT MAX(l_quantity) FROM lineitem
                  WHERE l_returnflag = 'R') <= l_quantity""",
        backing="semijoin[flat<-scalar:cube]",
    )


def test_scalar_dim_grain_inner(ctx, duck):
    """Dim-table scalar reads the BASE table: an aggregate over orders
    evaluated on flat rows would weight each order by its lineitem count."""
    _same(
        ctx,
        duck,
        """SELECT l_linestatus, COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT AVG(o_totalprice) / 50
                                    FROM orders)
           GROUP BY l_linestatus""",
        backing="semijoin[flat<-scalar:base[orders]]",
    )


def test_scalar_composes_with_in_arm(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)
             AND l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
             AND l_shipdate >= DATE '1996-01-01'
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders],scalar:flat]",
    )


def test_scalar_null_result_drops_all_rows(ctx, duck):
    """AVG over an empty set is NULL; the comparison is NULL; zero rows
    survive — exactly ANSI (the broadcast row carries the NULL)."""
    got = _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem
                               WHERE l_quantity > 9999)""",
        backing="semijoin[flat<-scalar:flat]",
    )
    assert got == [(0,)]


# -- declines (fallback must fire AND stay correct) --------------------------


@pytest.mark.parametrize(
    "sql",
    [
        # NOT IN: three-valued NULL semantics
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')""",
        # correlated IN
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_totalprice > l_extendedprice)""",
        # uncorrelated EXISTS (constant predicate)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderpriority = '1-URGENT')""",
        # subquery under OR
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_returnflag = 'R'
              OR l_orderkey IN (SELECT o_orderkey FROM orders)""",
        # LIMIT inside the subquery (order-dependent sampling)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                ORDER BY o_totalprice DESC LIMIT 5)""",
        # aggregate inside the subquery
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity IN (SELECT MAX(l_quantity) FROM lineitem)""",
        # non-aggregate scalar subquery (no 1-row guarantee)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT l_quantity FROM lineitem
                               ORDER BY l_quantity DESC LIMIT 1)""",
        # correlated scalar via an OUTER TABLE ALIAS — the qualifier check:
        # unqualified-name scoping alone cannot see l1.l_quantity is outer
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE l_extendedprice > (SELECT AVG(l_extendedprice)
                                    FROM lineitem
                                    WHERE l_quantity = l1.l_quantity)""",
        # correlated IN via an outer alias (same hole, semi-join form)
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE l_partkey IN (SELECT l_partkey FROM lineitem
                               WHERE l_quantity > l1.l_quantity)""",
        # grouped scalar subquery (no 1-row guarantee; ordered so the
        # fallback comparison itself is deterministic on both engines)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem
                               GROUP BY l_returnflag ORDER BY 1 LIMIT 1)""",
    ],
)
def test_declines_fall_back_correct(ctx, duck, sql):
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    assert ctx.query_history[-1].backing == "sparksql"
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


def test_non_equi_correlated_exists_accelerates(ctx, duck):
    """Round 8 (late): this shape DECLINED when first landed; the non-equi
    residual support turned it into an accelerated join condition."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderkey = l_orderkey
                           AND o_totalprice > l_extendedprice)""",
        backing="semijoin[flat<-base[orders]]",
    )


# -- plan / IR shape ---------------------------------------------------------


def test_semijoin_plan_shape(ctx):
    """The executed plan must contain the semi join ABOVE the pruned flat
    scan and BELOW the aggregation — never a cross product, never the raw
    star re-join the fallback would run."""
    df = ctx.sql(
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag"""
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # aggregation above the join: partial HashAggregate appears
    assert "HashAggregate" in plan


def test_ir_roundtrip(ctx):
    """SemiJoinQuery/SemiJoinArm/BaseKeysQuery serialize through
    to_dict/node_from_dict (plan-cache key + SerTest.scala analog)."""
    from pysparkline import ir
    from pysparkline.sqlfront import parse_sql

    spec = parse_sql(
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
             AND NOT EXISTS (SELECT 1 FROM part
                             WHERE p_partkey = l_partkey AND p_size > 40)
           GROUP BY l_returnflag""",
        time_col="l_shipdate",
        fact_table="lineitem",
        star=ctx.star,
    )
    assert isinstance(spec, ir.SemiJoinQuery)
    assert len(spec.arms) == 2
    assert spec.arms[0].anti is False and spec.arms[1].anti is True
    rt = ir.node_from_dict(spec.to_dict())
    assert rt.to_dict() == spec.to_dict()


def test_explain_rewrite_semijoin(ctx):
    txt = ctx.explain_rewrite(
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag"""
    )
    assert "SemiJoinQuery" in txt
    assert "left_semi" in txt
    assert "base table 'orders'" in txt
    assert "row grain" in txt


def test_fact_only_star_accelerates(spark):
    """A star-less (fact-only) context still accelerates: a single-table
    scope has no outer names to capture, so uncorrelatedness holds by SQL
    scoping even without star column lists (events_index has
    table_columns={})."""
    import duckdb as _duck

    from pysparkline.events_index import build_or_load_events_index
    from pysparkline.session import OlapContext

    idx = build_or_load_events_index(spark, SF)
    ectx = OlapContext(spark, idx)
    sql = """SELECT event_type, COUNT(*) AS n FROM events
             WHERE user_id IN (SELECT user_id FROM events WHERE value > 900)
             GROUP BY event_type"""
    got = sorted(tuple(r) for r in ectx.sql(sql).collect())
    assert ectx.query_history[-1].backing == "semijoin[flat<-flat]"
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == exp


def test_plan_cache_reuse(ctx):
    sql = """SELECT COUNT(*) AS n FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                  WHERE o_orderpriority = '5-LOW')"""
    before = len(ctx.query_history)
    df1 = ctx.sql(sql)
    df2 = ctx.sql(sql)
    assert df1 is df2  # memoized compiled plan
    assert len(ctx.query_history) == before + 2


def test_explain_rewrite_scalar(ctx):
    txt = ctx.explain_rewrite(
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)"""
    )
    assert "broadcast 1-row cross join" in txt
    assert "scalar 0" in txt


def test_semijoin_inside_setop_arm(ctx, duck):
    """A set-operation arm carrying a WHERE subquery composes: the arm
    lowers through the semi-join path (previously a TypeError crash, not
    even a decline — caught in round 8's own composition check)."""
    sql = """SELECT 'hot' AS tag, l_returnflag AS flag, COUNT(*) AS n
             FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                  WHERE o_orderpriority = '1-URGENT')
             GROUP BY l_returnflag
             UNION ALL
             SELECT 'all', l_returnflag, COUNT(*) FROM lineitem
             GROUP BY l_returnflag
             ORDER BY tag, flag"""
    got = [tuple(r) for r in ctx.sql(sql).collect()]
    assert ctx.query_history[-1].backing == (
        "setop[semijoin[flat<-base[orders]],cube]"
    )
    exp = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == exp


# -- non-equi EXISTS residuals (round 8, late) --------------------------------


def test_exists_non_equi_residual(ctx, duck):
    """Mixed-scope residual conjuncts join the CONDITION (equi key drives
    the hash join, the residual filters within matches — never a theta
    join): previously any outer reference beyond the equi pair declined."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderkey = l_orderkey
                           AND o_totalprice > l_extendedprice * 20)
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_not_exists_non_equi_residual(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_linestatus, COUNT(*) AS n FROM lineitem
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey
                               AND o_totalprice > l_extendedprice * 20)
           GROUP BY l_linestatus""",
        backing="semijoin[flat<-anti:base[orders]]",
    )


def test_exists_residual_plus_inner_filter(ctx, duck):
    """Inner-only conjuncts stay with the key-set filter; mixed-scope ones
    ride the join condition — both in one EXISTS."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderkey = l_orderkey
                           AND o_orderpriority = '1-URGENT'
                           AND o_totalprice < l_extendedprice * 100)""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_exists_outer_only_residual(ctx, duck):
    """A residual referencing only OUTER columns is a constant w.r.t. the
    inner rows — still correct as a join-condition conjunct."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderkey = l_orderkey
                           AND l_quantity > 30)""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_exists_residual_without_equi_declines(ctx, duck):
    """Residual-only correlation would force a theta join (unbounded
    fan-out) — decline, fallback stays correct."""
    sql = """SELECT COUNT(*) AS n FROM lineitem
             WHERE EXISTS (SELECT 1 FROM orders
                           WHERE o_totalprice > l_extendedprice * 100)"""
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    assert ctx.query_history[-1].backing == "sparksql"
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


# -- round-8 self-review regressions ------------------------------------------


def test_hidden_table_name_binds_outer_declines(ctx, duck):
    """Review finding #1: `FROM orders o` HIDES the name `orders` inside
    the subquery, so `orders.o_totalprice` binds to the OUTER orders row —
    the qualifier check must decline (it previously compiled an
    always-false inner filter: wrong answer, not a decline)."""
    sql = """SELECT l_returnflag, COUNT(*) AS n
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = o_custkey
                             AND orders.o_totalprice < o.o_totalprice)
             GROUP BY l_returnflag"""
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    assert ctx.query_history[-1].backing == "sparksql"
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp
    assert got and got[0][1] > 0  # data-dependent: not the empty set


def test_outer_coverage_includes_join_columns(ctx):
    """Review finding #3: the semi-join keys / residual / scalar outer
    columns count into the outer backing's coverage check, so a backing
    lacking them falls back to base instead of failing analysis."""
    from pysparkline import ir, planner

    outer = ir.GroupByQuery(
        dimensions=[ir.DefaultDim("l_returnflag")],
        aggregations=[ir.CountAgg("n")],
    )
    # a key column the flat star cannot serve + no base table -> the
    # planner must REFUSE with the column named, not pick flat and crash
    # at analysis
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no_such_key"):
        planner.choose_backing(
            outer,
            ctx.index,
            base_df=None,
            force_row_grain=True,
            extra_columns={"no_such_key"},
        )
    # with a base df supplied, the same case falls back to base
    backing, decision = planner.choose_backing(
        outer,
        ctx.index,
        base_df=ctx._base_df().withColumn(
            "no_such_key", ctx._base_df()["l_orderkey"]
        ),
        force_row_grain=True,
        extra_columns={"no_such_key"},
    )
    assert decision.backing == "base"


def test_lowering_decline_falls_back(spark, duck):
    """Review finding #4: a dim-grain subquery arm whose base table is not
    registered raises SQLFrontError at LOWERING time — ctx.sql must fall
    back to spark.sql (the statement is still plain SQL) instead of
    crashing the caller."""
    from pysparkline import tpch
    from pysparkline.session import OlapContext

    idx = tpch.build_or_load_index(spark, SF)
    noctx = OlapContext(spark, idx)  # star from the index, NO base tables
    # the fallback needs resolvable views: register them session-side
    for name, df in tpch.load_star_tables(spark, SF).items():
        df.createOrReplaceTempView(name)
    sql = """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                  WHERE o_orderpriority = '1-URGENT')
             GROUP BY l_returnflag"""
    got = sorted(tuple(r) for r in noctx.sql(sql).collect())
    assert noctx.query_history[-1].backing == "sparksql"
    assert "no registered base table" in noctx.query_history[-1].decision
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


def test_semijoin_composes_with_outer_machinery(ctx, duck):
    """The outer keeps its full surface above the semi-join: HAVING,
    ORDER/LIMIT, window posts, and an explicitly-DISTINCT arm all compose
    (each vs the DuckDB oracle)."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT DISTINCT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders]]",
    )
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_totalprice > 200000)
           GROUP BY l_returnflag HAVING COUNT(*) > 50""",
        backing="semijoin[flat<-base[orders]]",
    )
    got = [
        tuple(r)
        for r in ctx.sql(
            """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
               WHERE EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey
                               AND o_orderstatus = 'O')
               GROUP BY l_returnflag
               ORDER BY n DESC, l_returnflag LIMIT 2"""
        ).collect()
    ]
    assert ctx.query_history[-1].backing == "semijoin[flat<-base[orders]]"
    exp = [
        tuple(r)
        for r in duck.execute(
            """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
               WHERE EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey
                               AND o_orderstatus = 'O')
               GROUP BY l_returnflag
               ORDER BY n DESC, l_returnflag LIMIT 2"""
        ).fetchall()
    ]
    assert got == exp  # emitted order (total ORDER BY)
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n,
                  RANK() OVER (ORDER BY COUNT(*) DESC) AS rk
           FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '2-HIGH')
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[orders]]",
    )
