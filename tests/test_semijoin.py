"""WHERE-clause subquery acceleration (round 8): uncorrelated
`col IN (SELECT ...)` and equi-correlated `[NOT] EXISTS (...)` conjuncts
lower as left_semi/left_anti joins into the outer's ROW-GRAIN scan before
its aggregation (ir.SemiJoinQuery, session._lower_semijoin) — the
reference's "SubQry" benchmark family (BenchMarkDetails.org:95-102)
generalized to the WHERE-subquery spelling Catalyst itself rewrites to
semi-joins.

The round-8 continuation widened the surface: correlated IN (rides the
EXISTS machinery), uncorrelated NOT IN (anti arm + three-valued GuardCond),
quantified ANY/ALL comparisons (guard bundles), expression IN keys, and
equi-correlated scalar aggregates (the TPC-H Q17 shape, decorrelated via
GROUP BY + join — ir.CorrScalarCond).

Every accelerated shape runs against the DuckDB oracle; backing strings
assert the statement really was index-served (`semijoin[...]`, not the
spark.sql fallback). Declines (correlated NOT IN/quantified, uncorrelated
EXISTS, subquery under OR, LIMIT/aggregates in the subquery, non-equi
scalar correlation, outer refs inside aggregate arguments) must fall back
AND stay correct."""

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
    driver-side collect of the scalar. Since round 10 the avg inner rides
    the partkey rollup's sum_qty_raw/count_qty_raw merge pair (exact:
    l_quantity is integer-valued, so double sums are order-independent)
    instead of re-scanning flat."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-scalar:cube]",
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
        backing="semijoin[flat<-base[orders],scalar:cube]",
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
        # uncorrelated EXISTS (constant predicate)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderpriority = '1-URGENT')""",
        # subquery nested inside an arithmetic expression (not a direct
        # comparison side) — no inline slot for it
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity + (SELECT COUNT(*) FROM orders
                               WHERE o_totalprice > 400000) > 60""",
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
        # grouped scalar subquery (no 1-row guarantee; ordered so the
        # fallback comparison itself is deterministic on both engines)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem
                               GROUP BY l_returnflag ORDER BY 1 LIMIT 1)""",
        # non-equi correlation in a scalar subquery
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT AVG(o_totalprice) FROM orders
                                    WHERE o_orderkey > l_orderkey)""",
        # correlated scalar whose only correlation is non-equi via alias
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE l_extendedprice > (SELECT AVG(l_extendedprice)
                                    FROM lineitem
                                    WHERE l_quantity > l1.l_quantity)""",
        # correlated IN with an expression key and NO equi conjunct (the
        # synthetic equality is a residual; nothing drives the hash join)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber IN (SELECT o_orderkey % 7 FROM orders
                                  WHERE o_totalprice > l_extendedprice)""",
    ],
)
def test_declines_fall_back_correct(ctx, duck, sql):
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    assert ctx.query_history[-1].backing == "sparksql"
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


def test_residual_only_quantified_cap_behavior(ctx, duck, spark):
    """Residual-only ALL over a dim (round 11, late): the shape PARSES
    into a broadcast-theta arm; the tiny-inner proof decides at lowering.
    Over the cap there is no runnable fallback (Spark cannot parse ALL
    quantifiers), so the engine's error surfaces honestly; within a
    raised cap the query serves — surface NEITHER engine alone offers."""
    from pysparkline import tpch
    from pysparkline.session import OlapContext

    sql = """SELECT COUNT(*) AS n FROM lineitem
             WHERE l_extendedprice > ALL (SELECT o_totalprice FROM orders
                                          WHERE o_totalprice
                                                > l_extendedprice)"""
    # default cap 1000 < |orders| at this SF: the probe declines, the
    # spark.sql fallback cannot parse ALL — the error reaches the user
    # instead of a wrong answer
    with pytest.raises(Exception):
        ctx.sql(sql).collect()
    idx = tpch.build_or_load_index(spark, SF)
    c2 = OlapContext(spark, idx, base_tables=tpch.load_star_tables(spark, SF))
    c2.theta_inner_max_rows = 5000
    got = sorted(tuple(r) for r in c2.sql(sql).collect())
    assert c2.query_history[-1].backing == (
        "semijoin[flat<-theta-anti:base[orders]]"
    )
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


@pytest.mark.parametrize(
    "sql,msg",
    [
        (
            # outer reference inside the aggregate argument: a per-row
            # aggregate, which Spark itself rejects
            # (AGGREGATE_FUNCTION_MIXED_OUTER_LOCAL_REFERENCES)
            """SELECT COUNT(*) AS n FROM lineitem l1
               WHERE l_extendedprice > (SELECT AVG(l_extendedprice
                                                   + l1.l_quantity)
                                        FROM lineitem
                                        WHERE l_partkey = l1.l_partkey)""",
            "outer reference inside aggregate argument",
        ),
    ],
)
def test_fallback_inexpressible_declines_at_parse(ctx, sql, msg):
    """Shapes whose fallback Spark cannot run either: the parse-level
    decline is still honest (the engine's own error reaches the user
    instead of a wrong answer)."""
    from pysparkline.sqlfront import SQLFrontError, parse_sql

    with pytest.raises(SQLFrontError, match=msg):
        parse_sql(
            sql,
            time_col="l_shipdate",
            fact_table="lineitem",
            star=ctx.star,
        )


def test_unknown_qualifier_declines_at_parse(ctx):
    """A qualifier naming neither an inner nor an outer table/alias cannot
    be scoped — the statement declines at parse (both engines would
    binder-error at execution; the decline just hands the error to the
    engine instead of guessing a scope)."""
    from pysparkline.sqlfront import SQLFrontError, parse_sql

    with pytest.raises(SQLFrontError, match="unknown qualifier"):
        parse_sql(
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                    WHERE zzz.o_totalprice > 1000)""",
            time_col="l_shipdate",
            fact_table="lineitem",
            star=ctx.star,
        )


# -- round-8 continuation: correlated IN / NOT IN / quantified / Q17 ---------


def test_correlated_in_residual(ctx, duck):
    """Correlated IN rides the EXISTS machinery: the IN equality is the
    equi-correlation pair, the correlated comparison becomes a non-equi
    residual on the join condition. This exact shape was a DECLINE test
    until the round-8 continuation."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_totalprice > l_extendedprice)""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_correlated_in_equi(ctx, duck):
    """Correlated IN whose inner WHERE adds a second equi pair."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_size = l_linenumber)
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-base[part]]",
    )


def test_correlated_in_outer_alias(ctx, duck):
    """Outer-ALIAS-qualified correlation (l1.l_quantity): the scope
    resolver classifies the qualifier as outer; the conjunct becomes a
    residual. Was a decline test (the round-8 qualifier hole) — now the
    qualifier RESOLVES instead of declining."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE l_partkey IN (SELECT l_partkey FROM lineitem
                               WHERE l_quantity > l1.l_quantity)""",
        backing="semijoin[flat<-flat]",
    )


def test_correlated_in_name_collision(ctx, duck):
    """The IN child's bare name (l_partkey) is ALSO an inner column, and
    the subquery is correlated: the synthetic IN equality's outer side
    carries the reserved __outer__ marker, so it becomes the join's
    l_suppkey = outer.l_partkey condition — NOT the always-true inner
    filter l_suppkey = l_partkey an unqualified rebase would compile."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_partkey IN (SELECT l_suppkey FROM lineitem l2
                               WHERE l2.l_orderkey = lineitem.l_orderkey)""",
        backing="semijoin[flat<-flat]",
    )


def test_qualified_inner_binding_is_inner_first(ctx, duck):
    """A qualifier naming the UNALIASED inner table binds inner (SQL
    inner-first): lineitem.l_orderkey inside `FROM lineitem` is the inner
    column, so the conjunct is an inner-only tautology filter and the
    subquery is UNCORRELATED — backing must show the plain semi arm."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_partkey IN (SELECT l_suppkey FROM lineitem
                               WHERE l_orderkey = lineitem.l_orderkey)""",
        backing="semijoin[flat<-flat]",
    )


def test_not_in_uncorrelated(ctx, duck):
    """Uncorrelated NOT IN, broadcast-sized key: routes to Spark's
    null-aware anti join (one inner scan, exact ANSI semantics)."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-naaj:base[orders]]",
    )


def test_not_in_guard_route_past_broadcast_bound(ctx, duck):
    """The same NOT IN with the NAAJ bound disabled (the 100 TB route —
    a key set past the broadcast bound must NOT become a nested-loop
    join): anti arm + three-valued guard aggregating the ARM's distinct
    key set (one logical definition, count(*) = count(key) over the
    distinct set still decides NULL-membership and emptiness)."""
    prev = ctx.naaj_max_keys
    ctx.naaj_max_keys = 0
    ctx._plan_cache.clear()
    try:
        _same(
            ctx,
            duck,
            """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
               WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                        WHERE o_orderpriority = '1-URGENT')
               GROUP BY l_returnflag""",
            backing="semijoin[flat<-anti:base[orders],guard:arm]",
        )
    finally:
        ctx.naaj_max_keys = prev
        ctx._plan_cache.clear()


def test_not_in_null_member_empties(ctx, duck):
    """One NULL in the NOT IN set empties the result (ANSI three-valued
    logic) — exercised end-to-end via an expression key that synthesizes
    NULLs; the guard's count(*) = count(expr) clause must catch it."""
    got = _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_orderkey NOT IN (SELECT CASE
                                        WHEN o_orderpriority = '1-URGENT'
                                        THEN NULL ELSE o_orderkey END
                                    FROM orders)""",
        backing="semijoin[flat<-anti:base[orders],guard:arm]",
    )
    assert got == [(0,)]


def test_not_in_empty_set_keeps_all(ctx, duck):
    """NOT IN over an empty set is TRUE for every row (even NULL x) —
    the null-aware anti join's empty-build edge."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_totalprice < 0)""",
        backing="semijoin[flat<-naaj:base[orders]]",
    )


def test_in_expression_key(ctx, duck):
    """IN over an expression select item: the key set is the DISTINCT
    rendered expression (fact-grain here, so it plans through the index)."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_partkey IN (SELECT l_partkey + 1 FROM lineitem
                               WHERE l_quantity > 49)
           GROUP BY l_returnflag""",
        backing="semijoin[flat<-flat]",
    )


def test_correlated_in_expression_key(ctx, duck):
    """Correlated IN with an expression key AND an equi conjunct: the
    equality on the expression rides the join condition as a residual,
    the equi pair drives the hash join."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber IN (SELECT o_orderkey % 7 FROM orders
                                  WHERE o_orderkey = l_orderkey)""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_gt_all_guard(ctx, duck):
    """x > ALL(S): DuckDB serializes it as NOT(x <= ANY(S)); the guard
    compares against max(S) with the empty-set / NULL-member cases."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > ALL (SELECT o_totalprice FROM orders
                                        WHERE o_orderpriority = '1-URGENT'
                                          AND o_totalprice < 2000)""",
        backing="semijoin[flat<-guard:base[orders]]",
    )


def test_gt_all_empty_set_keeps_all(ctx, duck):
    """ALL over an empty set is vacuously TRUE — every row passes."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > ALL (SELECT o_totalprice FROM orders
                                        WHERE o_totalprice < 0)""",
        backing="semijoin[flat<-guard:base[orders]]",
    )


def test_le_all_null_member_empties(ctx, duck):
    """A NULL member makes <= ALL unknown for every row — nothing passes
    (the guard's count(*) = count(item) clause)."""
    got = _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity <= ALL (SELECT CASE WHEN o_totalprice < 5000
                                        THEN NULL ELSE o_totalprice END
                                    FROM orders
                                    WHERE o_totalprice < 20000)""",
        backing="semijoin[flat<-guard:base[orders]]",
    )
    assert got == [(0,)]


def test_gt_any_guard(ctx, duck):
    """x > ANY(S) reduces to x > min(S) in WHERE context (FALSE and NULL
    both drop), served by a 1-aggregate guard."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > ANY (SELECT o_totalprice FROM orders
                                        WHERE o_orderpriority = '1-URGENT')""",
        backing="semijoin[flat<-guard:base[orders]]",
    )


def test_ne_any_guard(ctx, duck):
    """x <> ANY(S): needs >= 2 distinct non-null members, or one that
    differs from x; fact-grain inner plans through the index."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber <> ANY (SELECT l_linenumber FROM lineitem
                                      WHERE l_quantity > 49)""",
        backing="semijoin[flat<-guard:flat]",
    )


def test_eq_all_guard(ctx, duck):
    """x = ALL(S): empty set passes everything; else a single distinct
    non-null value that equals x."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber = ALL (SELECT l_linenumber FROM lineitem
                                     WHERE l_quantity > 9999)""",
        backing="semijoin[flat<-guard:flat]",
    )


def test_correlated_not_in(ctx, duck):
    """Correlated NOT IN: multi-pair anti arm (correlation + key
    equality) composed with the PER-GROUP guard (counts per correlation
    key, left-joined so a missing group behaves as the empty set). Was a
    decline until the round-8 continuation."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_partkey NOT IN (SELECT p_partkey FROM part
                                   WHERE p_size = l_linenumber)""",
        backing="semijoin[flat<-anti:base[part],corrguard:base[part]]",
    )


def test_correlated_not_in_null_members(ctx, duck):
    """Per-group NULL members: only the GROUPS containing a NULL empty
    their rows' membership test — other groups still decide by the anti
    join (the uncorrelated guard would wrongly empty the whole result)."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber NOT IN (SELECT CASE
                                          WHEN o_totalprice < 150000
                                          THEN NULL
                                          ELSE o_orderkey % 7 END
                                      FROM orders
                                      WHERE o_orderkey = l_orderkey)""",
        backing="semijoin[flat<-anti:base[orders],corrguard:base[orders]]",
    )


def test_correlated_gt_all(ctx, duck):
    """Correlated > ALL: per-group (count(*), count(item), max) stats,
    LEFT-joined — rows whose correlated set is EMPTY must pass (ALL is
    vacuously true). Spark cannot parse ALL at all: surface beyond the
    fallback."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > ALL (SELECT o_totalprice / 100
                                        FROM orders
                                        WHERE o_orderkey = l_orderkey)""",
        backing="semijoin[flat<-corrguard:base[orders]]",
    )


def test_correlated_le_all_null_members(ctx, duck):
    """Correlated <= ALL with per-group NULL members: groups containing a
    NULL pass nothing; empty groups pass everything."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity <= ALL (SELECT CASE
                                        WHEN o_totalprice < 150000
                                        THEN NULL
                                        ELSE o_totalprice / 2000 END
                                    FROM orders
                                    WHERE o_orderkey = l_orderkey)""",
        backing="semijoin[flat<-corrguard:base[orders]]",
    )


def test_correlated_gt_any(ctx, duck):
    """Correlated > ANY: comparison against the group's min via the
    op-form CorrScalarCond (inner join — an empty group is ANSI FALSE)."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > ANY (SELECT o_totalprice / 100
                                        FROM orders
                                        WHERE o_orderkey = l_orderkey)""",
        backing="semijoin[flat<-corrscalar:base[orders]]",
    )


def test_correlated_ne_any_and_eq_all(ctx, duck):
    """Correlated <> ANY / = ALL over the fact table (distinct-values
    conditions per group; the = ALL form passes empty groups)."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber <> ANY (SELECT l_linenumber FROM lineitem l2
                                      WHERE l2.l_orderkey
                                            = lineitem.l_orderkey)""",
        backing="semijoin[flat<-corrguard:flat]",
    )
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber = ALL (SELECT l_linenumber FROM lineitem l2
                                     WHERE l2.l_orderkey
                                           = lineitem.l_orderkey)""",
        backing="semijoin[flat<-corrguard:flat]",
    )


def test_correlated_scalar_q17_shape(ctx, duck):
    """TPC-H Q17's correlated scalar aggregate, decorrelated: GROUP BY the
    correlation key, join, filter. The inner is fact-grain so it plans
    through the index."""
    _same(
        ctx,
        duck,
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0
                       AS DOUBLE) AS avg_yearly
           FROM lineitem
           WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = lineitem.l_partkey)""",
        backing="semijoin[flat<-corrscalar:cube]",
    )


def test_correlated_scalar_outer_alias(ctx, duck):
    """Outer-alias-qualified correlated scalar (was a decline test): the
    scope resolver classifies l1.l_quantity as outer and the equi pair
    decorrelates."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE l_extendedprice > (SELECT AVG(l_extendedprice)
                                    FROM lineitem
                                    WHERE l_quantity = l1.l_quantity)""",
        backing="semijoin[flat<-corrscalar:flat]",
    )


def test_correlated_scalar_count_left_join(ctx, duck):
    """A count-class leaf must evaluate for EMPTY groups too (the 1-row
    correlated scalar returns 0, not NULL): left join + COALESCE(leaf, 0).
    The predicate deliberately passes rows whose correlated set is empty."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber > (SELECT COUNT(*) FROM orders
                                 WHERE o_orderkey = l_orderkey
                                   AND o_totalprice < 1000)""",
        backing="semijoin[flat<-corrscalar:base[orders]]",
    )


def test_correlated_scalar_dim_grain(ctx, duck):
    """Dim-grain correlated scalar: per-key aggregates over the base
    table (flat rows would weight each order by its lineitem count)."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT AVG(o_totalprice) * 0.01
                                    FROM orders
                                    WHERE o_orderkey = l_orderkey)""",
        backing="semijoin[flat<-corrscalar:base[orders]]",
    )


def test_composed_not_in_and_corr_scalar(ctx, duck):
    """The new conjunct types compose in one statement: null-aware anti
    join + decorrelated scalar, all before the outer aggregation."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
             AND l_quantity < (SELECT AVG(l_quantity) + 10
                               FROM lineitem l2
                               WHERE l2.l_partkey = lineitem.l_partkey)
           GROUP BY l_returnflag""",
        backing=(
            "semijoin[flat<-naaj:base[orders],corrscalar:cube]"
        ),
    )


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


# -- row-value IN (multi-column semi arms) -----------------------------------


def _same_oracle(ctx, duck, sql, oracle, backing=None):
    """Compare against a DIFFERENT DuckDB spelling (DuckDB parses
    row-value IN but cannot bind it — the oracle uses the equivalent
    EXISTS form)."""
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    b = ctx.query_history[-1].backing
    if backing is not None:
        assert b == backing, f"expected backing {backing}, got {b}"
    exp = sorted(tuple(r) for r in duck.execute(oracle).fetchall())
    assert got == exp, (got[:3], exp[:3])


def test_row_value_in(ctx, duck):
    """(a, b) IN (SELECT x, y ...): one multi-pair semi arm (fact-grain
    inner plans through the index)."""
    _same_oracle(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE (l_orderkey, l_linenumber) IN
                 (SELECT l_orderkey, l_linenumber FROM lineitem
                  WHERE l_quantity > 45)""",
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE EXISTS (SELECT 1 FROM lineitem l2
                         WHERE l2.l_quantity > 45
                           AND l2.l_orderkey = l1.l_orderkey
                           AND l2.l_linenumber = l1.l_linenumber)""",
        backing="semijoin[flat<-flat]",
    )


def test_row_value_in_correlated_and_or(ctx, duck):
    """Correlated row-value IN rides the EXISTS machinery (one synthetic
    equality per component); under OR it becomes a marker join."""
    _same_oracle(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE (l_orderkey, l_linenumber) IN
                 (SELECT l_orderkey, l_linenumber FROM lineitem l2
                  WHERE l2.l_quantity > l_quantity - 5)""",
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE EXISTS (SELECT 1 FROM lineitem l2
                         WHERE l2.l_quantity > l1.l_quantity - 5
                           AND l2.l_orderkey = l1.l_orderkey
                           AND l2.l_linenumber = l1.l_linenumber)""",
        backing="semijoin[flat<-flat]",
    )
    _same_oracle(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE (l_orderkey, l_linenumber) IN
                 (SELECT l_orderkey, l_linenumber FROM lineitem
                  WHERE l_quantity > 45)
              OR l_returnflag = 'N'""",
        """SELECT COUNT(*) AS n FROM lineitem l1
           WHERE EXISTS (SELECT 1 FROM lineitem l2
                         WHERE l2.l_quantity > 45
                           AND l2.l_orderkey = l1.l_orderkey
                           AND l2.l_linenumber = l1.l_linenumber)
              OR l_returnflag = 'N'""",
        backing="semijoin[flat<-mark:flat]",
    )


def test_row_value_not_in_declines(ctx, duck):
    """Row-value NOT IN: per-component three-valued logic the global
    guard cannot encode — declines; Spark's null-aware anti join runs it
    (compared against the NULL-free NOT EXISTS equivalent)."""
    sql = """SELECT COUNT(*) AS n FROM lineitem
             WHERE (l_orderkey, l_partkey) NOT IN
                   (SELECT o_orderkey, o_custkey FROM orders
                    WHERE o_totalprice > 100000)"""
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    assert ctx.query_history[-1].backing == "sparksql"
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_totalprice > 100000
                                   AND o_orderkey = l_orderkey
                                   AND o_custkey = l_partkey)"""
        ).fetchall()
    )
    assert got == exp


# -- subqueries under OR (marker joins / inline conditions) ------------------


@pytest.mark.parametrize(
    "sql,backing",
    [
        (
            # plain predicate OR IN: the IN becomes a marker flag
            """SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem
               WHERE l_returnflag = 'R'
                  OR l_orderkey IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
               GROUP BY l_returnflag""",
            "semijoin[flat<-mark:base[orders]]",
        ),
        (
            # IN OR IN: two marker joins, one OR filter
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
                  OR l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_size > 45)""",
            "semijoin[flat<-mark:base[orders],mark:base[part]]",
        ),
        (
            # equi-correlated EXISTS OR a parenthesized AND
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE (EXISTS (SELECT 1 FROM orders
                              WHERE o_orderkey = l_orderkey
                                AND o_totalprice > 300000)
                      OR (l_quantity > 48 AND l_returnflag = 'A'))""",
            "semijoin[flat<-mark:base[orders]]",
        ),
        (
            # NOT EXISTS under OR: EXISTS is two-valued, the unmatched
            # flag is NULL and must read FALSE before the NOT
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_orderkey = l_orderkey
                                   AND o_totalprice < 200000)
                  OR l_quantity > 45""",
            "semijoin[flat<-mark:base[orders]]",
        ),
        (
            # scalar comparison under OR: inline condition, broadcast
            # still attached, no standalone filter
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_extendedprice > (SELECT AVG(o_totalprice)
                                        FROM orders)
                  OR l_quantity < 3""",
            "semijoin[flat<-scalar:base[orders]]",
        ),
        (
            # ALL quantifier under OR: the guard condition inlines
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_extendedprice > ALL (SELECT o_totalprice / 5
                                            FROM orders
                                            WHERE o_totalprice < 20000)
                  OR l_returnflag = 'N'""",
            "semijoin[flat<-guard:base[orders]]",
        ),
        (
            # NOT IN under OR: membership marker + inline NULL guard
            # (FALSE where the true predicate is UNKNOWN — row-set-
            # preserving in a positive context)
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                        WHERE o_orderpriority
                                              = '1-URGENT')
                  OR l_quantity > 49""",
            "semijoin[flat<-mark:base[orders],guard:arm]",
        ),
        (
            # NOT IN with NULL members under OR: the guard clause empties
            # the NOT IN branch, the OR's other branch still keeps rows
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_orderkey NOT IN (SELECT CASE
                                            WHEN o_orderpriority
                                                 = '1-URGENT'
                                            THEN NULL
                                            ELSE o_orderkey END
                                        FROM orders)
                  OR l_quantity > 49""",
            "semijoin[flat<-mark:base[orders],guard:arm]",
        ),
        (
            # correlated NOT IN under OR: multi-pair marker + per-group
            # inline guard
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_linenumber NOT IN (SELECT o_orderkey % 7
                                          FROM orders
                                          WHERE o_orderkey = l_orderkey)
                  OR l_returnflag = 'R'""",
            "semijoin[flat<-mark:base[orders],corrguard:base[orders]]",
        ),
        (
            # correlated ALL under OR: per-group guard, left join so
            # empty groups reach the OR filter
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_extendedprice > ALL (SELECT o_totalprice / 100
                                            FROM orders
                                            WHERE o_orderkey
                                                  = l_orderkey)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:base[orders]]",
        ),
        (
            # correlated positive ANY under OR: the op form converts to
            # an inline condition over a LEFT join (an inner join would
            # drop rows the OR's other branch must keep)
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_extendedprice > ANY (SELECT o_totalprice / 100
                                            FROM orders
                                            WHERE o_orderkey
                                                  = l_orderkey)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:base[orders]]",
        ),
        (
            # top-level semi arm AND an OR-composed conjunct
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                    WHERE o_totalprice > 100000)
                 AND (l_returnflag = 'R'
                      OR l_partkey IN (SELECT p_partkey FROM part
                                       WHERE p_size > 45))""",
            "semijoin[flat<-base[orders],mark:base[part]]",
        ),
        (
            # correlated SCALAR under OR (round 11): per-key bundle LEFT
            # joins (one row per key — no duplication), comparison
            # inlines into the OR filter
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_extendedprice > (SELECT AVG(o_totalprice) * 0.01
                                        FROM orders
                                        WHERE o_orderkey = l_orderkey)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrscalar:base[orders]]",
        ),
        (
            # correlated scalar under OR with EMPTY groups: the missing
            # group's NULL scalar makes its branch UNKNOWN -> FALSE, but
            # the OR's other branch must still keep those rows (this is
            # why the join is forced LEFT)
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_extendedprice > (SELECT AVG(o_totalprice)
                                        FROM orders
                                        WHERE o_orderkey = l_orderkey
                                          AND o_totalprice < 10000)
                  OR l_quantity > 45""",
            "semijoin[flat<-corrscalar:base[orders]]",
        ),
        (
            # count-class correlated scalar under OR: COUNT over an
            # empty group is 0 (COALESCE in value_sql), not NULL
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_linenumber > (SELECT COUNT(*) FROM orders
                                     WHERE o_orderkey = l_orderkey
                                       AND o_totalprice < 1000)
                  OR l_returnflag = 'R'""",
            "semijoin[flat<-corrscalar:base[orders]]",
        ),
        (
            # Q17's fact-grain correlated scalar under OR: the per-key
            # bundle still rides the partkey cube
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity)
                                   FROM lineitem l2
                                   WHERE l2.l_partkey
                                         = lineitem.l_partkey)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrscalar:cube]",
        ),
    ],
)
def test_or_composed_subqueries(ctx, duck, sql, backing):
    """Subqueries under OR (round-8 continuation): marker LEFT joins
    (Catalyst ExistenceJoin analog — key sets DISTINCT on the full join
    condition, so no duplication) + inline scalar/guard conditions,
    composed into one OR filter before aggregation."""
    _same(ctx, duck, sql, backing=backing)


# -- residual-only EXISTS (broadcast theta over a provably tiny inner) -------


@pytest.mark.parametrize(
    "sql,backing",
    [
        (
            # residual-only EXISTS: no equi anchor at all — broadcast
            # nested-loop semi join over the tiny filtered dim row set
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE EXISTS (SELECT 1 FROM part
                             WHERE p_size = 1
                               AND p_retailprice < l_extendedprice)""",
            "semijoin[flat<-theta:base[part]]",
        ),
        (
            # NOT EXISTS form: broadcast nested-loop anti join — NULL
            # comparisons never match, exactly NOT EXISTS semantics
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE NOT EXISTS (SELECT 1 FROM part
                                 WHERE p_size = 1
                                   AND p_retailprice
                                       > l_extendedprice * 2)""",
            "semijoin[flat<-theta-anti:base[part]]",
        ),
        (
            # several residual conjuncts over several outer/inner columns
            """SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem
               WHERE EXISTS (SELECT 1 FROM part
                             WHERE p_size = 1
                               AND p_retailprice < l_extendedprice
                               AND p_partkey <> l_partkey)
               GROUP BY l_returnflag""",
            "semijoin[flat<-theta:base[part]]",
        ),
        (
            # composes with an equi-anchored arm in the same statement
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                    WHERE o_totalprice > 100000)
                 AND EXISTS (SELECT 1 FROM part
                             WHERE p_size = 1
                               AND p_retailprice < l_extendedprice)""",
            "semijoin[flat<-base[orders],theta:base[part]]",
        ),
    ],
)
def test_residual_only_exists_theta(ctx, duck, sql, backing):
    """Residual-only correlated EXISTS (round 11): with NO equi anchor the
    join is pure theta — servable ONLY as a broadcast nested loop over a
    provably tiny inner. The server probes the dim-grain distinct row set
    against theta_inner_max_rows before broadcasting."""
    _same(ctx, duck, sql, backing=backing)


@pytest.mark.parametrize(
    "sql,backing",
    [
        (
            # residual-only ANY: theta semi arm, comparison folded into
            # the join condition (NULL comparison never matches — ANY's
            # UNKNOWN-is-not-TRUE semantics)
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_quantity > ANY (SELECT p_size FROM part
                                       WHERE p_size < 8
                                         AND p_retailprice
                                             < l_extendedprice)""",
            "semijoin[flat<-theta:base[part]]",
        ),
        (
            # residual-only ALL (arrives as NOT ANY): theta ANTI arm
            # matching rows where the comparison IS NOT FALSE
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_quantity >= ALL (SELECT p_size FROM part
                                        WHERE p_size < 8
                                          AND p_retailprice
                                              < l_extendedprice)""",
            "semijoin[flat<-theta-anti:base[part]]",
        ),
        (
            # NULL members: a NULL item makes the ALL comparison UNKNOWN
            # (IS NOT FALSE matches -> outer row dropped), exactly ANSI
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_quantity <= ALL (SELECT CASE WHEN p_size = 2
                                               THEN NULL
                                               ELSE p_size + 40 END
                                        FROM part
                                        WHERE p_size < 8
                                          AND p_retailprice
                                              < l_extendedprice)""",
            "semijoin[flat<-theta-anti:base[part]]",
        ),
    ],
)
def test_residual_only_quantified_theta(ctx, duck, sql, backing):
    """Residual-only quantified ANY/ALL (round 11, late): no equi anchor
    — the comparison and residual fold into a broadcast-theta arm over
    the provably tiny dim inner, riding the EXISTS theta machinery.
    Spark cannot parse the ALL forms at all (engine surface beyond the
    fallback)."""
    _same(ctx, duck, sql, backing=backing)


@pytest.mark.parametrize(
    "sql",
    [
        # residual-only NOT IN: theta ANTI arm with (x = item) IS NOT
        # FALSE — the guard-free three-valued construction
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_partkey NOT IN (SELECT p_partkey FROM part
                                   WHERE p_size = 1
                                     AND p_retailprice
                                         < l_extendedprice)""",
        # NULL members planted in SOME per-row member sets: IS NOT FALSE
        # matches them, excluding the outer row — exact ANSI NOT IN
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_partkey NOT IN (SELECT CASE WHEN p_size = 1 THEN NULL
                                          ELSE p_partkey END
                                   FROM part
                                   WHERE p_size < 4
                                     AND p_retailprice
                                         < l_extendedprice)""",
        # the shape that DECLINED until round 11 late (was in the
        # declines-fall-back table): whole-dim inner under the cap
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_partkey NOT IN (SELECT p_partkey FROM part
                                   WHERE p_size > l_linenumber)""",
    ],
)
def test_residual_only_not_in_theta(ctx, duck, sql):
    """Residual-only correlated NOT IN (round 11, late): the IN equality
    folds into the broadcast-theta anti arm as `(x = item) IS NOT FALSE`
    — no count guard needed, the condition IS the three-valued logic."""
    _same(ctx, duck, sql, backing="semijoin[flat<-theta-anti:base[part]]")


@pytest.mark.parametrize(
    "sql",
    [
        # the rate-card idiom: threshold lookup by range against a dim
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT MAX(p_retailprice) FROM part
                                    WHERE p_size > l_linenumber)""",
        # AVG + inner-only filter; big l_linenumber rows have EMPTY
        # match sets -> NULL scalar -> comparison UNKNOWN -> dropped
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT AVG(p_retailprice) FROM part
                                    WHERE p_size < 10
                                      AND p_size > l_linenumber)""",
        # COUNT leaf: an empty theta-match set evaluates as 0, not NULL
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber < (SELECT COUNT(*) FROM part
                                 WHERE p_size > l_linenumber
                                   AND p_size < 6)""",
        # arithmetic over two leaves recomputes per distinct tuple
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT 0.5 * AVG(p_retailprice)
                                           + MAX(p_size)
                                    FROM part
                                    WHERE p_size > l_linenumber)""",
    ],
)
def test_residual_only_scalar_theta(ctx, duck, sql):
    """Residual-only correlated SCALAR (round 11, late): the row-grain
    bundle's tuple-to-rows join is pure theta — served by broadcasting
    the provably tiny dim row set (theta_inner_max_rows probe) and
    re-aggregating the leaves per DISTINCT outer residual tuple. Cost
    per tuple is <= cap predicate evaluations, the same class as the
    theta semi arms."""
    _same(ctx, duck, sql,
          backing="semijoin[flat<-corrscalar-theta:base[part]]")


@pytest.mark.parametrize(
    "sql",
    [
        # COUNT(1): null-insensitive argument — the left join's
        # null-extension row must NOT count as a match (theta path)
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE 1 <= (SELECT COUNT(1) FROM part
                       WHERE p_size > l_linenumber AND p_size < 6)""",
        # same defect class on the equi-ANCHORED residual path
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE 1 <= (SELECT COUNT(1) FROM lineitem l2
                       WHERE l2.l_partkey = lineitem.l_partkey
                         AND l2.l_quantity < lineitem.l_linenumber)""",
        # SUM over a constant: empty match set must read NULL (UNKNOWN
        # comparison -> dropped), not the constant
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber > (SELECT SUM(2) FROM part
                                 WHERE p_size > l_linenumber
                                   AND p_size < 4)""",
    ],
)
def test_residual_bundle_null_insensitive_args(ctx, duck, sql):
    """REGRESSION (round-11 review): leaf aggregates over the residual
    bundle's LEFT join evaluated raw arguments — a null-insensitive
    argument like COUNT(1) or SUM(2) read the null-extension row of an
    EMPTY match set as a real match (COUNT(1) said 1 where ANSI says 0),
    on both the theta and the equi-anchored residual paths. Every leaf
    argument is now guarded by the __one marker (_leaf_aggs)."""
    _same(ctx, duck, sql)


def test_residual_only_scalar_theta_under_or(ctx, duck):
    """The theta scalar composes under OR: the bundle is one row per
    distinct tuple and joins back null-safely LEFT, so the inline OR
    form cannot duplicate rows."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice > (SELECT MAX(p_retailprice) FROM part
                                    WHERE p_size > l_linenumber)
              OR l_quantity > 49""",
        backing="semijoin[flat<-corrscalar-theta:base[part]]",
    )


def test_residual_only_exists_over_cap_declines(ctx, duck, spark):
    """Past theta_inner_max_rows the tiny-inner proof fails and the
    statement falls back to spark.sql — correct, never a silent oversized
    broadcast nested loop."""
    from pysparkline import tpch
    from pysparkline.session import OlapContext

    idx = tpch.build_or_load_index(spark, SF)
    c2 = OlapContext(spark, idx, base_tables=tpch.load_star_tables(spark, SF))
    c2.theta_inner_max_rows = 3
    sql = """SELECT COUNT(*) AS n FROM lineitem
             WHERE EXISTS (SELECT 1 FROM part
                           WHERE p_size = 1
                             AND p_retailprice < l_extendedprice)"""
    got = sorted(tuple(r) for r in c2.sql(sql).collect())
    assert c2.query_history[-1].backing == "sparksql"
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


def test_residual_only_exists_fact_inner_declines(ctx, duck):
    """A residual-only EXISTS over the FACT table declines at parse:
    proving a filtered fact tiny would itself cost a fact scan, and an
    unproven theta join is never acceptable at scale."""
    sql = """SELECT COUNT(*) AS n FROM orders
             WHERE EXISTS (SELECT 1 FROM lineitem
                           WHERE l_extendedprice > o_totalprice)"""
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    assert ctx.query_history[-1].backing == "sparksql"
    exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == exp


def test_residual_only_exists_under_or_serves(ctx, duck):
    """Residual-only (theta) EXISTS under OR (was a decline test): the
    count-bundle rewrite composes it — the proof-gated broadcast-theta
    bundle is one row per distinct residual tuple, so no duplication."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM part
                         WHERE p_size = 1
                           AND p_retailprice < l_extendedprice)
              OR l_quantity > 49""",
        backing="semijoin[flat<-corrguard-theta:base[part]]",
    )


@pytest.mark.parametrize(
    "sql,backing",
    [
        (
            # NOT EXISTS + residual under OR: count bundle reads = 0
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_orderkey = l_orderkey
                                   AND o_totalprice
                                       > l_extendedprice * 30)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:base[orders]]",
        ),
        (
            # correlated IN + residual under OR: the IN equality folds
            # into the bundle's equi pairs (a NULL key never matches =
            # non-membership — exact)
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                    WHERE o_totalprice
                                          > l_extendedprice * 30)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:base[orders]]",
        ),
        (
            # correlated NOT IN + residual + NULL members under OR:
            # the counted-leaf three-valued construction
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_linenumber NOT IN (SELECT CASE
                                              WHEN o_totalprice < 150000
                                              THEN NULL
                                              ELSE o_orderkey % 7 END
                                          FROM orders
                                          WHERE o_orderkey = l_orderkey
                                            AND o_totalprice
                                                > l_extendedprice * 20)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:base[orders]]",
        ),
        (
            # quantified ANY + residual under OR
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_quantity > ANY (SELECT o_totalprice / 10000
                                       FROM orders
                                       WHERE o_orderkey = l_orderkey
                                         AND o_totalprice
                                             > l_extendedprice * 20)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:base[orders]]",
        ),
        (
            # quantified ALL + residual under OR (IS NOT FALSE logic
            # inside the per-tuple guard leaves)
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_quantity <= ALL (SELECT o_totalprice / 5000
                                        FROM orders
                                        WHERE o_orderkey = l_orderkey
                                          AND o_totalprice
                                              > l_extendedprice * 20)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:base[orders]]",
        ),
        (
            # FACT-grain inner with residual under OR
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE EXISTS (SELECT 1 FROM lineitem l2
                             WHERE l2.l_partkey = lineitem.l_partkey
                               AND l2.l_quantity
                                   < lineitem.l_linenumber)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard:flat]",
        ),
        (
            # residual-only ALL (theta) under OR
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE l_quantity >= ALL (SELECT p_size FROM part
                                        WHERE p_size < 8
                                          AND p_retailprice
                                              < l_extendedprice)
                  OR l_quantity > 49""",
            "semijoin[flat<-corrguard-theta:base[part]]",
        ),
    ],
)
def test_or_residual_family_serves(ctx, duck, sql, backing):
    """Round 11 (late): EVERY residual-carrying subquery kind composes
    under OR via per-distinct-tuple row-grain bundles (EXISTS = count >
    0; IN folds its equality into the pairs; NOT IN and the quantified
    family keep their exact three-valued guard leaves; anchor-free forms
    take the broadcast-theta proof path). One bundle row per tuple —
    the inline OR composition cannot duplicate outer rows."""
    _same(ctx, duck, sql, backing=backing)


def test_row_value_in_residual_under_or_declines(ctx, duck):
    """Row-value IN with a residual under OR declines to the fallback
    (REGRESSION pinned by the fourth review: the bundle rewrite models a
    scalar lhs only, and the unguarded anchor fold crashed with a
    KeyError on the row() child). DuckDB cannot bind row-value IN at
    all, so the oracle is the equivalent EXISTS spelling."""
    sql = """SELECT COUNT(*) AS n FROM lineitem
             WHERE (l_orderkey, l_suppkey)
                   IN (SELECT o_orderkey, o_custkey FROM orders
                       WHERE o_totalprice > l_extendedprice * 30)
                OR l_quantity > 49"""
    got = sorted(tuple(r) for r in ctx.sql(sql).collect())
    assert ctx.query_history[-1].backing == "sparksql"
    oracle = """SELECT COUNT(*) AS n FROM lineitem
                WHERE EXISTS (SELECT 1 FROM orders
                              WHERE o_orderkey = l_orderkey
                                AND o_custkey = l_suppkey
                                AND o_totalprice > l_extendedprice * 30)
                   OR l_quantity > 49"""
    exp = sorted(tuple(r) for r in duck.execute(oracle).fetchall())
    assert got == exp


def test_or_exists_aggregate_residual_declines(ctx):
    """An aggregate inside the EXISTS subquery's WHERE under OR declines
    at parse (invalid SQL — Spark's fallback rejects it cleanly instead
    of the bundle embedding it into a join condition)."""
    with pytest.raises(Exception):
        ctx.sql(
            """SELECT COUNT(*) AS n FROM lineitem
               WHERE EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey
                               AND o_totalprice > SUM(l_quantity))
                  OR l_quantity > 49"""
        ).collect()


def test_or_corr_scalar_residual_row_grain(ctx, duck):
    """A correlated scalar with a NON-EQUI residual under OR (round 11):
    the row-grain bundle recomputes per DISTINCT (correlation + residual
    outer column) tuple and joins back null-safely LEFT — one bundle row
    per tuple, so the inline OR composition cannot duplicate rows."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_quantity < (SELECT AVG(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = lineitem.l_partkey
                                 AND l2.l_linenumber
                                     < lineitem.l_linenumber)
              OR l_quantity > 49""",
        backing="semijoin[flat<-corrscalar:flat]",
    )


def test_or_residual_exists_serves(ctx, duck):
    """An EXISTS with a non-equi residual under OR (was a decline test —
    a marker LEFT join could duplicate): round 11 late rewrites the atom
    to a count bundle (`count of matched rows > 0`) per distinct
    (anchor + residual outer column) tuple — one bundle row per tuple,
    so the inline OR composition cannot duplicate."""
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_orderkey = l_orderkey
                           AND o_totalprice > l_extendedprice * 30)
              OR l_quantity > 49""",
        backing="semijoin[flat<-corrguard:base[orders]]",
    )


# -- select-list scalar subqueries (deferred projection) ---------------------


def test_select_scalar_share_of_total(ctx, duck):
    """The share-of-total BI idiom: the hidden SUM leaf rides the base's
    grouped lowering (cube-servable), the total broadcast-cross-joins,
    the projection re-renders the item. House-style DOUBLE casts keep the
    division engine-exact (bare decimal division derives engine- and
    backing-dependent scales — ir.ScalarSelectQuery typing note)."""
    got = _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag, COUNT(*) AS n,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                       AS DOUBLE)
                  / (SELECT CAST(SUM(CAST(l_extendedprice
                                          AS DECIMAL(12,2))) AS DOUBLE)
                     FROM lineitem) AS share
           FROM lineitem GROUP BY l_returnflag ORDER BY flag""",
        backing="scalarselect[cube<-ss:cube]",
    )
    assert abs(sum(r[2] for r in got) - 1.0) < 1e-9


def test_select_scalar_constant_column(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_linestatus AS status, COUNT(*) AS n,
                  (SELECT MAX(o_totalprice) FROM orders) AS max_price
           FROM lineitem GROUP BY l_linestatus""",
        backing="scalarselect[cube<-ss:base[orders]]",
    )


def test_select_scalar_order_by_share(ctx, duck):
    """ORDER BY / LIMIT are LIFTED above the deferred projection: sorting
    by the scalar-derived output itself works and emitted order is
    guaranteed above the cross joins."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag,
                  CAST(SUM(l_quantity) AS DOUBLE)
                  / (SELECT CAST(SUM(l_quantity) AS DOUBLE)
                     FROM lineitem) AS share
           FROM lineitem GROUP BY l_returnflag
           ORDER BY share DESC LIMIT 2""",
        backing="scalarselect[cube<-ss:cube]",
    )


def test_select_scalar_null_propagates(ctx, duck):
    """An empty inner yields a NULL scalar; the projection propagates it
    (ANSI) instead of dropping rows — unlike the WHERE-clause form."""
    got = _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag,
                  CAST(SUM(l_quantity) AS DOUBLE)
                  / (SELECT CAST(SUM(l_quantity) AS DOUBLE) FROM lineitem
                     WHERE l_quantity > 9999) AS share
           FROM lineitem GROUP BY l_returnflag""",
        backing="scalarselect[cube<-ss:flat]",
    )
    assert len(got) == 3 and all(r[1] is None for r in got)


def test_select_scalar_composes_with_where_subquery(ctx, duck):
    """Select-list scalars compose with WHERE subqueries: the base is the
    SemiJoinQuery, the scalar joins above it."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag, COUNT(*) AS n,
                  CAST(SUM(l_quantity) AS DOUBLE)
                  / (SELECT CAST(SUM(l_quantity) AS DOUBLE)
                     FROM lineitem) AS share
           FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
           GROUP BY l_returnflag""",
        backing="scalarselect[semijoin[flat<-base[orders]]<-ss:cube]",
    )


def test_select_scalar_two_scalars_mixed_grain(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag,
                  CAST(SUM(l_quantity) AS DOUBLE)
                  / (SELECT CAST(SUM(l_quantity) AS DOUBLE) FROM lineitem
                     WHERE l_shipdate >= DATE '1996-01-01') AS share,
                  (SELECT AVG(o_totalprice) FROM orders
                   WHERE o_orderpriority = '1-URGENT') AS urgent_avg
           FROM lineitem GROUP BY l_returnflag""",
        backing="scalarselect[cube<-ss:cube,ss:base[orders]]",
    )


def test_having_scalar_above_average(ctx, duck):
    """HAVING scalar subqueries (the above-average-groups staple): the
    conjunct becomes a post-filter over the joined frame (hidden leaves +
    broadcast scalar), applied before the deferred projection."""
    _same(
        ctx,
        duck,
        """SELECT l_partkey AS pk, COUNT(*) AS n FROM lineitem
           GROUP BY l_partkey
           HAVING COUNT(*) > (SELECT CAST(COUNT(*) AS DOUBLE)
                              / COUNT(DISTINCT l_partkey) FROM lineitem)""",
        backing="scalarselect[cube<-ss:cube]",
    )


def test_having_scalar_mixed_conjuncts(ctx, duck):
    """Subquery-free HAVING conjuncts stay in the base statement; only
    the scalar-bearing one lifts to a post-filter. ORDER BY still lifts
    above everything."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag,
                  CAST(SUM(l_quantity) AS DOUBLE) AS qty FROM lineitem
           GROUP BY l_returnflag
           HAVING SUM(l_quantity) > (SELECT SUM(l_quantity) / 5
                                     FROM lineitem)
              AND COUNT(*) > 10
           ORDER BY flag""",
        backing="scalarselect[cube<-ss:cube]",
    )


def test_having_scalar_plus_select_scalar(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag,
                  CAST(SUM(l_quantity) AS DOUBLE)
                  / (SELECT CAST(SUM(l_quantity) AS DOUBLE)
                     FROM lineitem) AS share
           FROM lineitem GROUP BY l_returnflag
           HAVING COUNT(*) > (SELECT COUNT(*) / 4 FROM lineitem)""",
        backing="scalarselect[cube<-ss:cube,ss:cube]",
    )


def test_having_scalar_ungrouped(ctx, duck):
    _same(
        ctx,
        duck,
        """SELECT COUNT(*) AS n FROM lineitem
           HAVING COUNT(*) > (SELECT COUNT(*) FROM orders)""",
        backing="scalarselect[cube<-ss:base[orders]]",
    )


def test_select_scalar_declines_fall_back(ctx, duck):
    """Correlated select-list scalars and DISTINCT-over-scalar lists
    decline to the fallback, which Spark runs correctly."""
    for sql in (
        """SELECT l_orderkey AS k,
                  (SELECT AVG(l2.l_quantity) FROM lineitem l2
                   WHERE l2.l_partkey = lineitem.l_partkey) AS pavg
           FROM lineitem ORDER BY k, pavg LIMIT 5""",
        """SELECT DISTINCT l_returnflag AS flag,
                  (SELECT MAX(o_totalprice) FROM orders) AS m
           FROM lineitem""",
    ):
        got = sorted(tuple(r) for r in ctx.sql(sql).collect())
        assert ctx.query_history[-1].backing == "sparksql"
        exp = sorted(tuple(r) for r in duck.execute(sql).fetchall())
        assert len(got) == len(exp)
        for r1, r2 in zip(got, exp):
            for a, b in zip(r1, r2):
                if isinstance(a, float) or isinstance(b, float):
                    assert abs(float(a) - float(b)) <= 1e-9 * max(
                        1.0, abs(float(b))
                    )
                else:
                    assert a == b


def test_select_scalar_in_setop_arm(ctx, duck):
    """A set-operation arm carrying a select-list scalar lowers through
    the scalar-select path (arm backing appears in the setop
    descriptor)."""
    _same(
        ctx,
        duck,
        """SELECT 'share' AS kind, l_returnflag AS flag,
                  CAST(SUM(l_quantity) AS DOUBLE)
                  / (SELECT CAST(SUM(l_quantity) AS DOUBLE)
                     FROM lineitem) AS v
           FROM lineitem GROUP BY l_returnflag
           UNION ALL
           SELECT 'qty' AS kind, l_returnflag AS flag,
                  CAST(SUM(l_quantity) AS DOUBLE) AS v
           FROM lineitem GROUP BY l_returnflag
           ORDER BY kind, flag""",
        backing="setop[scalarselect[cube<-ss:cube],cube]",
    )


def test_select_scalar_dedup(ctx, duck):
    """Textually identical scalar subqueries and aggregate leaves share
    one slot: two shares over the same grand total plan ONE broadcast
    scalar and ONE hidden leaf."""
    from pysparkline import ir
    from pysparkline.sqlfront import parse_sql

    sql = """SELECT l_returnflag AS flag,
                    CAST(SUM(l_quantity) AS DOUBLE)
                    / (SELECT CAST(SUM(l_quantity) AS DOUBLE)
                       FROM lineitem) AS share,
                    CAST(SUM(l_quantity) AS DOUBLE) * 2
                    / (SELECT CAST(SUM(l_quantity) AS DOUBLE)
                       FROM lineitem) AS share2
             FROM lineitem GROUP BY l_returnflag"""
    spec = parse_sql(
        sql, time_col="l_shipdate", fact_table="lineitem", star=ctx.star
    )
    assert isinstance(spec, ir.ScalarSelectQuery)
    assert len(spec.scalars) == 1  # one grand total, not two
    _same(ctx, duck, sql, backing="scalarselect[cube<-ss:cube]")


def test_select_scalar_ir_roundtrip_and_explain(ctx):
    from pysparkline import ir
    from pysparkline.sqlfront import parse_sql

    sql = """SELECT l_returnflag AS flag,
                    CAST(SUM(l_quantity) AS DOUBLE)
                    / (SELECT CAST(SUM(l_quantity) AS DOUBLE)
                       FROM lineitem) AS share
             FROM lineitem GROUP BY l_returnflag ORDER BY share DESC"""
    spec = parse_sql(
        sql, time_col="l_shipdate", fact_table="lineitem", star=ctx.star
    )
    assert isinstance(spec, ir.ScalarSelectQuery)
    assert [n for n, _ in spec.final] == ["flag", "share"]
    assert spec.limit_spec is not None
    assert spec.limit_spec.columns[0].column == "share"
    rt = ir.node_from_dict(spec.to_dict())
    assert rt.to_dict() == spec.to_dict()
    txt = ctx.explain_rewrite(sql)
    assert "ScalarSelectQuery" in txt
    assert "scalar __ss0: broadcast 1-row cross join" in txt
    assert "final projection" in txt
    assert "base (hidden aggregate leaves appended)" in txt


def test_corr_guard_plan_shape(ctx):
    """100 TB posture pin for the decorrelated forms: the per-key
    aggregate must be a partial+final HashAggregate (map-side combined)
    feeding a HASH join on the correlation key — never a nested-loop join
    against a multi-row side, never a cartesian product. The only
    nested-loop allowed is the 1-row guard broadcast (its build side is a
    SinglePartition global aggregate)."""
    df = ctx.sql(
        """SELECT COUNT(*) AS n FROM lineitem
           WHERE l_linenumber NOT IN (SELECT o_orderkey % 7 FROM orders
                                      WHERE o_orderkey = l_orderkey)"""
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # correlation joins are hash joins (broadcast at this SF; AQE degrades
    # to shuffled-hash on a huge key NDV — either is a hash join)
    assert "HashJoin" in plan
    assert "LeftAnti" in plan
    # the per-key stats aggregate is partial+final (map-side combined)
    assert "partial_count" in plan
    # every BroadcastNestedLoopJoin is the 1-row guard broadcast: its
    # build side must be a global (SinglePartition) aggregate
    if "BroadcastNestedLoopJoin" in plan:
        assert "SinglePartition" in plan


def test_ir_roundtrip_new_nodes(ctx):
    """GuardCond / CorrScalarCond / expression-key BaseKeysQuery serialize
    through to_dict/node_from_dict (plan-cache key contract)."""
    from pysparkline import ir
    from pysparkline.sqlfront import parse_sql

    spec = parse_sql(
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
             AND l_extendedprice > ALL (SELECT o_totalprice / 400
                                        FROM orders
                                        WHERE o_totalprice < 100000)
             AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = lineitem.l_partkey)
           GROUP BY l_returnflag""",
        time_col="l_shipdate",
        fact_table="lineitem",
        star=ctx.star,
    )
    assert isinstance(spec, ir.SemiJoinQuery)
    assert len(spec.arms) == 1 and spec.arms[0].anti
    assert len(spec.guards) == 2  # NOT IN guard + ALL guard
    assert len(spec.corr_scalars) == 1
    assert spec.corr_scalars[0].inner_keys == ["l_partkey"]
    assert not spec.corr_scalars[0].left_join  # AVG leaf, not count-class
    rt = ir.node_from_dict(spec.to_dict())
    assert rt.to_dict() == spec.to_dict()


def test_explain_rewrite_new_conjuncts(ctx):
    txt = ctx.explain_rewrite(
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
             AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = lineitem.l_partkey)
           GROUP BY l_returnflag"""
    )
    assert "left_anti" in txt
    assert "guard 0: broadcast 1-row aggregate bundle" in txt
    assert "correlated scalar 0: decorrelated GROUP BY (l_partkey)" in txt
    assert "row grain" in txt


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


def test_quantified_any_nonequi_residual_arm(ctx, duck):
    """Round 11: WHERE-side correlated ANY with a non-equi residual
    rewrites to an EXISTS-style SEMI arm with the comparison in the join
    condition (`x > ANY(... equi AND residual)` = exists a matched row
    with x > item) — the per-key bundle cannot precompute over a
    residual-filtered set."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag, COUNT(*) AS n
           FROM lineitem
           WHERE l_extendedprice > ANY (
               SELECT o.o_totalprice / 8 FROM orders o
               WHERE o.o_orderkey = lineitem.l_orderkey
                 AND o.o_totalprice < lineitem.l_extendedprice * 40)
           GROUP BY l_returnflag ORDER BY flag""",
        backing="semijoin[flat<-base[orders]]",
    )


def test_quantified_all_nonequi_residual_arm(ctx, duck):
    """`x <= ALL(... residual)` (arriving as NOT + complement ANY) is an
    ANTI arm matching rows where the comparison IS NOT FALSE: any TRUE or
    UNKNOWN member excludes the outer row, the empty matched set keeps it
    — exact ANSI three-valued semantics in one hash anti join."""
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag, COUNT(*) AS n
           FROM lineitem
           WHERE l_quantity <= ALL (
               SELECT o.o_totalprice / 3000 FROM orders o
               WHERE o.o_orderkey = lineitem.l_orderkey
                 AND o.o_totalprice > lineitem.l_quantity * 100)
           GROUP BY l_returnflag ORDER BY flag""",
        backing="semijoin[flat<-anti:base[orders]]",
    )


def test_quantified_noteq_any_residual_and_negation(ctx, duck):
    """<> ANY with a residual (semi arm), and its negation (= ALL: anti
    arm) — expression items re-render over the reserved __sjr aliases.
    FLOOR keeps the item engine-neutral (CAST(double AS INT) rounds in
    DuckDB but truncates in Spark)."""
    _same(
        ctx,
        duck,
        """SELECT l_linestatus AS st, COUNT(*) AS n
           FROM lineitem
           WHERE l_quantity <> ANY (
               SELECT FLOOR(o.o_totalprice) % 50 FROM orders o
               WHERE o.o_orderkey = lineitem.l_orderkey
                 AND o.o_totalprice > lineitem.l_quantity * 1000)
           GROUP BY l_linestatus ORDER BY st""",
        backing="semijoin[flat<-base[orders]]",
    )
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag, COUNT(*) AS n
           FROM lineitem
           WHERE NOT (l_quantity <> ANY (
               SELECT FLOOR(o.o_totalprice) % 100 FROM orders o
               WHERE o.o_orderkey = lineitem.l_orderkey
                 AND o.o_totalprice > lineitem.l_quantity * 500))
           GROUP BY l_returnflag ORDER BY flag""",
        backing="semijoin[flat<-anti:base[orders]]",
    )


def test_corr_scalar_nonequi_residual(ctx, duck):
    """Round 11: correlated SCALAR aggregates with non-equi residuals —
    the per-key GROUP BY cannot absorb an outer-dependent filter, so the
    leaves recompute per DISTINCT (correlation + residual outer column)
    tuple after the residual-conditioned row join
    (ir.CorrScalarCond.row_grain in WHERE serving). AVG/COUNT/SUM/MAX
    leaves, empty matched sets (COUNT reads 0, others NULL-compare-drop),
    and multi-leaf items all vs DuckDB."""
    _same(
        ctx,
        duck,
        """SELECT l_linestatus AS st, COUNT(*) AS n FROM lineitem
           WHERE l_quantity < (
               SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
               WHERE l2.l_partkey = lineitem.l_partkey
                 AND l2.l_linenumber < lineitem.l_linenumber + 2)
           GROUP BY l_linestatus ORDER BY st""",
        backing="semijoin[flat<-corrscalar:flat]",
    )
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem
           WHERE l_linenumber > (
               SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = lineitem.l_partkey
                 AND l2.l_extendedprice > lineitem.l_extendedprice * 50)
           GROUP BY l_returnflag ORDER BY flag""",
        backing="semijoin[flat<-corrscalar:flat]",
    )
    _same(
        ctx,
        duck,
        """SELECT l_linestatus AS st, COUNT(*) AS n FROM lineitem
           WHERE l_extendedprice * 3 > (
               SELECT MAX(l2.l_extendedprice) + SUM(l2.l_quantity)
               FROM lineitem l2
               WHERE l2.l_partkey = lineitem.l_partkey
                 AND l2.l_quantity <= lineitem.l_quantity)
           GROUP BY l_linestatus ORDER BY st""",
        backing="semijoin[flat<-corrscalar:flat]",
    )


def test_corr_not_in_nonequi_residual_arm(ctx, duck):
    """Round 11: correlated NOT IN with a non-equi residual is exactly
    NOT(x = ANY(residual set)) — the quantified ANTI arm whose
    `(x = item) IS NOT FALSE` condition carries the full three-valued
    logic with NO count guard: a NULL member (injected via the item
    CASE) or NULL x matches -> excludes the row; an empty matched set
    keeps it."""
    _same(
        ctx,
        duck,
        """SELECT l_linestatus AS st, COUNT(*) AS n FROM lineitem
           WHERE l_linenumber NOT IN (
               SELECT FLOOR(o.o_totalprice) % 8 FROM orders o
               WHERE o.o_orderkey = lineitem.l_orderkey
                 AND o.o_totalprice > lineitem.l_extendedprice)
           GROUP BY l_linestatus ORDER BY st""",
        backing="semijoin[flat<-anti:base[orders]]",
    )
    _same(
        ctx,
        duck,
        """SELECT l_linestatus AS st, COUNT(*) AS n FROM lineitem
           WHERE l_linenumber NOT IN (
               SELECT CASE WHEN o.o_totalprice > 200000 THEN NULL
                           ELSE FLOOR(o.o_totalprice) % 8 END
               FROM orders o
               WHERE o.o_orderkey = lineitem.l_orderkey
                 AND o.o_totalprice > lineitem.l_extendedprice)
           GROUP BY l_linestatus ORDER BY st""",
        backing="semijoin[flat<-anti:base[orders]]",
    )
    _same(
        ctx,
        duck,
        """SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem
           WHERE l_linenumber NOT IN (
               SELECT FLOOR(o.o_totalprice) FROM orders o
               WHERE o.o_orderkey = lineitem.l_orderkey
                 AND o.o_totalprice > lineitem.l_extendedprice * 9999)
           GROUP BY l_returnflag ORDER BY flag""",
        backing="semijoin[flat<-anti:base[orders]]",
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
