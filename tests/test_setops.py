"""Set-operation acceleration (round 7): top-level UNION [ALL] / INTERSECT /
EXCEPT in ctx.sql lower each arm through the planner independently and
combine the lazy index-served results in one DAG (ir.SetOpQuery,
session._lower_setop). Reference analog: the per-grouping-set Druid-query
union inside one plan, DruidStrategy.scala:74-76 — applied here to
user-written set operations (the BI period-blend staple).

Every shape runs against the DuckDB oracle; backing strings assert the arms
really were index-served (not the spark.sql fallback)."""

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


def _same(ctx, duck, sql, ordered=False):
    got = [tuple(r) for r in ctx.sql(sql).collect()]
    exp = [tuple(r) for r in duck.execute(sql).fetchall()]
    if not ordered:
        got, exp = sorted(got, key=str), sorted(exp, key=str)
    assert len(got) == len(exp), f"{len(got)} rows != {len(exp)}"
    for r1, r2 in zip(got, exp):
        for a, b in zip(r1, r2):
            if isinstance(a, float) or isinstance(b, float):
                assert abs(float(a) - float(b)) <= 1e-6 * max(1.0, abs(float(b)))
            else:
                assert a == b, (r1, r2)
    return got


UNION_ALL = """
SELECT 'early' AS period, l_returnflag AS flag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
FROM lineitem WHERE l_shipdate < DATE '1997-01-01' GROUP BY l_returnflag
UNION ALL
SELECT 'late' AS period, l_returnflag AS flag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
FROM lineitem WHERE l_shipdate >= DATE '1997-01-01' GROUP BY l_returnflag
ORDER BY period, flag
"""


def test_union_all_period_blend(ctx, duck):
    got = _same(ctx, duck, UNION_ALL, ordered=True)
    assert len(got) == 6
    assert ctx.query_history[-1].backing == "setop[cube,cube]"


def test_union_distinct_dedups(ctx, duck):
    sql = """
SELECT l_returnflag AS flag FROM lineitem GROUP BY l_returnflag
UNION
SELECT l_returnflag AS flag FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' GROUP BY l_returnflag
"""
    got = _same(ctx, duck, sql)
    assert len(got) == len(set(got))
    assert ctx.query_history[-1].backing.startswith("setop[")


def test_intersect_and_except(ctx, duck):
    _same(ctx, duck, """
SELECT l_returnflag AS flag FROM lineitem
WHERE l_shipdate < DATE '1997-06-01' GROUP BY l_returnflag
INTERSECT
SELECT l_returnflag AS flag FROM lineitem
WHERE l_shipdate >= DATE '1997-06-01' GROUP BY l_returnflag
""")
    assert ctx.query_history[-1].backing == "setop[cube,cube]"
    _same(ctx, duck, """
SELECT p_type AS t FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
EXCEPT
SELECT p_type AS t FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate < DATE '1996-01-01' GROUP BY p_type
""")
    assert ctx.query_history[-1].backing.startswith("setop[")


def test_nested_setops(ctx, duck):
    sql = """
SELECT l_returnflag AS flag FROM lineitem
WHERE l_shipdate < DATE '1996-01-01' GROUP BY l_returnflag
UNION
SELECT l_returnflag AS flag FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' GROUP BY l_returnflag
UNION ALL
SELECT l_linestatus AS flag FROM lineitem GROUP BY l_linestatus
"""
    _same(ctx, duck, sql)
    b = ctx.query_history[-1].backing
    assert b.count("cube") + b.count("flat") == 3, b


def test_cte_wrapped_setop(ctx, duck):
    sql = """
WITH recent AS (
  SELECT * FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
)
SELECT l_returnflag AS flag, COUNT(*) AS n FROM recent GROUP BY l_returnflag
UNION ALL
SELECT l_linestatus AS flag, COUNT(*) AS n FROM recent GROUP BY l_linestatus
ORDER BY flag, n
"""
    _same(ctx, duck, sql, ordered=True)
    assert ctx.query_history[-1].backing.startswith("setop[")


def test_setop_limit_offset(ctx, duck):
    sql = """
SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_linestatus AS flag, COUNT(*) AS n FROM lineitem GROUP BY l_linestatus
ORDER BY n DESC, flag LIMIT 3 OFFSET 1
"""
    got = _same(ctx, duck, sql, ordered=True)
    assert len(got) == 3
    assert ctx.query_history[-1].backing.startswith("setop[")


def test_nonservable_arm_declines_whole_statement(ctx, duck):
    """One arm outside the surface (a non-star self-join) must decline the
    WHOLE statement to spark.sql — and the fallback answer stays correct."""
    sql = """
SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT a.l_returnflag AS flag, COUNT(*) AS n
FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
GROUP BY a.l_returnflag
"""
    _same(ctx, duck, sql)
    assert ctx.query_history[-1].backing == "sparksql"


def test_mismatched_arm_width_declines(ctx):
    sql = """
SELECT l_returnflag AS flag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_linestatus AS flag FROM lineitem GROUP BY l_linestatus
"""
    from pysparkline.sqlfront import SQLFrontError, parse_sql

    with pytest.raises(SQLFrontError, match="column counts"):
        parse_sql(sql, time_col="l_shipdate", fact_table="lineitem")


def test_constant_postagg_standalone(ctx, duck):
    """The constant select item support (Druid constant post-agg analog)
    works outside set ops too."""
    sql = """
SELECT 'all' AS scope, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
FROM lineitem
"""
    _same(ctx, duck, sql)
    assert ctx.query_history[-1].backing != "sparksql"


def test_unaliased_right_arm_constant_serves(ctx, duck):
    """ANSI: only the left arm names the output, so BI-emitted statements
    that alias constants ONLY in the first arm must still serve (review
    r7 #3 — this shape used to decline to spark.sql)."""
    sql = """
SELECT 'early' AS period, COUNT(*) AS n
FROM lineitem WHERE l_shipdate < DATE '1997-01-01'
UNION ALL
SELECT 'late', COUNT(*)
FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
"""
    _same(ctx, duck, sql)
    assert ctx.query_history[-1].backing != "sparksql"


def test_unaliased_left_arm_constant_still_declines(ctx, duck):
    """The LEFT arm's names ARE the output names — an unaliased constant
    there keeps requiring an alias (falls back, stays correct)."""
    sql = """
SELECT 'early', COUNT(*) AS n
FROM lineitem WHERE l_shipdate < DATE '1997-01-01'
UNION ALL
SELECT 'late' AS period, COUNT(*) AS n
FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
"""
    got = [tuple(r) for r in ctx.sql(sql).collect()]
    assert len(got) == 2
    assert ctx.query_history[-1].backing == "sparksql"


def test_cast_wrapped_constant_renders(ctx, duck):
    """DATE '...' literals parse as CAST-of-VARCHAR-constant; the constant
    post-agg path must render them instead of raising KeyError (review
    r7 #1 — a crash, not a decline: fallback never got the chance)."""
    sql = """
SELECT DATE '1997-01-01' AS cutoff, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
FROM lineitem WHERE l_shipdate < DATE '1997-01-01'
"""
    _same(ctx, duck, sql)


def test_setop_explain_names_both_arms(ctx):
    txt = ctx.explain_rewrite(UNION_ALL)
    assert "SetOpQuery (union all)" in txt
    assert "-- left arm --" in txt and "-- right arm --" in txt
    assert txt.count("backing=cube") == 2
