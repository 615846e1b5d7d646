"""OlapCatalog: N datasources in one session (the reference's model — one
DruidRelation per registration; single-relation queries rewrite, everything
else plans as plain Spark)."""

from __future__ import annotations

import duckdb
import pytest

from pysparkline import tpch
from pysparkline.session import OlapCatalog, OlapContext
from pysparkline.sqlfront import referenced_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def catalog(spark):
    from pysparkline.events_index import build_or_load_events_index

    tctx = OlapContext(
        spark,
        tpch.build_or_load_index(spark, SF_DIR),
        base_tables=tpch.load_star_tables(spark, SF_DIR),
    )
    ectx = OlapContext(
        spark,
        build_or_load_events_index(spark, SF_DIR),
        base_tables={"events": tpch.read_events(spark, SF_DIR)},
    )
    return OlapCatalog(spark, {"tpch": tctx, "events": ectx})


def test_referenced_tables():
    assert referenced_tables(
        "SELECT * FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ) == {"lineitem", "orders"}
    # CTE names are not base tables; tables inside CTE bodies count
    assert referenced_tables(
        "WITH x AS (SELECT * FROM events) SELECT * FROM x JOIN lineitem ON a = b"
    ) == {"events", "lineitem"}
    # subqueries count
    assert referenced_tables(
        "SELECT * FROM (SELECT l_orderkey FROM lineitem) t"
    ) == {"lineitem"}
    # a CTE defined inside a subquery scope must not mask a same-named base
    # table referenced in the OUTER scope (the routing key would under-count
    # and route to a context that doesn't own the table)
    assert referenced_tables(
        "SELECT * FROM (WITH events AS (SELECT 1 AS a) "
        "SELECT * FROM events) t JOIN events e2 ON t.a = e2.user_id"
    ) == {"events"}


def test_starless_fact_name_routes(spark):
    """A star-less context with fact_name and no base tables is routable and
    its fallback can resolve the fact view."""
    from pysparkline.index import IndexConfig, MetricSpec, cached_build_or_load
    from pysparkline.tpch import DEFAULT_CACHE_ROOT, read_events

    idx = cached_build_or_load(
        spark,
        SF_DIR,
        DEFAULT_CACHE_ROOT,
        "events_nostar",
        IndexConfig(time_col="ts", metrics=[MetricSpec("value", "value", "sum")]),
        lambda: read_events(spark, SF_DIR),
        star=None,
        extra_key={"fixture": "events_nostar"},
    )
    assert idx.star is None
    ectx = OlapContext(spark, idx, fact_name="events")
    assert "events" in ectx.owned_tables()
    cat = OlapCatalog(spark, {"ev": ectx})
    out = cat.sql(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    )
    assert out.count() > 0
    # a shape the rewriter declines (window fn) falls back to spark.sql over
    # the registered fact view instead of failing with AnalysisException
    out2 = ectx.sql(
        "SELECT user_id, row_number() OVER (ORDER BY user_id) AS rn "
        "FROM events LIMIT 5"
    )
    assert out2.count() == 5


def test_routes_to_owning_context(catalog):
    out = catalog.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    assert catalog.query_history[-1].backing in ("cube", "flat", "base")
    assert out.count() > 0

    out = catalog.sql(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    )
    assert catalog.query_history[-1].backing in ("cube", "flat", "base")
    assert out.count() > 0


def test_star_join_routes_and_matches_oracle(catalog):
    sql = (
        "SELECT c_mktsegment, count(*) AS n, sum(l_quantity) AS sq "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )
    got = [tuple(r) for r in catalog.sql(sql).collect()]
    assert catalog.query_history[-1].backing != "sparksql"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    assert got == con.execute(sql).fetchall()


def test_cross_datasource_falls_back(catalog):
    """A join across datasources is never index-servable — plain Spark over
    the registered base views answers it (reference contract: DruidStrategy
    returns Nil, Spark plans normally)."""
    out = catalog.sql(
        "SELECT e.event_type, count(*) AS n "
        "FROM events e JOIN orders o ON e.user_id % 100 = o_custkey % 100 "
        "GROUP BY e.event_type"
    )
    assert catalog.query_history[-1].backing == "sparksql"
    assert out.count() > 0


def test_explain_rewrite_routing(catalog):
    txt = catalog.explain_rewrite(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    )
    assert "backing=" in txt
    assert "no rewrite" in catalog.explain_rewrite(
        "SELECT * FROM events JOIN lineitem ON user_id = l_orderkey"
    )
