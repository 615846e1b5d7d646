"""TPC-H star wiring over the driver's testdata (/root/testdata/sf*/).

Mirrors the reference's test star (StarSchemaBaseTest.scala:176-317,
BaseTest.scala:59-141): fact ``lineitem``; nation/region joined twice with
renamed columns (custnation/custregion, suppnation/suppregion) because star
column names must be globally unique (StarSchemaInfo.scala:127-137). The flat
output matches FIXTURES.md §1's column set where the testdata has the columns.

Numeric exactness: every summed measure is expressed in decimal arithmetic
(``CAST(x AS DECIMAL(p,s))``) so that Spark and the DuckDB oracle compute
**bit-identical** sums regardless of floating-point accumulation order — sums
of doubles are order-dependent across engines, sums of decimals are exact.
Precisions are chosen so no product exceeds DECIMAL(38) in either engine
(Spark would otherwise silently reduce scale and round).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .index import (
    CubeSpec, IndexConfig, MetricSpec, OlapIndex, ProjectionSpec, TopKSpec,
    flatten_star,
)
from .metadata import (
    N_TO_ONE,
    EqualityCondition,
    FunctionalDependency,
    StarRelation,
    StarSchema,
)

# --- canonical measure expressions (shared by index build, queries, oracles) —
QTY = "CAST(l_quantity AS DECIMAL(12,2))"
PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
DISC = "CAST(l_discount AS DECIMAL(4,2))"
TAX = "CAST(l_tax AS DECIMAL(4,2))"
ONE_MINUS_DISC = "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"
ONE_PLUS_TAX = "CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))"
DISC_PRICE = f"CAST(l_extendedprice AS DECIMAL(12,2)) * {ONE_MINUS_DISC}"
CHARGE = f"CAST({DISC_PRICE} AS DECIMAL(18,4)) * {ONE_PLUS_TAX}"
TOTALPRICE = "CAST(o_totalprice AS DECIMAL(12,2))"
ACCTBAL = "CAST(c_acctbal AS DECIMAL(12,2))"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark cannot read
    natively; read nanos as long and convert to microsecond timestamps with
    integer division (epoch-nanos exceed double precision, so no float math).
    The testdata has microsecond precision only, so no information is lost.

    NOTE: sets spark.sql.legacy.parquet.nanosAsLong for the whole session
    (the conf is consulted lazily at scan time, so it cannot be restored
    around this call) — nano-timestamped parquet read elsewhere in the same
    session will also arrive as bigint."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # plain timestamp[us] parquet loads as NTZ; normalize to TIMESTAMP so
        # every downstream operator sees one type. Session tz is pinned to UTC
        # (session.prep), so the instant mapping is deterministic and equals
        # DuckDB's naive-timestamp reading of the same file.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_star_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Star tables with the reference's rename convention applied."""
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return {
        "lineitem": read_table(spark, sf_dir, "lineitem"),
        "orders": read_table(spark, sf_dir, "orders"),
        "customer": read_table(spark, sf_dir, "customer"),
        "supplier": read_table(spark, sf_dir, "supplier"),
        "part": read_table(spark, sf_dir, "part"),
        "custnation": nation.select(
            F.col("n_nationkey").alias("cn_nationkey"),
            F.col("n_name").alias("c_nation"),
            F.col("n_regionkey").alias("cn_regionkey"),
        ),
        "custregion": region.select(
            F.col("r_regionkey").alias("cr_regionkey"),
            F.col("r_name").alias("c_region"),
        ),
        "suppnation": nation.select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("s_nation"),
            F.col("n_regionkey").alias("sn_regionkey"),
        ),
        "suppregion": region.select(
            F.col("r_regionkey").alias("sr_regionkey"),
            F.col("r_name").alias("s_region"),
        ),
    }


def tpch_star(tables: dict[str, DataFrame]) -> StarSchema:
    rel = lambda l, r, lc, rc: StarRelation(  # noqa: E731
        l, r, N_TO_ONE, (EqualityCondition(lc, rc),)
    )
    return StarSchema(
        fact_table="lineitem",
        relations=(
            rel("lineitem", "orders", "l_orderkey", "o_orderkey"),
            rel("lineitem", "supplier", "l_suppkey", "s_suppkey"),
            rel("lineitem", "part", "l_partkey", "p_partkey"),
            rel("orders", "customer", "o_custkey", "c_custkey"),
            rel("customer", "custnation", "c_nationkey", "cn_nationkey"),
            rel("custnation", "custregion", "cn_regionkey", "cr_regionkey"),
            rel("supplier", "suppnation", "s_nationkey", "sn_nationkey"),
            rel("suppnation", "suppregion", "sn_regionkey", "sr_regionkey"),
        ),
        table_columns={t: df.columns for t, df in tables.items()},
    )


def tpch_fds() -> list[FunctionalDependency]:
    """Fixture FDs (BaseTest.scala:40-49 spirit, mapped to testdata columns).

    Round 10 adds the ORDER-KEY dependencies: on the flattened star every
    order attribute is a function of l_orderkey (each flat row belongs to
    exactly one order), so a group-by over (l_orderkey, o_orderdate,
    o_orderpriority, ...) has |orders| groups, not the NDV product — the
    collapse that lets Q3-shaped order-grain aggregations pass the
    maxResultCardinality gate and route to the orderline rollup."""
    return [
        FunctionalDependency("c_nation", "c_region", N_TO_ONE),
        FunctionalDependency("s_nation", "s_region", N_TO_ONE),
        FunctionalDependency("p_brand", "p_type", N_TO_ONE),  # heuristic
        FunctionalDependency("l_orderkey", "o_orderdate", N_TO_ONE),
        FunctionalDependency("l_orderkey", "o_orderpriority", N_TO_ONE),
        FunctionalDependency("l_orderkey", "o_orderstatus", N_TO_ONE),
        FunctionalDependency("l_orderkey", "o_custkey", N_TO_ONE),
        FunctionalDependency("l_orderkey", "c_mktsegment", N_TO_ONE),
        # customer-key dependencies: Q10-shaped customer-grain group-bys
        # have |customers| groups, not the NDV product
        FunctionalDependency("c_custkey", "c_name", N_TO_ONE),
        FunctionalDependency("c_custkey", "c_acctbal", N_TO_ONE),
        FunctionalDependency("c_custkey", "c_nation", N_TO_ONE),
        FunctionalDependency("c_custkey", "c_mktsegment", N_TO_ONE),
    ]


def tpch_index_config() -> IndexConfig:
    """Index grain per FIXTURES.md §3 (tpch_index_task.json.template analog):
    sums of the canonical measures, min/max of quantity and price, HLL sketches
    of the high-cardinality keys, and four small cubes for the headline query
    families."""
    return IndexConfig(
        time_col="l_shipdate",
        metrics=[
            MetricSpec("qty", QTY, "sum"),
            MetricSpec("base_price", PRICE, "sum"),
            MetricSpec("disc_price", DISC_PRICE, "sum"),
            MetricSpec("charge", CHARGE, "sum"),
            MetricSpec("discount", DISC, "sum"),
            MetricSpec("totalprice", TOTALPRICE, "sum"),
            MetricSpec("acctbal", ACCTBAL, "sum"),
            MetricSpec("qty", "l_quantity", "min"),
            MetricSpec("qty", "l_quantity", "max"),
            MetricSpec("price", "l_extendedprice", "min"),
            MetricSpec("price", "l_extendedprice", "max"),
            # raw-double qty sum + non-null count: the avg(l_quantity)
            # serving pair (exact — l_quantity is integer-valued, so double
            # sums are order-independent) for the partkey rollup below
            MetricSpec("qty_raw", "l_quantity", "sum"),
            MetricSpec("qty_raw", "l_quantity", "count"),
            # Q6's forecasting measure (price x discount), decimal-exact
            MetricSpec("disc_rev", f"{PRICE} * {DISC}", "sum"),
        ],
        hll_cols=["o_orderkey", "c_custkey"],
        # approximate-TopN serving maps (TopKSpec): per-cell top-m supplier
        # lineitem counts. m=1024 >= the per-cell supplier NDV at every test
        # SF, so the merge runs in its provably-exact regime (bounds all 0)
        # — the contract the driver oracle pins, like theta's exact-while-
        # small. s_name is deliberately OUTSIDE every cube's grain: the
        # sketch is what makes the query cube-servable at all.
        topk_specs=[TopKSpec("s_name", "count", 1024)],
        # cluster the flat layout on the selective non-time dims (then the
        # correlated order date): each file covers a contiguous
        # (mktsegment, returnflag, o_orderdate) slice, so the per-file
        # dimension manifest prunes whole files for q3's segment selector and
        # q10's returnflag + order-date range — predicates the l_shipdate
        # month partitioning cannot touch (the Druid per-dimension-index
        # analog); row-group stats inside each kept file stay tight on the
        # same columns for free
        # z-order (not lexicographic sort): q3 filters c_mktsegment +
        # o_orderdate, q10 filters l_returnflag + o_orderdate — under a
        # lexicographic sort only the leading column pruned (q10: 1.25x).
        # Interleaved-bit clustering keeps per-file stats selective for all
        # three predicate families at once (index.zvalue_column).
        zorder_cols=["c_mktsegment", "l_returnflag", "o_orderdate"],
        # 32 z-buckets per time partition = 5 interleaved prefix bits of
        # per-file resolution across the three z dims (aligned buckets:
        # q10's flag+date filters keep ~8% of files, q3 ~12% — at scales
        # where months hold 32+ × target_file_bytes). The default 64 MB
        # byte floor (IndexConfig.target_file_bytes) caps the EFFECTIVE
        # count when months are smaller: at bench SF the old fixed count
        # manufactured 1992 × 48 KB files whose per-file reader init was
        # ~100% of flat-query task time (BENCH_r08/VERDICT r8 #1); floored,
        # small months become one z-sorted file each and intra-month
        # pruning moves to parquet row-group/page (column-index) stats.
        files_per_time_partition=32,
        cubes=[
            CubeSpec("flags", ("l_returnflag", "l_linestatus"), "day"),
            CubeSpec(
                "market",
                ("c_mktsegment", "c_nation", "c_region", "o_orderpriority",
                 "o_orderstatus"),
                "month",
            ),
            CubeSpec(
                "nations",
                ("c_nation", "c_region", "s_nation", "s_region", "order_year"),
                "month",
            ),
            # coarsest-rollup routing target (VERDICT r9 #1): the nation-pair
            # family (q5/q7/q8) needs only year ship-time grain — at any SF
            # this rollup saturates near |nations|^2 x years x order_years,
            # orders of magnitude under the month-grain 5-dim cube the
            # planner otherwise reads (95,500 rows for q7's two-pair
            # selector at sf0.1). The planner picks the smallest eligible
            # cube, so adding the coarse grain IS the routing fix.
            CubeSpec(
                "nations_yr",
                ("c_nation", "c_region", "s_nation", "s_region", "order_year"),
                "year",
            ),
            CubeSpec("part", ("p_brand", "p_type", "s_nation"), "month"),
            # order-grain rollup for the Q3 family (round 10): lineitems of
            # one order collapse per ship-month — modest row compression
            # (~1.5-2x) but the table is NARROW (5 columns + one measure vs
            # the wide flat) and dim-SORTED with c_mktsegment leading, so
            # the segment selector prunes row groups the flat's z-order
            # shares with two other dims. measures subset: only the
            # revenue sum — no sketch state at order NDV.
            CubeSpec(
                "orderline",
                ("c_mktsegment", "o_orderdate", "o_orderpriority",
                 "l_orderkey"),
                "month",
                measures=("sum_disc_price",),
            ),
            # per-partkey avg(l_quantity) server for Q17-shaped correlated
            # scalars (VERDICT r9 #4): high-NDV key, so only the two avg
            # partials are materialized (measures subset — no HLL/top-k
            # sketch state per cell)
            CubeSpec(
                "partkey",
                ("l_partkey",),
                "year",
                measures=("sum_qty_raw", "count_qty_raw"),
            ),
            # customer-grain twin for the Q10 family: l_returnflag +
            # o_orderdate LEAD the sort, so q10's selector + date range
            # prune row groups directly; row compression is near 1 but the
            # 8-column sorted rollup beats the wide z-shuffled flat the
            # same way orderline does for q3
            CubeSpec(
                "custline",
                ("l_returnflag", "o_orderdate", "c_custkey", "c_name",
                 "c_acctbal", "c_nation"),
                "month",
                measures=("sum_disc_price",),
            ),
            # tiny measure-value cube for the quantity/discount predicate
            # family (SubQry-with-filters, Q6): dims are the MEASURE value
            # domains (NDV 50 x 11), so the cube saturates at ~|values| x
            # months rows at ANY data size
            CubeSpec(
                "qtyline",
                ("l_linestatus", "l_quantity", "l_discount"),
                "month",
                measures=("sum_base_price", "sum_disc_rev", "sum_qty"),
            ),
        ],
        # narrow row-grain projections (round 10 — the backing cubes can
        # never be): semi-join OUTERS and cardinality-rejected aggregations
        # are row grain, and the wide z-shuffled flat makes them pay
        # column-chunk overhead a narrow sorted copy avoids. li_probe
        # serves Q17-shaped probes (sorted by the correlation key);
        # li_order serves the SubQry-family outers (sorted by the semi-join
        # key, so the anti/semi joins probe sorted data)
        projections=[
            ProjectionSpec(
                "li_probe",
                ("l_partkey", "l_quantity", "l_extendedprice"),
                ("l_partkey",),
            ),
            ProjectionSpec(
                "li_order",
                ("l_orderkey", "l_returnflag", "l_linestatus",
                 "l_quantity", "l_extendedprice"),
                ("l_orderkey",),
            ),
        ],
        partition_granularity="month",
    )


def flat_star_df(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, StarSchema]:
    """(denormalized star + derived order_year, star schema) — FIXTURES.md §1."""
    tables = load_star_tables(spark, sf_dir)
    star = tpch_star(tables)
    return flatten_star(spark, tables, star).withColumn(
        "order_year", F.year("o_orderdate")
    ), star


DEFAULT_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".olap_cache")


def build_or_load_index(
    spark: SparkSession,
    sf_dir: str,
    cache_root: str | None = None,
    config: IndexConfig | None = None,
) -> OlapIndex:
    """Build the TPC-H OLAP index for ``sf_dir`` once; reuse from cache after.

    Cache key = sf_dir + config, so config changes invalidate cleanly.
    ``config`` overrides the default layout (tests pinning fine-slice
    pruning ratios pass a floor-free variant).
    """
    from .index import cached_build_or_load

    def flat_fn():
        flat, _ = flat_star_df(spark, sf_dir)
        return flat

    def star_fn():
        # only evaluated on a cache MISS: a cache-hit load restores the
        # star from the manifest, and eagerly reading the 8 star parquets
        # here just to derive it cost ~4 s of cold-JVM schema inference per
        # load (measured at bench SF)
        return tpch_star(load_star_tables(spark, sf_dir))

    return cached_build_or_load(
        spark,
        sf_dir,
        cache_root or DEFAULT_CACHE_ROOT,
        "tpch",
        config or tpch_index_config(),
        flat_fn,
        star=star_fn,
    )
