import duckdb
import pytest

# override for insurance sweeps at the driver's SF:
#   PYSPARKLINE_TEST_SF_DIR=/root/testdata/sf0.01 \
#     python -m pytest tests/test_entry_oracle.py -q
import os as _os

SF_DIR = _os.environ.get("PYSPARKLINE_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("pysparkline-tests")
        # one JVM is shared by the WHOLE suite (367 tests): pinned cube
        # caches, broadcast refs, and plan state accumulate, and the 1g
        # default driver heap eventually fails broadcast builds in whatever
        # test lands late in the run (observed twice, different victims)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con


@pytest.fixture(scope="session")
def index(spark):
    from pysparkline import tpch

    return tpch.build_or_load_index(spark, SF_DIR)


@pytest.fixture(scope="session")
def ctx(spark, index):
    from pysparkline import OlapContext, tpch

    return OlapContext(spark, index, fds=tpch.tpch_fds())
