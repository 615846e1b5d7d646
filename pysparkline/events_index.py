"""Second OLAP index fixture: the events stream table as a single-table star.

Exists to prove the engine is schema-agnostic — nothing in metadata/index/
planner/lowering knows about TPC-H; this wires the same machinery over a
completely different fact table (event stream, no dimension tree, second
granularity). The reference supported N datasources the same way
(one DruidRelation per registration, DefaultSource.scala:32-194).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import SparkSession

from .index import CubeSpec, IndexConfig, MetricSpec, OlapIndex
from .metadata import StarSchema
from .tpch import DEFAULT_CACHE_ROOT, read_events


def events_star() -> StarSchema:
    return StarSchema("events", relations=())


def events_index_config() -> IndexConfig:
    return IndexConfig(
        time_col="ts",
        metrics=[
            MetricSpec("value", "CAST(value AS DECIMAL(18,6))", "sum"),
            MetricSpec("value", "value", "min"),
            MetricSpec("value", "value", "max"),
        ],
        hll_cols=["user_id"],
        cubes=[
            CubeSpec("types", ("event_type",), "day"),
        ],
        partition_granularity="month",
    )


def build_or_load_events_index(
    spark: SparkSession, sf_dir: str, cache_root: str | None = None
) -> OlapIndex:
    cache_root = cache_root or DEFAULT_CACHE_ROOT
    config = events_index_config()
    key_src = json.dumps(
        {"sf_dir": os.path.abspath(sf_dir), "config": config.to_dict(),
         "fixture": "events"},
        sort_keys=True,
    )
    key = hashlib.sha256(key_src.encode()).hexdigest()[:16]
    out_dir = os.path.join(
        cache_root,
        f"events_{os.path.basename(os.path.normpath(sf_dir))}_{key}",
    )
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        return OlapIndex.load(spark, out_dir)
    flat = read_events(spark, sf_dir)
    return OlapIndex.build(spark, flat, config, out_dir, star=events_star())
