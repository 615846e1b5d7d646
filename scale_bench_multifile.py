"""Multi-file pruning regime benchmark (round 11).

The sf0.1 bench collapses to a handful of byte-floored files, so the
file-manifest / bloom / row-group machinery — the analog of the reference's
per-segment inverted indexes, which its 10G results attribute the
125x/25x/82x/357x wins to (docs/benchmark/BenchMarkDetails.org:165-190) —
had only ever been measured in isolation (scale_probe_manifest.py keep
ratios), never end-to-end in a regime where time partitions hold MANY
byte-floored files. This script measures that regime for real:

1. **Generate** a ~19 GB flattened-scale star by replicating the sf0.1
   testdata fact side (deterministic replica arithmetic, no RNG): each
   replica ``i`` shifts ``l_orderkey``/``o_orderkey`` into a fresh key range
   and perturbs ``l_extendedprice`` by a replica-dependent sub-unit delta.
   Dimensions (customer/supplier/part/nation/region) are shared across
   replicas, so cube grains keep their production cardinalities while the
   fact grows 200x.
2. **Build** the standard TPC-H index over it with a 16 MB byte floor:
   every ship-month partition then holds ~14 z-clustered files, so the
   per-file dimension manifest has real skip opportunities INSIDE time
   partitions (the inverted-index regime), not just across them.
3. **Measure** the 10G-anchor query family — basic_agg, q1,
   ship_date_range, q3, q7, q10, sql_subquery — indexed vs a raw-star twin
   (same Spark, same parquet bytes, no index artifacts): summed executor
   task time (min of 2 fresh lineages per side, after a JIT warm pass),
   scan-row reductions, and the planner's file-manifest keep ratios.

Run:  python scale_bench_multifile.py            # generate+build+measure
Env:  SCALE_DIR (default /root/repo/_scale/sf20) SCALE_REPL (default 200)

Prints one JSON line (also written to SCALE10G.json) with per-query
task-time speedups; the SCALE.md "Round 11" section records the table.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession, functions as F

SCALE_DIR = os.environ.get("SCALE_DIR", "/root/repo/_scale/sf20")
R = int(os.environ.get("SCALE_REPL", "200"))
BASE = os.environ.get("SCALE_BASE", "/root/testdata/sf0.1")
TARGET_FILE_BYTES = int(os.environ.get("SCALE_TARGET_BYTES", str(16 << 20)))

ANCHORS_10G = {  # BASELINE.md "TPC-H 10G" speedup column
    "basic_agg": 13.5, "ship_date_range": 125.0, "sql_subquery": 357.0,
    "q1": 10.0, "q3": 25.3, "q7": 82.0,
}


def get_spark() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "80g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedJobs", "3000")
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )


def generate(spark: SparkSession) -> None:
    """Replicated star at SCALE_DIR (idempotent — marker file commits)."""
    marker = os.path.join(SCALE_DIR, "_GENERATED")
    if os.path.exists(marker):
        return
    os.makedirs(SCALE_DIR, exist_ok=True)
    t0 = time.time()
    rep = F.explode(
        F.sequence(F.lit(0), F.lit(R - 1)).cast("array<long>")
    ).alias("__i")
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    (
        li.select("*", rep)
        .withColumn("l_orderkey", F.col("l_orderkey") * R + F.col("__i"))
        # replica-dependent price perturbation: deterministic, sub-unit, so
        # per-replica aggregates differ while magnitudes stay TPC-H-like
        .withColumn(
            "l_extendedprice",
            F.round(
                F.col("l_extendedprice")
                + ((F.col("__i") * 31 + F.col("l_linenumber")) % 100) / 100.0,
                2,
            ),
        )
        .drop("__i")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "lineitem.parquet"))
    )
    od = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    (
        od.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") * R + F.col("__i"))
        .drop("__i")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "orders.parquet"))
    )
    for t in ("customer", "supplier", "part", "nation", "region"):
        spark.read.parquet(os.path.join(BASE, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(SCALE_DIR, f"{t}.parquet"))
    with open(marker, "w") as fh:
        fh.write(f"R={R} base={BASE} sec={round(time.time() - t0, 1)}\n")
    print(f"generated in {round(time.time() - t0, 1)}s")


def scale_config():
    from pysparkline import tpch

    cfg = tpch.tpch_index_config()
    # the one knob change vs production: a 16 MB byte floor so ~230 MB
    # ship-months split into ~14 z-clustered files each (the multi-file
    # regime under test). Row groups follow at target/8 = 2 MB.
    cfg.target_file_bytes = TARGET_FILE_BYTES
    return cfg


class Meter:
    """Summed executor task time + input rows per job group (bench.py's
    TaskTimeMeter plus inputRecords, for scan-reduction evidence)."""

    def __init__(self, spark):
        self.sc = spark.sparkContext
        self.groups: set = set()

    def group(self, name):
        self.groups.add(name)
        self.sc.setJobGroup(name, name, interruptOnCancel=False)

    def clear(self):
        self.sc.setJobGroup("", "")

    def collect(self):
        import urllib.request

        base, app = self.sc.uiWebUrl, self.sc.applicationId

        def get(p):
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/{p}", timeout=30
            ) as r:
                return json.load(r)

        stages = {}
        for s in get("stages?status=complete"):
            sid = s["stageId"]
            cur = stages.get(sid)
            if cur is None or s["executorRunTime"] > cur[0]:
                stages[sid] = (
                    s["executorRunTime"], s.get("inputRecords", 0),
                    s.get("inputBytes", 0),
                )
        out = {}
        for j in get("jobs"):
            g = j.get("jobGroup")
            if g not in self.groups:
                continue
            ms = rec = byt = 0
            for sid in j.get("stageIds", []):
                t = stages.get(sid)
                if t:
                    ms += t[0]
                    rec += t[1]
                    byt += t[2]
            cur = out.setdefault(g, [0, 0, 0])
            cur[0] += ms
            cur[1] += rec
            cur[2] += byt
        return {
            g: {"sec": v[0] / 1000.0, "rows": v[1], "bytes": v[2]}
            for g, v in out.items()
        }


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)

    from pysparkline import tpch
    from pysparkline.session import OlapContext, prep

    prep(spark)
    t0 = time.time()
    idx = tpch.build_or_load_index(
        spark, SCALE_DIR,
        cache_root=os.path.join(SCALE_DIR, "_cache"),
        config=scale_config(),
    )
    build_sec = round(time.time() - t0, 1)
    idx.tune_read_parallelism()
    ctx = OlapContext(spark, idx, fds=tpch.tpch_fds())

    # serve the entry module's own query builders from THIS index
    import __spark_entry__ as e

    e._CTX[os.path.abspath(SCALE_DIR)] = ctx

    # layout evidence
    months = [
        d for d in os.listdir(idx.flat_root()) if d.startswith("__tpart=")
    ]
    fcounts = [
        len([f for f in os.listdir(os.path.join(idx.flat_root(), d))
             if f.endswith(".parquet")])
        for d in months
    ]
    layout = {
        "partitions": len(months),
        "files_total": sum(fcounts),
        "files_per_partition_min": min(fcounts),
        "files_per_partition_max": max(fcounts),
        "flat_rows": idx.manifest["flat"]["rowCount"],
        "flat_bytes_per_row": idx.manifest["flat"].get("bytesPerRow"),
        "build_or_load_sec": build_sec,
    }
    print("layout:", json.dumps(layout))

    qs = e.queries()
    NAMES = ["basic_agg", "q1", "ship_date_range", "q3", "q7", "q10",
             "sql_subquery"]

    # ---- indexed side: min of 2 fresh lineages after one warm pass ------
    m = Meter(spark)
    keep_notes = {}
    for name in NAMES:
        ctx._plan_cache.clear()
        e._DF_CACHE.clear()
        qs[name](spark, SCALE_DIR).collect()  # warm (JIT + planner caches)
        keep_notes[name] = [
            n for n in ctx.query_history[-1].decision.splitlines()
            if "pruned scan" in n or "chose cube" in n or "projection" in n
        ]
        for rep_i in (1, 2):
            ctx._plan_cache.clear()
            e._DF_CACHE.clear()
            df = qs[name](spark, SCALE_DIR)
            m.group(f"ix{rep_i}:{name}")
            df.collect()
            m.clear()
        print(f"ix {name} done")
    tt_ix = m.collect()

    # ---- raw twins: same semantics over the raw star join ---------------
    raw_flat, _ = tpch.flat_star_df(spark, SCALE_DIR)
    REV = F.expr(tpch.DISC_PRICE)
    raw = {
        "basic_agg": lambda: raw_flat.agg(
            F.count(F.lit(1)), F.sum(F.expr(tpch.QTY)), F.sum(REV)),
        "q1": lambda: (
            raw_flat.where(F.col("l_shipdate") < "1998-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.expr(tpch.QTY)), F.sum(F.expr(tpch.PRICE)),
                 F.sum(REV), F.sum(F.expr(tpch.CHARGE)), F.count(F.lit(1)))),
        "ship_date_range": lambda: raw_flat.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        ).agg(F.count(F.lit(1)), F.sum(REV)),
        "q3": lambda: (
            raw_flat.where(
                (F.col("c_mktsegment") == "BUILDING")
                & (F.col("o_orderdate") < "1996-06-01")
                & (F.col("l_shipdate") >= "1996-06-01"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(REV).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "l_orderkey").limit(10)),
        "q7": lambda: (
            raw_flat.where(
                (((F.col("c_nation") == "NATION_1")
                  & (F.col("s_nation") == "NATION_2"))
                 | ((F.col("c_nation") == "NATION_2")
                    & (F.col("s_nation") == "NATION_1")))
                & (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1998-01-01"))
            .groupBy("s_nation", "c_nation", F.year("l_shipdate"))
            .agg(F.sum(REV))),
        "q10": lambda: (
            raw_flat.where(
                (F.col("l_returnflag") == "R")
                & (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-07-01"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "c_nation")
            .agg(F.sum(REV).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "c_custkey").limit(20)),
        "sql_subquery": lambda: (
            raw_flat.where(
                (F.col("l_quantity") > 20)
                & (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1997-01-01"))
            .groupBy("l_linestatus")
            .agg(F.count(F.lit(1)),
                 F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(12,2))")))),
    }
    for name in NAMES:
        raw[name]().collect()  # warm
        for rep_i in (1, 2):
            df = raw[name]()
            m.group(f"raw{rep_i}:{name}")
            df.collect()
            m.clear()
        print(f"raw {name} done")
    tt = m.collect()
    tt.update(tt_ix)

    def best(prefix, name, field):
        vals = [
            tt[f"{prefix}{i}:{name}"][field]
            for i in (1, 2)
            if f"{prefix}{i}:{name}" in tt
        ]
        return min(vals) if vals else None

    result = {
        "metric": "multifile_pruning_regime",
        "replication": R,
        "target_file_bytes": TARGET_FILE_BYTES,
        "layout": layout,
        "queries": {},
        "anchors_10g": ANCHORS_10G,
    }
    for name in NAMES:
        ix_s, raw_s = best("ix", name, "sec"), best("raw", name, "sec")
        ix_r, raw_r = best("ix", name, "rows"), best("raw", name, "rows")
        result["queries"][name] = {
            "tasktime_ix_sec": round(ix_s, 3) if ix_s else None,
            "tasktime_raw_sec": round(raw_s, 3) if raw_s else None,
            "tasktime_speedup_vs_raw": (
                round(raw_s / ix_s, 2) if ix_s and raw_s else None
            ),
            "scan_rows_ix": ix_r,
            "scan_rows_raw": raw_r,
            "scan_reduction_vs_raw": (
                round(raw_r / ix_r, 1) if ix_r and raw_r else None
            ),
            "anchor_10g": ANCHORS_10G.get(name),
            "prune_notes": keep_notes.get(name, []),
        }
    line = json.dumps(result)
    print(line)
    with open("/root/repo/SCALE10G.json", "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
