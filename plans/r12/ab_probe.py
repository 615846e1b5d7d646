"""Headline-stamp A/B probe (VERDICT r11 "Next round" #1).

One fresh-JVM pass that reproduces ONLY the bench measurements the round-11
driver run flagged — index_build_or_load_sec (decomposed into ctx load vs
cache_cubes) plus the headline warm best-of-2 wall times — with the bench's
own calibration discipline, so interleaved runs of two trees (HEAD vs the
r10 baseline `04386dd`) are comparable after normalizing by the calibration
floor. Prints one JSON line.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python plans/r12/ab_probe.py <label>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HEADLINE = [
    "q1", "basic_agg", "ship_date_range", "monthly_revenue", "dim_filters",
    "topn_brand", "q3", "q5", "q7", "q8", "q10",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from pysparkline.session import get_spark

    spark = get_spark(app="pysparkline-ab-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    t0 = time.perf_counter()
    ctx = entry_mod._ctx(spark, sf_dir)
    load_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    ctx.index.cache_cubes()
    cache_sec = time.perf_counter() - t0

    from pysparkline import tpch as _tpch

    def calibration() -> float:
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        df = li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)),
            F.sum(F.expr(_tpch.QTY)),
            F.avg(F.expr(_tpch.DISC)),
        )
        df.collect()
        df.collect()
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t)
        return round(best, 4)

    cal_start = calibration()
    qs = entry_mod.queries()
    times = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # cold
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t)
        times[name] = round(best, 4)
    cal_end = calibration()
    cal = min(cal_start, cal_end)
    total = round(sum(times.values()), 4)
    print(json.dumps({
        "label": label,
        "headline_total": total,
        "headline_normalized": round(total / cal, 3),
        "calibration_used": cal,
        "calibration_start": cal_start,
        "calibration_end": cal_end,
        "index_load_sec": round(load_sec, 3),
        "cache_cubes_sec": round(cache_sec, 3),
        "queries": times,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
