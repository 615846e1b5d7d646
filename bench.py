"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>, ...extras}

Per BASELINE.md the anchor is the reference's speedup of index-accelerated vs
raw execution, so alongside per-query times this also reports the raw-scan
(base star join, no index) time for the flagship so the acceleration ratio is
visible: `raw_q1_sec` / `queries.q1`.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


HEADLINE = [
    "q1",
    "basic_agg",
    "ship_date_range",
    "monthly_revenue",
    "dim_filters",
    "topn_brand",
    "q3",
    "q5",
    "q7",
    "q8",
    "q10",
]

# LLM-pipeline operator throughput (documents/embeddings/events tables) —
# reported separately so the headline total stays comparable across rounds
LLM_OPS = [
    "sql_q1",
    "dedup_exact_docs",
    "minhash_pairs_docs",
    "cosine_topk",
    "lsh_cosine_topk",
    "text_stats_docs",
    "lang_id_docs",
    "sessionize_stats",
    "asof_event_purchase",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    from pysparkline.session import get_spark

    spark = get_spark(app="pysparkline-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    t0 = time.perf_counter()
    ctx = entry_mod._ctx(spark, sf_dir)  # builds or loads the index
    # pin cubes in executor memory — the serving posture of the reference
    # (Druid historicals hold segments resident); flat data stays on disk
    ctx.index.cache_cubes()
    index_sec = time.perf_counter() - t0

    qs = entry_mod.queries()

    def timed(name: str) -> float:
        """Warm once, take the best of two measured runs (local-mode job
        scheduling noise is +-30%; min is the stable statistic)."""
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm (JVM/codegen/file-listing caches)
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t)
        return round(best, 4)

    times = {name: timed(name) for name in HEADLINE}
    llm_times = {name: timed(name) for name in LLM_OPS}

    # raw-scan counterparts over the base star join with no index artifacts
    # (the "Spark raw" column of BASELINE.md); ship-date-range was the
    # reference's 125x headline case
    from pysparkline import tpch

    raw_flat, _ = tpch.flat_star_df(spark, sf_dir)

    def raw_q1_df():
        return (
            raw_flat.where(F.col("l_shipdate") < "1998-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.expr(tpch.QTY)),
                F.sum(F.expr(tpch.PRICE)),
                F.sum(F.expr(tpch.DISC_PRICE)),
                F.sum(F.expr(tpch.CHARGE)),
                F.count(F.lit(1)),
            )
        )

    def raw_sdr_df():
        return (
            raw_flat.where(
                (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1997-01-01")
            ).agg(F.count(F.lit(1)), F.sum(F.expr(tpch.QTY)))
        )

    raws = {}
    for key, mk in [("raw_q1_sec", raw_q1_df), ("raw_ship_date_range_sec", raw_sdr_df)]:
        mk().collect()  # warm
        best = float("inf")
        for _ in range(2):  # same best-of-2 statistic as the indexed side
            t = time.perf_counter()
            mk().collect()
            best = min(best, time.perf_counter() - t)
        raws[key] = round(best, 4)
    raw_q1 = raws["raw_q1_sec"]

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "llm_ops": llm_times,
                "llm_ops_total_sec": round(sum(llm_times.values()), 4),
                "sf": sf,
                "index_build_or_load_sec": round(index_sec, 2),
                "raw_q1_sec": raw_q1,
                "raw_ship_date_range_sec": raws["raw_ship_date_range_sec"],
                "q1_speedup_vs_raw": round(raw_q1 / times["q1"], 2)
                if times.get("q1")
                else None,
                "ship_date_range_speedup_vs_raw": round(
                    raws["raw_ship_date_range_sec"] / times["ship_date_range"], 2
                )
                if times.get("ship_date_range")
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
