"""Capture .explain("formatted") for round-12 optimization evidence.

Usage: python plans/r12/capture_plans.py <suffix> [name ...]
Writes plans/r12/<query>_<suffix>.txt for each query (default: the headline
set + subquery family + the slow LLM ops). Explain-only: no query execution
beyond the index build/load the context needs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
DEFAULT = [
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
    "sql_subquery",
    "sql_in_subquery",
    "sql_scalar_subquery",
    "sql_not_in",
    "sql_corr_scalar",
    "minhash_pairs_docs",
    "fuzzy_join_docs",
    "sessionize_stats",
    "lang_id_docs",
    "tfidf_docs",
    "text_stats_docs",
    "sql_q1",
]


def main() -> None:
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pysparkline.session import get_spark

    spark = get_spark(app="pysparkline-plan-capture", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        if name not in qs:
            print(f"skip {name}: not registered")
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(here, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{SUFFIX}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
