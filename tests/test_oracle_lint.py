"""Lint over every registered oracle SQL: no SUM/AVG over raw DOUBLE columns.

Class history (VERDICT r6 "What's wrong" #1): four shipped driver reds were
oracle-FORMULATION bugs of the same shape — an aggregate over a raw float64
column whose summation order differs between Spark and DuckDB, producing
1-ULP drift the driver's exact value-hash rejects (r2 ``spatial_bounds`` /
``json_props``, r4 ``pack_docs``, r6 ``federated_rev_events``).  The repo
convention (pysparkline/tpch.py:10-44, mirroring the reference's rounding
discipline in AbstractTest.scala:184-190) is: every summed/averaged money or
measure column is cast to DECIMAL first (exact, order-independent) or
explicitly rounded.  The typed+ordered mirror in test_entry_oracle.py cannot
catch this class — its rel_tol 1e-9 passes 1-ULP drift — so this lint kills
it structurally: it walks every ``oracle_sql()`` string, extracts each
SUM(...)/AVG(...) argument (balanced parens), and fails if the argument
references a raw DOUBLE fixture column without a DECIMAL cast or ROUND().
"""

from __future__ import annotations

import re

import __spark_entry__ as entry

# Every DOUBLE/FLOAT column in the driver fixture (verified against the
# parquet schemas at /root/testdata/sf0.001 — see this test's commit).
RAW_DOUBLE_COLS = {
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",   # lineitem
    "o_totalprice",                                            # orders
    "c_acctbal", "s_acctbal", "p_retailprice",                 # dims
    "value",                                                   # events
}

# Integer-valued doubles: TPC-H l_quantity is a whole number (1..50), and a
# sum of integer-valued float64s is EXACT under any summation order until
# 2^53 — provably hash-stable without a cast.  Verified against the fixture
# by test_integer_valued_exemption_holds below.
INTEGER_VALUED = {"l_quantity"}

_AGG_OPEN = re.compile(r"\b(SUM|AVG)\s*\(", re.IGNORECASE)
# Safe INSIDE the aggregate arg: decimal cast (exact, order-independent),
# integer cast (integer sums are exact), or pre-rounding.
_SAFE = re.compile(
    r"DECIMAL|\bROUND\s*\(|AS\s+(BIGINT|INT(EGER)?|SMALLINT|TINYINT)\b",
    re.IGNORECASE,
)
# Safe as an ENCLOSING wrapper around the whole aggregate: the repo's other
# accepted convention (r4 ``sql_window_ma`` precedent) — the aggregate result
# is forced through a decimal/round boundary on BOTH engines before hashing.
# COUNT(...) wrapping is also safe: COUNT(sum(x)) only counts non-null frame
# rows; the double VALUE never reaches the output.
_WRAP_OPEN = re.compile(r"\b(CAST|ROUND|COUNT)\s*\(", re.IGNORECASE)


def _balanced_span(sql: str, open_end: int) -> int:
    depth, i = 1, open_end
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    return i


def _agg_args(sql: str):
    """Yield (func, arg_text, offset) for each SUM(/AVG( with balanced parens."""
    for m in _AGG_OPEN.finditer(sql):
        end = _balanced_span(sql, m.end())
        yield m.group(1).upper(), sql[m.end() : end - 1], m.start()


def _wrapped_safe(sql: str, agg_start: int) -> bool:
    """True if the aggregate at ``agg_start`` sits inside a CAST(..AS DECIMAL)
    or ROUND(..) span."""
    for m in _WRAP_OPEN.finditer(sql):
        if m.start() >= agg_start:
            break
        end = _balanced_span(sql, m.end())
        if end <= agg_start:
            continue
        span = sql[m.start() : end]
        if m.group(1).upper() in ("ROUND", "COUNT") or re.search(
            r"DECIMAL", span, re.IGNORECASE
        ):
            return True
    return False


def _raw_double_refs(arg: str):
    """Raw double columns referenced as whole words in an aggregate arg."""
    words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", arg))
    return sorted(words & (RAW_DOUBLE_COLS - INTEGER_VALUED))


def test_no_sum_avg_over_raw_double_columns():
    bad = []
    for name, sql in entry.oracle_sql().items():
        for func, arg, off in _agg_args(sql):
            refs = _raw_double_refs(arg)
            if refs and not _SAFE.search(arg) and not _wrapped_safe(sql, off):
                bad.append(
                    f"{name}: {func}({arg.strip()[:80]}...) at char {off} "
                    f"references raw DOUBLE column(s) {refs} without a "
                    f"DECIMAL cast or ROUND() — float64 sums are "
                    f"summation-order-dependent across engines and can "
                    f"never hash-match the driver's exact compare"
                )
    assert not bad, (
        "oracle-formulation lint (tpch.py:10-44 convention):\n"
        + "\n".join(bad)
    )


def test_integer_valued_exemption_holds():
    """The INTEGER_VALUED exemption is a property of the fixture, not a
    hope: verify every exempted column really is whole-valued (then float64
    summation is exact under any order up to 2^53)."""
    duckdb = __import__("duckdb")
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet' "
        "WHERE l_quantity != floor(l_quantity)"
    ).fetchone()[0]
    assert n == 0, "l_quantity is no longer integer-valued — drop the exemption"


def test_lint_catches_the_r6_federated_bug():
    """Regression meta-test: the exact r6 formulation must be flagged."""
    sql = "SELECT CAST(SUM(l_extendedprice) AS DOUBLE) AS rev FROM lineitem"
    hits = [
        (f, a) for f, a, _ in _agg_args(sql) if _raw_double_refs(a) and not _SAFE.search(a)
    ]
    assert hits, "lint failed to flag SUM over a raw double column"
    # ...and the fixed form passes.
    fixed = (
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) "
        "AS rev FROM lineitem"
    )
    hits = [
        (f, a) for f, a, _ in _agg_args(fixed) if _raw_double_refs(a) and not _SAFE.search(a)
    ]
    assert not hits, f"lint wrongly flagged the decimal-cast form: {hits}"
