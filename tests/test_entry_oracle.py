"""Mirror of the driver's correctness gate: every queries() entry with an
oracle must match DuckDB on row count, column names, and (sorted) values.

This is the cTest analog (AbstractTest.scala:127-143 dual-execution check),
with DuckDB instead of a second Spark plan as the oracle.
"""

import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _normalize(rows, columns):
    """Sort columns by name and rows by repr for order-insensitive compare."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [columns[i] for i in idx], out


def _values_close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return False


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns

    if name not in ORACLES:
        # rows-only check (the driver's weaker gate for non-SQL ops)
        assert isinstance(spark_rows, list)
        return

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    _, s_norm = _normalize(spark_rows, spark_cols)
    _, d_norm = _normalize(duck_rows, duck_cols)
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for sv, dv in zip(sr, dr):
            assert _values_close(sv, dv), (
                f"{name}: row {i} differs: spark={sr} oracle={dr}"
            )
