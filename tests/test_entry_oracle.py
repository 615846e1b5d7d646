"""Mirror of the driver's correctness gate: every queries() entry with an
oracle must match DuckDB on row count, column names, TYPED values, and — for
oracles with a top-level ORDER BY — emitted row order.

This is the cTest analog (AbstractTest.scala:127-143 dual-execution check),
with DuckDB instead of a second Spark plan as the oracle. Both sides go
through pandas, the same representation the driver hashes — so an oracle
whose window SUM comes back as DuckDB HUGEINT→float64 while Spark emits
BIGINT fails HERE, not only in the driver (this oracle-typing bug class
shipped three times — r2 ×2, r4 `pack_docs` — because the old mirror
float-coerced values and sorted rows; VERDICT r4 #1).
"""

import datetime
import decimal
import math
import re

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _strip_parens(sql: str) -> str:
    """Remove all balanced-paren content (OVER(ORDER BY..), CTE bodies,
    subqueries) so a remaining ORDER BY is the top-level output order.
    String literals and -- line comments are skipped whole — a paren
    inside '...' or an apostrophe in a comment must not derail the depth
    or quote tracking."""
    out = []
    depth = 0
    in_str = in_comment = False
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if in_comment:
            if ch == "\n":
                in_comment = False
                if depth == 0:
                    out.append(ch)
            i += 1
            continue
        if in_str:
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "-" and i + 1 < n and sql[i + 1] == "-":
            in_comment = True
            i += 2
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif depth == 0:
            out.append(ch)
        i += 1
    return "".join(out)


def _has_toplevel_order_by(sql: str) -> bool:
    return re.search(r"\border\s+by\b", _strip_parens(sql), re.I) is not None


def _type_category(series: pd.Series) -> str:
    """Collapse a pandas column to the category the typed compare enforces.

    int vs float IS the distinction to catch (the HUGEINT→float64 oracle
    class). Dates are one category whether pandas materialized them as
    datetime64 or as object-dtype datetime.date (Spark's toPandas does the
    latter, DuckDB the former — both hash equal at the driver, verified by
    119 green rows spanning both shapes).
    """
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "mM":
        return "datetime"
    # object column: inspect the first non-null value
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return "datetime"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array"
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return "object"
    return "empty"


_CATEGORY_OK = {
    ("decimal", "float"), ("float", "decimal"),
    ("decimal", "decimal"),
    # an all-null / empty column carries no type evidence either way
}


def _categories_compatible(s: str, d: str) -> bool:
    if s == d or "empty" in (s, d):
        return True
    return (s, d) in _CATEGORY_OK


def _canon(v):
    """Canonical scalar for value compare (post type gate)."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day)
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _values_close(a, b):
    if a == b:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _values_close(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return False


def _sort_key(row):
    return repr(row)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)

    if name not in ORACLES:
        # rows-only check (the driver's weaker gate for non-SQL ops)
        assert isinstance(df.collect(), list)
        return

    sdf = df.toPandas()
    ddf = duck.execute(ORACLES[name]).df()

    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch {list(sdf.columns)} vs {list(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), (
        f"{name}: row count {len(sdf)} vs oracle {len(ddf)}"
    )

    cols = sorted(sdf.columns)
    # typed gate: the driver hashes typed values, so an int column on one
    # side and float64 on the other diverges there even when values match
    for c in cols:
        sc, dc = _type_category(sdf[c]), _type_category(ddf[c])
        assert _categories_compatible(sc, dc), (
            f"{name}: column {c!r} type category {sc} (spark) vs {dc}"
            f" (oracle) — the driver's typed hash will diverge"
        )

    s_rows = [
        tuple(_canon(v) for v in row)
        for row in sdf[cols].itertuples(index=False, name=None)
    ]
    d_rows = [
        tuple(_canon(v) for v in row)
        for row in ddf[cols].itertuples(index=False, name=None)
    ]
    ordered = _has_toplevel_order_by(ORACLES[name])
    if not ordered:
        s_rows = sorted(s_rows, key=_sort_key)
        d_rows = sorted(d_rows, key=_sort_key)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, sv, dv in zip(cols, sr, dr):
            assert _values_close(sv, dv), (
                f"{name}: row {i} col {c} differs"
                f" ({'ordered' if ordered else 'sorted'} compare):"
                f" spark={sr} oracle={dr}"
            )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_ordered_oracle_sort_key_is_total(name, duck):
    """Every oracle with a top-level ORDER BY must order totally — or tie
    only on fully-identical rows — because the driver hashes rows in
    emitted order and engines break ties differently (this class shipped
    twice in round 5 alone: select_pushdown, sql_window_rowgrain). Sort-key
    tokens resolve against the result frame (ordinals and output names);
    qualified/computed keys fall back to requiring zero full-row
    duplicates."""
    sql = ORACLES[name]
    if not _has_toplevel_order_by(sql):
        pytest.skip("unordered oracle (sorted compare)")
    low = sql.lower()
    depth = 0
    pos = None
    for i, ch in enumerate(sql):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and low.startswith("order by", i):
            pos = i
    clause = re.split(
        r"\blimit\b|\boffset\b", sql[pos + 8:], flags=re.I
    )[0].strip().rstrip(";")
    toks = [
        re.sub(r"(?i)\s+(asc|desc)\s*$", "", c.strip())
        for c in clause.split(",")
    ]
    ddf = duck.execute(sql.rstrip().rstrip(";")).df()
    cols, unresolved = [], []
    for t in toks:
        if re.fullmatch(r"\d+", t):
            cols.append(ddf.columns[int(t) - 1])
        elif t.strip('`"') in ddf.columns:
            cols.append(t.strip('`"'))
        else:
            unresolved.append(t)
    full_dups = len(ddf) - len(ddf.drop_duplicates())
    if unresolved:
        assert full_dups == 0, (
            f"{name}: sort key {unresolved} not resolvable against the "
            f"output and {full_dups} duplicate rows exist — tie order is "
            "engine-arbitrary"
        )
        return
    key_dups = len(ddf) - len(ddf.drop_duplicates(subset=cols))
    assert key_dups <= full_dups, (
        f"{name}: {key_dups - full_dups} rows tie on ORDER BY {cols} while "
        "differing elsewhere — the driver's ordered hash can flip on "
        "engine tie-break; make the ordering total"
    )
