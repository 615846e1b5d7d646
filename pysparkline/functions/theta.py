"""Theta-sketch (KMV, k-minimum-values) distinct sketches with set operations.

The reference's type system maps Druid ``thetaSketch`` columns to BinaryType
(DruidRelation column mapping, DruidRelationInfo.scala ``sketchMetric`` link)
and Druid serves union / intersection / difference cardinalities from them
(Apache DataSketches theta family). This module is the Spark-native analog:

- the sketch is a sorted ``array<long>`` of the k smallest *distinct* 63-bit
  hashes of the column values (``xxhash64`` >> 1, NULLs excluded);
- partial sketches merge EXACTLY: the k smallest hashes of a union are among
  the union of each part's k smallest, so cube partials / streaming appends
  re-aggregate to the bit-identical sketch a flat rebuild would produce;
- cardinality estimate: exact ``|s|`` while the sketch is not full, else the
  KMV unbiased estimator ``(k-1) * 2^63 / kth_smallest``;
- set ops follow the theta convention: clip both operands to
  ``theta = min(theta_a, theta_b)``, count surviving members, scale by
  ``2^63 / theta``. While neither sketch is full (theta = 1) the results are
  EXACT distinct counts (modulo 63-bit hash collisions, ~n^2/2^64) — which is
  what makes these oracle-checkable against DuckDB COUNT(DISTINCT).

Everything here is pure JVM Column expressions (collect_set / array_sort /
higher-order functions) — no Python in the hot path, mergeable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# 2^63 as the theta = 1 scale: hashes are 63-bit non-negative longs, so the
# k-th smallest hash / 2^63 is the sampled fraction of hash space. 2^63
# itself overflows int64 — estimator arithmetic happens in double (fine for
# an estimate; the not-full branch stays in exact integers).
_MAXH = float(2**63)


def _hash63(col: Column) -> Column:
    """63-bit non-negative hash of a value; NULL in -> NULL out (so
    collect_set drops NULLs, matching approx_count_distinct semantics).
    xxhash64 maps NULL to the seed rather than NULL, hence the guard."""
    return F.when(
        col.isNotNull(), F.shiftrightunsigned(F.xxhash64(col.cast("string")), 1)
    )


def theta_sketch_agg(col: Column, k: int) -> Column:
    """Aggregate: build the KMV sketch of a raw value column."""
    return F.slice(F.array_sort(F.collect_set(_hash63(col))), 1, k)


def theta_merge_agg(sketch_col: Column, k: int) -> Column:
    """Aggregate: merge partial sketches (cube rows, streaming partials).
    Exact — produces the same array a from-raw build would."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(sketch_col)))),
        1,
        k,
    )


def _theta_hash(sk: Column, k: int) -> Column:
    """The sketch's threshold hash: NULL means "not full" (theta = 1, every
    retained member is exact)."""
    return F.when(F.size(sk) >= k, F.element_at(sk, k))


def theta_estimate(sk: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch. Exact (integer-valued double)
    while the sketch is not full."""
    th = _theta_hash(sk, k)
    return F.when(th.isNull(), F.size(sk).cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_MAXH) / th.cast("double")
    )


def theta_union(a: Column, b: Column, k: int) -> Column:
    """Sketch of the union of the two sketched sets."""
    return F.slice(
        F.array_sort(F.array_distinct(F.concat(a, b))), 1, k
    )


def _clipped_count(members: Column, th: Column) -> Column:
    """|{v in members : v < theta}| with exact long comparisons; th NULL
    means unclipped."""
    return F.when(th.isNull(), F.size(members)).otherwise(
        F.size(F.filter(members, lambda v: v < th))
    )


def _scaled(m: Column, th: Column) -> Column:
    return F.when(th.isNull(), m.cast("double")).otherwise(
        m.cast("double") * F.lit(_MAXH) / th.cast("double")
    )


def _min_theta(a: Column, b: Column, k: int) -> Column:
    tha, thb = _theta_hash(a, k), _theta_hash(b, k)
    # least() with a NULL argument returns the other value (NULL = theta 1 =
    # "no clip", and any real threshold is tighter)
    return F.least(tha, thb)


def theta_intersect_estimate(a: Column, b: Column, k: int) -> Column:
    """|A ∩ B| estimate — the operation HLL cannot do (inclusion-exclusion
    on HLL explodes the error; clipped-sample intersection does not)."""
    th = _min_theta(a, b, k)
    return _scaled(_clipped_count(F.array_intersect(a, b), th), th)


def theta_diff_estimate(a: Column, b: Column, k: int) -> Column:
    """|A \\ B| estimate (Druid thetaSketchSetOp NOT)."""
    th = _min_theta(a, b, k)
    return _scaled(_clipped_count(F.array_except(a, b), th), th)


def theta_union_estimate(a: Column, b: Column, k: int) -> Column:
    return theta_estimate(theta_union(a, b, k), k)


# ---------------------------------------------------------------------------
# Spark-SQL string forms — for IR post-aggregations (ArithmeticPostAgg takes
# expression text), mirroring Druid's thetaSketchEstimate / thetaSketchSetOp
# post-aggs over named sketch aggregations. Same arithmetic as the Column
# helpers above, term for term (Catalyst CSE dedupes the repeated threshold
# subexpression).
# ---------------------------------------------------------------------------


def _theta_hash_sql(s: str, k: int) -> str:
    return f"(CASE WHEN size({s}) >= {k} THEN element_at({s}, {k}) END)"


def estimate_sql(s: str, k: int) -> str:
    th = _theta_hash_sql(s, k)
    return (
        f"(CASE WHEN {th} IS NULL THEN CAST(size({s}) AS DOUBLE) "
        f"ELSE {float(k - 1)!r} * {_MAXH!r} / CAST({th} AS DOUBLE) END)"
    )


def _setop_estimate_sql(members: str, th: str) -> str:
    m = (
        f"(CASE WHEN {th} IS NULL THEN size({members}) "
        f"ELSE size(filter({members}, v -> v < {th})) END)"
    )
    return (
        f"(CASE WHEN {th} IS NULL THEN CAST({m} AS DOUBLE) "
        f"ELSE CAST({m} AS DOUBLE) * {_MAXH!r} / CAST({th} AS DOUBLE) END)"
    )


def intersect_estimate_sql(a: str, b: str, k: int) -> str:
    """|A ∩ B| estimate as Spark SQL text (least() skips NULLs, matching the
    Column form's theta semantics)."""
    th = f"least({_theta_hash_sql(a, k)}, {_theta_hash_sql(b, k)})"
    return _setop_estimate_sql(f"array_intersect({a}, {b})", th)


def diff_estimate_sql(a: str, b: str, k: int) -> str:
    th = f"least({_theta_hash_sql(a, k)}, {_theta_hash_sql(b, k)})"
    return _setop_estimate_sql(f"array_except({a}, {b})", th)


def union_estimate_sql(a: str, b: str, k: int) -> str:
    merged = f"slice(array_sort(array_distinct(concat({a}, {b}))), 1, {k})"
    return estimate_sql(merged, k)
