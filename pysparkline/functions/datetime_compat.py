"""spark-datetime compat surface as native Column functions.

The reference recognized the `sparklinedata/spark-datetime` UDF family by
function identity and rewrote each to a Druid time expression
(DateTimeExtractor.scala:28-189: dateTime/withZone/datePlus/dateMinus/
dateIsBefore/dateIsAfter[OrEqual] and the element extractors era ...
secondOfMinute at :163-174). Users of that API can keep their query text: this
module provides every name as a thin wrapper over built-in
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no UDF anywhere, so
every call stays inside WholeStageCodegen and pushes down like any native
expression.

Periods use ISO-8601 strings ("P1D", "P3M", "PT12H") like the original API.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

__all__ = [
    "date_time", "with_zone", "period", "date_plus", "date_minus",
    "date_is_before", "date_is_before_or_equal", "date_is_after",
    "date_is_after_or_equal", "era", "century_of_era", "year_of_era",
    "year_of_century", "year_", "weekyear", "month_of_year",
    "week_of_weekyear", "day_of_year", "day_of_month", "day_of_week",
    "hour_of_day", "minute_of_hour", "second_of_minute", "millis_of_second",
    "time_bucket",
]


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def date_time(c) -> Column:
    """dateTime(col): parse/interpret a column as a timestamp."""
    return _col(c).cast("timestamp")


def with_zone(c, tz: str) -> Column:
    """withZone(dateTime(col), tz): reinterpret instant in a zone."""
    return F.from_utc_timestamp(_col(c).cast("timestamp"), tz)


_PERIOD_RE = re.compile(
    r"^P(?:(?P<y>\d+)Y)?(?:(?P<mo>\d+)M)?(?:(?P<w>\d+)W)?(?:(?P<d>\d+)D)?"
    r"(?:T(?:(?P<h>\d+)H)?(?:(?P<mi>\d+)M)?(?:(?P<s>\d+)S)?)?$"
)


def period(p: str) -> str:
    """Validate an ISO-8601 period string; returns it unchanged (the compat
    analog of the `period(...)` UDF, which built a Period literal)."""
    if not _PERIOD_RE.match(p):
        raise ValueError(f"bad ISO-8601 period {p!r}")
    return p


def _period_interval(p: str) -> Column:
    m = _PERIOD_RE.match(p)
    if not m:
        raise ValueError(f"bad ISO-8601 period {p!r}")
    g = {k: int(v) for k, v in m.groupdict().items() if v}
    months = g.get("y", 0) * 12 + g.get("mo", 0)
    days = g.get("w", 0) * 7 + g.get("d", 0)
    secs = g.get("h", 0) * 3600 + g.get("mi", 0) * 60 + g.get("s", 0)
    return F.expr(f"make_interval(0, {months}, 0, {days}, 0, 0, {secs})")


def date_plus(c, p: str) -> Column:
    """datePlus(dateTime(col), period('P1M'))."""
    return _col(c).cast("timestamp") + _period_interval(p)


def date_minus(c, p: str) -> Column:
    return _col(c).cast("timestamp") - _period_interval(p)


def date_is_before(a, b) -> Column:
    return _col(a).cast("timestamp") < _col(b).cast("timestamp")


def date_is_before_or_equal(a, b) -> Column:
    return _col(a).cast("timestamp") <= _col(b).cast("timestamp")


def date_is_after(a, b) -> Column:
    return _col(a).cast("timestamp") > _col(b).cast("timestamp")


def date_is_after_or_equal(a, b) -> Column:
    return _col(a).cast("timestamp") >= _col(b).cast("timestamp")


# --- element extractors (DateTimeExtractor.scala:163-174 format table) ------


def era(c) -> Column:  # "GG"
    return F.when(F.year(_col(c)) > 0, F.lit(1)).otherwise(F.lit(0))


def century_of_era(c) -> Column:  # "CC"
    return F.floor(F.abs(F.year(_col(c))) / 100).cast("int")


def year_of_era(c) -> Column:
    return F.abs(F.year(_col(c)))


def year_of_century(c) -> Column:  # "yy"
    return (F.abs(F.year(_col(c))) % 100).cast("int")


def year_(c) -> Column:  # "yyyy"
    return F.year(_col(c))


def weekyear(c) -> Column:  # "xxxx" — ISO week-based year
    return F.expr(f"extract(YEAROFWEEK FROM {_sql(c)})").cast("int")


def month_of_year(c) -> Column:  # "MM"
    return F.month(_col(c))


def week_of_weekyear(c) -> Column:  # "ww"
    return F.weekofyear(_col(c))


def day_of_year(c) -> Column:  # "DDD"
    return F.dayofyear(_col(c))


def day_of_month(c) -> Column:  # "dd"
    return F.dayofmonth(_col(c))


def day_of_week(c) -> Column:  # "ee" — ISO: Monday=1..Sunday=7
    return F.expr(f"extract(DAYOFWEEK_ISO FROM {_sql(c)})").cast("int")


def hour_of_day(c) -> Column:  # "HH"
    return F.hour(_col(c))


def minute_of_hour(c) -> Column:  # "mm"
    return F.minute(_col(c))


def second_of_minute(c) -> Column:  # "ss"
    return F.second(_col(c))


def millis_of_second(c) -> Column:
    # extract(MICROSECOND) was removed from Spark's extract (SPARK-31507);
    # derive from the epoch-microsecond remainder instead
    return ((F.unix_micros(_col(c).cast("timestamp")) % 1_000_000) / 1000).cast(
        "int"
    )


def _sql(c) -> str:
    if isinstance(c, Column):
        # Column -> SQL fragment via its toString name; only safe for plain
        # column refs — callers pass names for expression inputs
        name = c._jc.toString()
        return f"`{name}`" if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name) else name
    return f"`{c}`"


def time_bucket(c, granularity: str) -> Column:
    """date_trunc convenience matching index bucket grains."""
    return F.date_trunc(granularity, _col(c).cast("timestamp"))
