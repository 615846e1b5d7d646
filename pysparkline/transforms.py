"""IR -> IR rewrite rules, run to fixed point.

Modeled on the reference's QuerySpecTransforms (query/QuerySpecTransforms.scala
:334-343 batches, themselves modeled on Catalyst's RuleExecutor):

- ``add_count_if_no_aggs``      (:104-117) an aggregate query with no
  aggregations gets a row count so the shape stays an aggregation.
- ``groupby_no_dims_to_timeseries`` (:119-142) GroupBy with zero dimensions is
  a Timeseries query.
- ``groupby_to_topn``           (:279-332) GroupBy over one dimension, ordered
  by a single metric with a limit, becomes TopN. Spark lowering is exact, so
  unlike the reference (allowTopNRewrite + threshold gate,
  DruidPlanner.scala:149-159) this is always safe.
- ``merge_bounds``              (:144-178) two Bound filters over the same
  column inside an AND merge into one between-style Bound.
- ``simplify_not``              Not(IsNull) -> IsNotNull etc.
  (util/ExprUtil.scala:192-234 predicate simplification, the fragment that
  survives in IR form — Catalyst does the rest once lowered).
"""

from __future__ import annotations

import re
from dataclasses import replace

from . import ir

MAX_ITERS = 20


# ISO-8601 period granularities (DruidQueryGranularity.scala:42-59 period
# JSON form) normalize to the named grains the lowering understands
_PERIOD_GRAN = {
    "P1Y": "year", "P3M": "quarter", "P1M": "month", "P7D": "week",
    "P1W": "week", "P1D": "day", "PT1H": "hour", "PT1M": "minute",
    "PT1S": "second",
}

_ISO_FIXED = re.compile(
    r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$"
)


def _period_to_seconds(period: str) -> int | None:
    """Fixed-length ISO periods (days/hours/minutes/seconds — no months or
    years, whose length varies) as a bucket width in seconds."""
    m = _ISO_FIXED.match(period)
    if not m or not any(m.groups()):
        return None
    d, h, mi, s = (int(g or 0) for g in m.groups())
    return ((d * 24 + h) * 60 + mi) * 60 + s


def _named_or_duration(period_or_ms) -> str | None:
    """A period string / duration millis value as a canonical granularity:
    a named grain when one exists, else ``duration:<n>s`` for fixed-length
    widths (Druid duration granularity), else None."""
    if isinstance(period_or_ms, (int, float)):
        ms = int(period_or_ms)
        return f"duration:{ms // 1000}s" if ms > 0 and ms % 1000 == 0 else None
    p = str(period_or_ms).upper()
    if p in _PERIOD_GRAN:
        return _PERIOD_GRAN[p]
    secs = _period_to_seconds(p)
    return f"duration:{secs}s" if secs else None


def normalize_granularity(q: ir.QuerySpec) -> ir.QuerySpec:
    g = getattr(q, "granularity", None)
    if isinstance(g, dict):
        # Druid granularity JSON: {"period": "PT15M", "timeZone": ...} or
        # {"duration": <millis>} (DruidQueryGranularity.scala:42-107) —
        # unpack into the canonical grain plus the zone carried on the spec
        origin = g.get("origin")
        if origin is not None and "period" in g:
            # PeriodGranularity with an origin: only the duration lowering
            # branch anchors buckets at the origin, so canonicalize
            # fixed-width periods straight to duration:<n>s (bypassing the
            # named-grain shortcut, whose date_trunc path ignores origins);
            # variable-width periods (months/years) can't be origin-anchored
            secs = _period_to_seconds(str(g["period"]).upper())
            if secs is None:
                raise ValueError(
                    f"granularity origin requires a fixed-width period, got {g!r}"
                )
            norm = f"duration:{secs}s"
        else:
            norm = _named_or_duration(
                g["period"] if "period" in g else g.get("duration", "")
            )
        if norm is None:
            raise ValueError(f"unsupported granularity {g!r}")
        tz = g.get("timeZone")
        return replace(
            q,
            granularity=norm,
            granularity_tz=tz if tz not in (None, "UTC", "Etc/UTC") else None,
            granularity_origin=g.get("origin"),
        )
    if isinstance(g, str) and g.upper().startswith("P"):
        norm = _named_or_duration(g)
        if norm is not None and norm != g:
            return replace(q, granularity=norm)
    return q


def add_count_if_no_aggs(q: ir.QuerySpec) -> ir.QuerySpec:
    if isinstance(q, (ir.GroupByQuery, ir.TimeseriesQuery)) and not q.aggregations:
        return replace(q, aggregations=[ir.CountAgg("count")])
    return q


def groupby_no_dims_to_timeseries(q: ir.QuerySpec) -> ir.QuerySpec:
    if (
        isinstance(q, ir.GroupByQuery)
        and not q.dimensions
        and q.grouping_sets is None
        and q.having is None
        and q.limit_spec is None
        and not q.window_posts
    ):
        return ir.TimeseriesQuery(
            granularity=q.granularity,
            filter=q.filter,
            aggregations=q.aggregations,
            post_aggregations=q.post_aggregations,
            intervals=q.intervals,
            time_output_name=q.time_output_name,
            output_order=q.output_order,
            granularity_tz=q.granularity_tz,
            granularity_origin=q.granularity_origin,
        )
    return q


def groupby_to_topn(q: ir.QuerySpec) -> ir.QuerySpec:
    if not isinstance(q, ir.GroupByQuery):
        return q
    ls = q.limit_spec
    if ls is not None and getattr(ls, "offset", None):
        return q  # TopNQuery has no paging: OFFSET stays on the GroupBy
    cols_ok = ls is not None and ls.limit is not None and (
        len(ls.columns) == 1
        or (
            # (metric, dim ASC) is exactly the TopN lowering's own
            # deterministic order — a 2-column ORDER BY whose tie-break is
            # the single dimension ascending is still TopN-shaped
            len(ls.columns) == 2
            and len(q.dimensions) == 1
            and ls.columns[1].column == q.dimensions[0].out
            and ls.columns[1].direction == "asc"
        )
    )
    if (
        cols_ok
        and len(q.dimensions) == 1
        and q.granularity == "all"
        and q.grouping_sets is None
        and q.having is None
        and not q.window_posts
    ):
        order = ls.columns[0]
        agg_names = {a.name for a in q.aggregations} | {
            p.name for p in q.post_aggregations
        }
        if order.column in agg_names:
            return ir.TopNQuery(
                dimension=q.dimensions[0],
                metric=order.column,
                threshold=ls.limit,
                inverted=(order.direction == "asc"),
                filter=q.filter,
                aggregations=q.aggregations,
                post_aggregations=q.post_aggregations,
                intervals=q.intervals,
                output_order=q.output_order,
            )
    return q


def _merge_bounds_in(f: ir.FilterSpec) -> ir.FilterSpec:
    if isinstance(f, ir.LogicalFilter):
        fields = [_merge_bounds_in(x) for x in f.fields_]
        if f.op == "and":
            by_dim: dict[str, ir.BoundFilter] = {}
            out = []
            for x in fields:
                if (
                    isinstance(x, ir.BoundFilter)
                    and x.ordering == "numeric"
                    and _numeric_bounds(x)
                ):
                    cur = by_dim.get(x.dimension)
                    if cur is None:
                        by_dim[x.dimension] = x
                        out.append(x)
                    else:
                        merged = _merge_two_bounds(cur, x)
                        out[out.index(cur)] = merged
                        by_dim[x.dimension] = merged
                else:
                    out.append(x)
            return out[0] if len(out) == 1 else ir.LogicalFilter("and", out)
        return ir.LogicalFilter(f.op, fields)
    if isinstance(f, ir.NotFilter):
        return ir.NotFilter(_merge_bounds_in(f.field_))
    return f


def _numeric_bounds(f: ir.BoundFilter) -> bool:
    """Only genuinely numeric bounds merge — mixed/str values would compare
    lexicographically (wrong merge) or raise (str vs int)."""
    return all(
        v is None or (isinstance(v, (int, float)) and not isinstance(v, bool))
        for v in (f.lower, f.upper)
    )


def _merge_two_bounds(a: ir.BoundFilter, b: ir.BoundFilter) -> ir.BoundFilter:
    lower, lower_strict = a.lower, a.lower_strict
    if b.lower is not None and (lower is None or b.lower > lower):
        lower, lower_strict = b.lower, b.lower_strict
    elif b.lower is not None and b.lower == lower:
        lower_strict = lower_strict or b.lower_strict
    upper, upper_strict = a.upper, a.upper_strict
    if b.upper is not None and (upper is None or b.upper < upper):
        upper, upper_strict = b.upper, b.upper_strict
    elif b.upper is not None and b.upper == upper:
        upper_strict = upper_strict or b.upper_strict
    return ir.BoundFilter(a.dimension, lower, upper, lower_strict, upper_strict)


def merge_bounds(q: ir.QuerySpec) -> ir.QuerySpec:
    f = getattr(q, "filter", None)
    if f is None:
        return q
    nf = _merge_bounds_in(f)
    return q if nf is f else replace(q, filter=nf)


def _simplify_not_in(f: ir.FilterSpec) -> ir.FilterSpec:
    if isinstance(f, ir.NotFilter):
        inner = _simplify_not_in(f.field_)
        if isinstance(inner, ir.NullFilter):
            return ir.NullFilter(inner.dimension, not inner.is_null)
        if isinstance(inner, ir.NotFilter):
            return inner.field_
        return ir.NotFilter(inner)
    if isinstance(f, ir.LogicalFilter):
        return ir.LogicalFilter(f.op, [_simplify_not_in(x) for x in f.fields_])
    return f


def simplify_not(q: ir.QuerySpec) -> ir.QuerySpec:
    f = getattr(q, "filter", None)
    if f is None:
        return q
    nf = _simplify_not_in(f)
    return q if nf is f else replace(q, filter=nf)


def _combine_spatial_in(f: ir.FilterSpec) -> ir.FilterSpec:
    """Two spatial boxes over the same dimension list inside an AND intersect
    (QuerySpecTransforms.scala:180-223; DruidRelationInfo.scala:142-173)."""
    if isinstance(f, ir.LogicalFilter):
        fields = [_combine_spatial_in(x) for x in f.fields_]
        if f.op == "and":
            by_dims: dict[tuple, ir.SpatialFilter] = {}
            out: list[ir.FilterSpec] = []
            for x in fields:
                if isinstance(x, ir.SpatialFilter):
                    key = tuple(x.dimensions)
                    cur = by_dims.get(key)
                    if cur is None:
                        by_dims[key] = x
                        out.append(x)
                        continue
                    lo = [
                        b if a is None else a if b is None else max(a, b)
                        for a, b in zip(cur.lower, x.lower)
                    ]
                    hi = [
                        b if a is None else a if b is None else min(a, b)
                        for a, b in zip(cur.upper, x.upper)
                    ]
                    merged = ir.SpatialFilter(list(key), lo, hi)
                    out[out.index(cur)] = merged
                    by_dims[key] = merged
                else:
                    out.append(x)
            return out[0] if len(out) == 1 else ir.LogicalFilter("and", out)
        return ir.LogicalFilter(f.op, fields)
    if isinstance(f, ir.NotFilter):
        return ir.NotFilter(_combine_spatial_in(f.field_))
    return f


def combine_spatial(q: ir.QuerySpec) -> ir.QuerySpec:
    f = getattr(q, "filter", None)
    if f is None:
        return q
    nf = _combine_spatial_in(f)
    return q if nf is f else replace(q, filter=nf)


RULES = [
    normalize_granularity,
    merge_bounds,
    combine_spatial,
    simplify_not,
    add_count_if_no_aggs,
    groupby_to_topn,
    groupby_no_dims_to_timeseries,
]


def optimize(q: ir.QuerySpec) -> ir.QuerySpec:
    """Run all rules to fixed point (bounded)."""
    for _ in range(MAX_ITERS):
        before = q.to_dict()
        for rule in RULES:
            q = rule(q)
        if q.to_dict() == before:
            break
    return q
