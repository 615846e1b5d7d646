"""Planner: choose the backing (cube / flat / base) for a query and explain it.

This is the PySpark-native replacement for the reference's plan-rewrite engine
(DruidPlanner.scala:29-50 transform stack + DruidQueryCostModel.scala). The
reference pattern-matched Catalyst plans and decided broker-vs-historical; we
match the IR against the index manifest and decide cube-vs-flat-vs-base:

- A **cube** is eligible when every referenced column (dims, filter columns,
  aggregation inputs) is in the cube grain or satisfied by a pre-built metric,
  the query granularity is coarser-or-equal the cube's, and every time interval
  aligns to cube bucket boundaries.
- The **flat** table is eligible when all referenced columns exist in the
  flattened star (this is star-join elimination: JoinTransform.scala's whole
  purpose, achieved here by construction).
- Otherwise the query falls back to a caller-supplied **base** DataFrame
  (the raw star join) — always correct, never fast.

Cardinality bail-out mirrors maxResultCardinality (DefaultSource.scala:212-221):
the estimated result-group count (NDV product collapsed by functional
dependencies, FunctionalDependency.scala:59-83) above the cap rejects
pre-aggregated execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from . import ir, lowering
from .index import OlapIndex
from .lowering import AggLoweringError, Backing
from .metadata import FDGraph


@dataclass
class PlanDecision:
    backing: str  # 'cube' | 'flat' | 'base'
    cube_name: str | None = None
    estimated_groups: float | None = None
    notes: list[str] = field(default_factory=list)

    def pretty(self) -> str:
        head = f"backing={self.backing}" + (
            f" cube={self.cube_name}" if self.cube_name else ""
        )
        if self.estimated_groups is not None:
            head += f" est_groups={int(self.estimated_groups)}"
        return head + "".join(f"\n  - {n}" for n in self.notes)


_AGG_SHAPES = (ir.GroupByQuery, ir.TimeseriesQuery, ir.TopNQuery)


def _query_dims(q: ir.QuerySpec) -> list[ir.DimSpec]:
    if isinstance(q, ir.GroupByQuery):
        return list(q.dimensions)
    if isinstance(q, ir.TopNQuery):
        return [q.dimension]
    return []


def _cube_eligible(
    q: ir.QuerySpec, index: OlapIndex, cube_name: str, notes: list[str]
) -> Backing | None:
    info = index.manifest["cubes"][cube_name]
    cube_dims = set(info["dims"])
    gran = info["granularity"]
    tcol = index.time_col

    def reject(msg: str) -> None:
        notes.append(f"cube {cube_name}: rejected — {msg}")

    if not isinstance(q, _AGG_SHAPES):
        reject("not an aggregate query shape")
        return None

    qgran = getattr(q, "granularity", "all")
    if not lowering.gran_coarser_or_equal(qgran, gran):
        reject(f"query granularity {qgran} finer than cube {gran}")
        return None
    qtz = getattr(q, "granularity_tz", None)
    if qtz not in (None, "UTC", "Etc/UTC"):
        # zone-shifted buckets don't align with the cube's UTC buckets
        reject(f"granularity timeZone {qtz} shifts bucket boundaries")
        return None
    qorigin = getattr(q, "granularity_origin", None)
    if qorigin is not None:
        dur = lowering.duration_seconds(qgran)
        o = lowering.origin_epoch_seconds(qorigin)
        if dur is None or o % dur != 0:
            # an origin off the epoch-aligned grid shifts every boundary
            reject(f"granularity origin {qorigin} shifts bucket boundaries")
            return None

    part_gran = {
        "year": "year", "quarter": "quarter", "month": "month", "day": "day",
        "dayofyear": "day", "weekofyear": "week", "hour": "hour",
        "minute": "minute", "second": "none",
    }
    for d in _query_dims(q):
        if isinstance(d, ir.TimeFormatDim) and d.dimension == tcol:
            # the extracted part must be constant within a cube bucket:
            # year() from a month bucket is fine, day() from month is not
            if getattr(d, "tz", None) not in (None, "UTC", "Etc/UTC"):
                # a zone shift moves bucket boundaries (wall-clock day !=
                # UTC day): pre-aggregated UTC buckets cannot answer it
                reject(f"time-format tz {d.tz} shifts bucket boundaries")
                return None
            if d.is_pattern:
                reject("pattern time-format not supported on pre-agg backing")
                return None
            if not lowering.gran_coarser_or_equal(part_gran.get(d.part, "none"), gran):
                reject(f"time part {d.part} finer than cube granularity {gran}")
                return None
            continue
        if not d.referenced_columns() <= cube_dims:
            reject(f"dimension {sorted(d.referenced_columns())} not in grain")
            return None

    f = getattr(q, "filter", None)
    if f is not None and not f.referenced_columns() <= cube_dims:
        reject(f"filter columns {sorted(f.referenced_columns() - cube_dims)} not in grain")
        return None

    for iv in getattr(q, "intervals", []) or []:
        if not lowering.interval_aligned(iv, gran):
            reject(f"interval {iv} not aligned to {gran} buckets")
            return None

    backing = Backing.cube(index, cube_name)
    aggs, _ = lowering._decompose_avgs(list(getattr(q, "aggregations", [])))
    for a in aggs:
        try:
            lowering._preagg_agg(a, backing)
        except AggLoweringError as e:
            reject(str(e))
            return None
    notes.append(f"cube {cube_name}: eligible (rows={info['rowCount']})")
    return backing


def _time_part_ndv(index: OlapIndex, part: str) -> float:
    """Bucket-count estimate for a time part/granularity over the index's
    time span — year(ts) has ~#years distinct values, not ndv(ts). The
    reference made the same interval-based dampening in its cost model
    (DruidQueryCostModel.scala:622-636 ndv-by-interval)."""
    try:
        lo, hi = index.time_bounds()
    except Exception:
        return float(index.ndv(index.time_col) or 1.0)
    days = max(1.0, (hi - lo).total_seconds() / 86400.0)
    years = hi.year - lo.year + 1
    months = (hi.year - lo.year) * 12 + (hi.month - lo.month) + 1
    per_part = {
        "year": years,
        "quarter": min(4 * years, months),
        "month": months,
        "week": days / 7 + 1,
        "day": days,
        "hour": days * 24,
        "minute": days * 1440,
        "second": days * 86400,
        "dayofyear": 366,
        "weekofyear": 53,
        "none": float(index.ndv(index.time_col) or days),
    }
    dur = lowering.duration_seconds(part)
    if dur is not None:
        return float(max(1.0, days * 86400.0 / dur))
    return float(max(1.0, per_part.get(part, days)))


def estimate_groups(
    q: ir.QuerySpec, index: OlapIndex, fd_graph: FDGraph | None
) -> float | None:
    """NDV-product estimate of the result group count: FD-collapsed column
    NDVs x time-part bucket counts x granularity bucket count."""
    dims = _query_dims(q)
    cols: list[str] = []
    time_factor = 1.0
    tcol = index.time_col
    for d in dims:
        if (
            isinstance(d, ir.TimeFormatDim)
            and d.dimension == tcol
            and not d.is_pattern
        ):
            time_factor *= _time_part_ndv(index, d.part)
        else:
            cols.extend(sorted(d.referenced_columns()))
    gran = getattr(q, "granularity", "all")
    if gran not in ("all",):
        time_factor *= _time_part_ndv(index, gran)
    if not cols:
        return time_factor
    card = {c: float(index.ndv(c) or 1.0) for c in cols}
    if fd_graph is not None:
        return time_factor * fd_graph.estimate_cardinality(cols, card)
    total = time_factor
    for c in dict.fromkeys(cols):
        total *= max(1.0, card[c])
    return total


NON_AGG_MODES = ("push_none", "push_filters", "push_project_and_filters")


def _distinct_skew_buckets(q: ir.QuerySpec, est: float | None, df: DataFrame) -> int:
    """Value-space bucket count for the distinct-agg skew guard, or 1 (off).

    Exact count-distinct over FEW groups is the skew shape AQE cannot fix:
    however Spark plans it, the final distinct-set build for a group lands on
    one reduce task, so a 100 TB scan funnels into ≤ est_groups tasks. When
    the NDV-estimated group count is below the configured shuffle parallelism,
    lowering decomposes the distinct into (keys, hash(x) % n) partials first
    (lowering._two_stage_distinct) — n chosen so groups × n ≈ parallelism."""
    if est is None or not any(
        isinstance(a, ir.DistinctAgg) for a in getattr(q, "aggregations", [])
    ):
        return 1
    try:
        par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        par = 200
    if est >= par:
        return 1
    import math

    return min(par, max(2, math.ceil(par / max(est, 1.0))))


def choose_backing(
    q: ir.QuerySpec,
    index: OlapIndex,
    base_df: DataFrame | None = None,
    fd_graph: FDGraph | None = None,
    max_result_cardinality: float = 1_000_000,
    non_agg_handling: str = "push_project_and_filters",
) -> tuple[Backing, PlanDecision]:
    notes: list[str] = []
    referenced = ir.query_referenced_columns(q)
    flat_cols = index.flat_columns()

    # nonAggregateQueryHandling (DruidRelationInfo.scala:27-32): how much of a
    # non-aggregate query may run against the index. push_none = never;
    # push_filters = only filtering scans; push_project_and_filters = all.
    if isinstance(q, (ir.SelectQuery, ir.SearchQuery)):
        mode = non_agg_handling
        if mode not in NON_AGG_MODES:
            raise ValueError(f"bad non_agg_handling {mode!r}")
        pushable = mode == "push_project_and_filters" or (
            mode == "push_filters" and getattr(q, "filter", None) is not None
        )
        if not pushable:
            notes.append(f"non-agg query not pushed (mode={mode})")
            if base_df is None:
                raise ValueError(
                    f"non_agg_handling={mode} forbids index execution and no "
                    "base DataFrame was supplied"
                )
            return Backing.base(base_df, index.time_col), PlanDecision(
                "base", None, None, notes
            )

    est = None
    if isinstance(q, _AGG_SHAPES):
        est = estimate_groups(q, index, fd_graph)
        if est is not None and est > max_result_cardinality:
            notes.append(
                f"estimated groups {int(est)} > maxResultCardinality "
                f"{int(max_result_cardinality)}: pre-agg rejected"
            )
        else:
            candidates: list[tuple[int, str, Backing]] = []
            for name, info in index.manifest["cubes"].items():
                b = _cube_eligible(q, index, name, notes)
                if b is not None:
                    candidates.append((info["rowCount"], name, b))
            if candidates:
                candidates.sort(key=lambda t: (t[0], t[1]))
                rows, name, backing = candidates[0]
                notes.append(f"chose cube {name} ({rows} rows)")
                return backing, PlanDecision("cube", name, est, notes)

    if referenced <= flat_cols:
        notes.append("flat backing: all referenced columns in flattened star")
        backing = Backing.flat(index)
        n = _distinct_skew_buckets(q, est, backing.df)
        if n > 1:
            backing.distinct_buckets = n
            notes.append(
                f"distinct-agg skew guard: est groups {int(est)} < shuffle "
                f"parallelism — value-space bucketed x{n}"
            )
        return backing, PlanDecision("flat", None, est, notes)

    if base_df is not None:
        notes.append(
            f"fallback to base: columns {sorted(referenced - flat_cols)} not in index"
        )
        backing = Backing.base(base_df, index.time_col)
        n = _distinct_skew_buckets(q, est, backing.df)
        if n > 1:
            backing.distinct_buckets = n
            notes.append(
                f"distinct-agg skew guard: est groups {int(est)} < shuffle "
                f"parallelism — value-space bucketed x{n}"
            )
        return backing, PlanDecision("base", None, est, notes)
    raise ValueError(
        f"query references columns outside the index {sorted(referenced - flat_cols)} "
        "and no base DataFrame was supplied"
    )
