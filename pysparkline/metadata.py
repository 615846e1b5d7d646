"""Star-schema metadata model: graph, validation, functional dependencies.

Semantics derived from the reference (hbutani/spark-druid-olap):
- star graph build + validation: StarSchemaInfo.scala:127-175 (constraints),
  :354-463 (graph build); unique join path per table, globally-unique column
  names, edges are n-1 / 1-1 equi-joins rooted at the fact table.
- functional dependencies + transitive closure (Floyd-Warshall style) and
  cardinality estimation via connected components:
  metadata/FunctionalDependency.scala:22-29, :59-83, :141-190.

This is a re-design, not a port: pure-Python dataclasses used by the planner
(pysparkline.planner) for star-join matching and cardinality estimation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


N_TO_ONE = "n-1"
ONE_TO_ONE = "1-1"


@dataclass(frozen=True)
class EqualityCondition:
    """One equi-join column pair between two star tables."""

    left_col: str
    right_col: str

    def to_dict(self) -> dict:
        return {"leftCol": self.left_col, "rightCol": self.right_col}

    @staticmethod
    def from_dict(d: dict) -> "EqualityCondition":
        return EqualityCondition(d["leftCol"], d["rightCol"])


@dataclass(frozen=True)
class StarRelation:
    """A directed edge left -> right where right is 'one' side (n-1 or 1-1)."""

    left_table: str
    right_table: str
    relation_type: str  # N_TO_ONE | ONE_TO_ONE
    conditions: tuple[EqualityCondition, ...]

    def __post_init__(self):
        if self.relation_type not in (N_TO_ONE, ONE_TO_ONE):
            raise ValueError(f"bad relation type {self.relation_type!r}")
        if not self.conditions:
            raise ValueError("star relation needs >=1 join condition")

    def to_dict(self) -> dict:
        return {
            "leftTable": self.left_table,
            "rightTable": self.right_table,
            "relationType": self.relation_type,
            "conditions": [c.to_dict() for c in self.conditions],
        }

    @staticmethod
    def from_dict(d: dict) -> "StarRelation":
        return StarRelation(
            d["leftTable"],
            d["rightTable"],
            d["relationType"],
            tuple(EqualityCondition.from_dict(c) for c in d["conditions"]),
        )


class StarSchemaError(ValueError):
    pass


@dataclass
class StarSchema:
    """Fact table + tree of dimension tables.

    ``table_columns`` maps every star table to its column list; used for the
    globally-unique-column-name constraint and for column->table resolution.
    """

    fact_table: str
    relations: tuple[StarRelation, ...]
    table_columns: dict[str, list[str]] = field(default_factory=dict)

    def __post_init__(self):
        self.relations = tuple(self.relations)
        self._validate()
        self._col_to_table = {
            c: t for t, cols in self.table_columns.items() for c in cols
        }

    # -- validation (constraints mirror the reference's StarSchemaInfo) ------
    def _validate(self) -> None:
        tables = {self.fact_table} | {
            t for r in self.relations for t in (r.left_table, r.right_table)
        }
        for t in tables:
            if self.table_columns and t not in self.table_columns:
                raise StarSchemaError(f"no column list for star table {t!r}")
        # globally-unique column names
        if self.table_columns:
            seen: dict[str, str] = {}
            for t in tables:
                for c in self.table_columns[t]:
                    if c in seen:
                        raise StarSchemaError(
                            f"column {c!r} appears in both {seen[c]!r} and {t!r};"
                            " star column names must be globally unique"
                        )
                    seen[c] = t
        # every non-fact table reachable via exactly one parent (unique join path)
        parents: dict[str, str] = {}
        for r in self.relations:
            if r.right_table == self.fact_table:
                raise StarSchemaError("fact table cannot be on the 'one' side")
            if r.right_table in parents:
                raise StarSchemaError(
                    f"table {r.right_table!r} has two parents "
                    f"({parents[r.right_table]!r}, {r.left_table!r}); "
                    "join path must be unique"
                )
            parents[r.right_table] = r.left_table
        # connectivity: walk up from each table to the fact, cycle-checked
        for t in tables - {self.fact_table}:
            seen_path = set()
            cur = t
            while cur != self.fact_table:
                if cur in seen_path:
                    raise StarSchemaError(f"cycle through {cur!r}")
                seen_path.add(cur)
                if cur not in parents:
                    raise StarSchemaError(f"table {cur!r} not connected to fact")
                cur = parents[cur]

    # -- accessors -----------------------------------------------------------
    @property
    def tables(self) -> list[str]:
        out = [self.fact_table]
        for r in self.relations:
            if r.right_table not in out:
                out.append(r.right_table)
        return out

    def table_of(self, col: str) -> str | None:
        return self._col_to_table.get(col)

    def join_order(self) -> list[StarRelation]:
        """Relations ordered so each join's left side is already available."""
        available = {self.fact_table}
        pending = list(self.relations)
        ordered: list[StarRelation] = []
        while pending:
            progressed = False
            for r in list(pending):
                if r.left_table in available:
                    ordered.append(r)
                    available.add(r.right_table)
                    pending.remove(r)
                    progressed = True
            if not progressed:
                raise StarSchemaError("unreachable relations: " + str(pending))
        return ordered

    def is_star_join(self, join_pairs: set[tuple[str, str]]) -> bool:
        """True if every (leftCol, rightCol) pair is an edge condition of this
        star (in either orientation). Mirrors StarSchemaInfo.isStarJoin
        (StarSchemaInfo.scala:215-275) at column granularity."""
        edges: set[tuple[str, str]] = set()
        for r in self.relations:
            for c in r.conditions:
                edges.add((c.left_col, c.right_col))
                edges.add((c.right_col, c.left_col))
        return all(p in edges for p in join_pairs)

    # -- serde ---------------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "factTable": self.fact_table,
                "relations": [r.to_dict() for r in self.relations],
                "tableColumns": self.table_columns,
            }
        )

    @staticmethod
    def from_json(s: str) -> "StarSchema":
        d = json.loads(s)
        return StarSchema(
            d["factTable"],
            tuple(StarRelation.from_dict(r) for r in d["relations"]),
            d.get("tableColumns", {}),
        )


# ---------------------------------------------------------------------------
# Functional dependencies
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FunctionalDependency:
    src: str
    dst: str
    fd_type: str  # N_TO_ONE | ONE_TO_ONE

    def to_dict(self) -> dict:
        return {"src": self.src, "dst": self.dst, "type": self.fd_type}


class FDGraph:
    """Transitive closure of functional dependencies.

    n-1 ∘ n-1 = n-1; 1-1 ∘ 1-1 = 1-1; mixed = n-1. A 1-1 dependency implies
    both directions. Cardinality of a grouping set is estimated as the product
    over "representative" columns: within each set of columns connected by
    dependencies, only the determinant's cardinality counts.
    """

    def __init__(self, fds: list[FunctionalDependency]):
        self.fds = list(fds)
        edges: dict[tuple[str, str], str] = {}

        def add(a: str, b: str, t: str) -> None:
            cur = edges.get((a, b))
            # prefer 1-1 info if both claimed; otherwise keep n-1
            if cur is None or (cur == N_TO_ONE and t == ONE_TO_ONE):
                edges[(a, b)] = t

        for fd in fds:
            add(fd.src, fd.dst, fd.fd_type)
            if fd.fd_type == ONE_TO_ONE:
                add(fd.dst, fd.src, ONE_TO_ONE)
        nodes = sorted({n for e in edges for n in e})
        # Floyd-Warshall-style closure over dependency composition
        changed = True
        while changed:
            changed = False
            for (a, b), t1 in list(edges.items()):
                for (c, d), t2 in list(edges.items()):
                    if b == c and a != d:
                        t = ONE_TO_ONE if (t1 == t2 == ONE_TO_ONE) else N_TO_ONE
                        cur = edges.get((a, d))
                        if cur is None:
                            edges[(a, d)] = t
                            changed = True
        self.edges = edges
        self.nodes = nodes

    def determines(self, a: str, b: str) -> bool:
        return (a, b) in self.edges

    def estimate_cardinality(
        self, cols: list[str], cardinality: dict[str, float]
    ) -> float:
        """Product of per-column NDVs, collapsing FD-connected columns to
        their determinant (FunctionalDependency.scala:59-83 semantics)."""
        remaining = list(dict.fromkeys(cols))
        total = 1.0
        while remaining:
            col = remaining.pop(0)
            determined = [c for c in remaining if self.determines(col, c)]
            # col determines these: they don't multiply cardinality
            determiners = [c for c in remaining if self.determines(c, col)]
            if determiners:
                # a later column determines col: defer to it, but keep the
                # rest of the group in play — stripping `determined` here too
                # would drop a mutually-determining (1-1) group entirely and
                # estimate cardinality 1
                continue
            total *= max(1.0, cardinality.get(col, 1.0))
            remaining = [c for c in remaining if c not in determined]
        return total
