"""QuerySpec — the declarative query-parameter document.

Mirrors the reference's TOML query-parameter round-trip
(reference: query/query_parameters.py:17-231 and query/state/models.py:14-37):
a full query is (tables, demographic filters, behavioral filters, selected
columns, enwiden flag). The spec is the single input to ``PlanBuilder``.

TOML I/O uses stdlib ``tomllib`` for reads and a minimal writer (the
container has no tomli-w); the written document round-trips through
``from_toml`` losslessly.
"""

from __future__ import annotations

import tomllib
from dataclasses import asdict, dataclass, field
from typing import Any

VALID_FILTER_TYPES = {"range", "categorical", "boolean"}


@dataclass
class BehavioralFilter:
    """One phenotypic filter (reference: query/state/models.py:14-37)."""

    table: str
    column: str
    filter_type: str  # 'range' | 'categorical' | 'boolean'
    value: Any  # (lo, hi) | list of values | bool-ish

    def __post_init__(self):
        if self.filter_type not in VALID_FILTER_TYPES:
            raise ValueError(f"filter_type must be one of {VALID_FILTER_TYPES}, got {self.filter_type!r}")


@dataclass
class DemographicFilters:
    """Hub-table filters (reference: query/query_secure.py:101-133)."""

    age_range: tuple[float, float] | None = None
    substudies: list[str] | None = None
    sessions: list[Any] | None = None


@dataclass
class QuerySpec:
    tables: list[str] = field(default_factory=list)  # spoke tables to merge
    demographic: DemographicFilters = field(default_factory=DemographicFilters)
    behavioral: list[BehavioralFilter] = field(default_factory=list)
    # per-table explicit column selection; hub columns auto-included
    selected_columns: dict[str, list[str]] = field(default_factory=dict)
    enwiden: bool = False
    consolidate_baseline: bool = False

    # ---------------- TOML round-trip (S11) ----------------
    def to_toml(self) -> str:
        d = asdict(self)
        lines = ["[query]"]
        lines.append(f"tables = {_toml_list(self.tables)}")
        lines.append(f"enwiden = {str(self.enwiden).lower()}")
        lines.append(f"consolidate_baseline = {str(self.consolidate_baseline).lower()}")
        lines.append("")
        lines.append("[demographic]")
        dg = d["demographic"]
        if dg["age_range"] is not None:
            lines.append(f"age_range = {_toml_list(list(dg['age_range']))}")
        if dg["substudies"]:
            lines.append(f"substudies = {_toml_list(dg['substudies'])}")
        if dg["sessions"]:
            lines.append(f"sessions = {_toml_list(dg['sessions'])}")
        lines.append("")
        for t, cols in self.selected_columns.items():
            lines.append("[[selected]]")
            lines.append(f'table = "{t}"')
            lines.append(f"columns = {_toml_list(cols)}")
            lines.append("")
        for bf in self.behavioral:
            lines.append("[[behavioral]]")
            lines.append(f'table = "{bf.table}"')
            lines.append(f'column = "{bf.column}"')
            lines.append(f'filter_type = "{bf.filter_type}"')
            v = bf.value
            if bf.filter_type == "range":
                lines.append(f"value = {_toml_list(list(v))}")
            elif bf.filter_type == "categorical":
                lines.append(f"value = {_toml_list(list(v))}")
            else:
                lines.append(f"value = {str(bool(v)).lower()}")
            lines.append("")
        return "\n".join(lines)

    @classmethod
    def from_toml(cls, text: str) -> QuerySpec:
        doc = tomllib.loads(text)
        q = doc.get("query", {})
        dg = doc.get("demographic", {})
        demo = DemographicFilters(
            age_range=tuple(dg["age_range"]) if "age_range" in dg else None,
            substudies=list(dg.get("substudies", [])) or None,
            sessions=list(dg.get("sessions", [])) or None,
        )
        behavioral = []
        for b in doc.get("behavioral", []):
            v = b["value"]
            if b["filter_type"] == "range":
                v = tuple(v)
            behavioral.append(BehavioralFilter(b["table"], b["column"], b["filter_type"], v))
        selected = {s["table"]: list(s["columns"]) for s in doc.get("selected", [])}
        return cls(
            tables=list(q.get("tables", [])),
            demographic=demo,
            behavioral=behavioral,
            selected_columns=selected,
            enwiden=bool(q.get("enwiden", False)),
            consolidate_baseline=bool(q.get("consolidate_baseline", False)),
        )


def _toml_list(xs: list) -> str:
    parts = []
    for x in xs:
        if isinstance(x, bool):
            parts.append(str(x).lower())
        elif isinstance(x, (int, float)):
            parts.append(repr(x))
        else:
            parts.append('"' + str(x).replace('"', '\\"') + '"')
    return "[" + ", ".join(parts) + "]"


def validate_spec(spec: QuerySpec, catalog) -> tuple[QuerySpec, list[str]]:
    """Validate an (imported) spec against the live catalog, mirroring the
    reference's import validation (query/query_export.py:184-351): invalid
    pieces are DROPPED with a human-readable warning each — an imported
    spec from a stale dataset degrades gracefully instead of failing the
    whole query. Checks: structural age range (two values, lo < hi),
    spoke tables exist, selected/filtered columns exist in their table's
    schema, behavioral filter types are known.

    Returns (cleaned QuerySpec, warnings). Catalog metadata only — no
    Spark job runs."""
    warnings: list[str] = []

    def table_cols(name: str) -> set[str]:
        return set(catalog.info(name).columns)

    tables = []
    for t in spec.tables:
        if catalog.has_table(t):
            tables.append(t)
        else:
            warnings.append(f"Unknown table '{t}' removed from spec")

    # copy every mutable member so the cleaned spec is independent of the
    # imported one (mutating either afterwards must not leak into the other)
    demo = DemographicFilters(
        age_range=(tuple(spec.demographic.age_range)
                   if spec.demographic.age_range is not None else None),
        substudies=(list(spec.demographic.substudies)
                    if spec.demographic.substudies is not None else None),
        sessions=(list(spec.demographic.sessions)
                  if spec.demographic.sessions is not None else None))
    ar = demo.age_range
    if ar is not None:
        if len(tuple(ar)) != 2:
            warnings.append("Age range must be two values; dropped")
            demo.age_range = None
        elif float(ar[0]) >= float(ar[1]):
            warnings.append("Age range minimum must be less than maximum; dropped")
            demo.age_range = None

    behavioral = []
    for bf in spec.behavioral:
        if not catalog.has_table(bf.table):
            warnings.append(
                f"Filter on unknown table '{bf.table}' dropped")
            continue
        if bf.column not in table_cols(bf.table):
            warnings.append(
                f"Filter on unknown column '{bf.table}.{bf.column}' dropped")
            continue
        behavioral.append(BehavioralFilter(
            table=bf.table, column=bf.column, filter_type=bf.filter_type,
            value=list(bf.value) if isinstance(bf.value, list) else bf.value))

    selected: dict[str, list[str]] = {}
    for t, cols in spec.selected_columns.items():
        if not catalog.has_table(t):
            warnings.append(f"Column selection for unknown table '{t}' dropped")
            continue
        known = table_cols(t)
        kept = [c for c in cols if c in known]
        for c in cols:
            if c not in known:
                warnings.append(f"Unknown column '{t}.{c}' dropped from selection")
        if kept:
            selected[t] = kept

    return QuerySpec(tables=tables, demographic=demo, behavioral=behavioral,
                     selected_columns=selected, enwiden=spec.enwiden,
                     consolidate_baseline=spec.consolidate_baseline), warnings
