"""Reshape layer: enwiden (long→wide pivot) + baseline consolidation.

Re-expresses the reference's pandas enwiden pipeline
(reference: analysis/export.py:24-233) as a single-shuffle Spark pivot:

- The reference loops per-column ``pivot_table(aggfunc='first')`` + merge
  (export.py:86-155). Here ALL dynamic columns pivot in ONE
  ``groupBy(pid).pivot(label).agg(...)`` pass — one shuffle total,
  regardless of column count.
- pandas ``first`` takes the first NON-NULL value in existing row order,
  which is not reproducible on a distributed engine. We require an explicit
  ``order_col`` and use ``min_by(value_when_not_null, order)`` — "first
  non-null by deterministic order" — so results are stable across
  partitionings and match a single-threaded oracle.
- Session labels are normalized driver-side from the bounded distinct-label
  list (reference's hand-written map, export.py:117-148 →
  functions.scalars.normalize_session_label).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import normalize_session_label

_LABEL_COL = "__session_label"


def split_static_dynamic(df: DataFrame, pid: str, candidate_cols: list[str]) -> tuple[list[str], list[str]]:
    """Static column: ≤1 distinct non-null value per participant
    (reference: analysis/export.py:69-83 ``groupby(pid)[col].nunique().max() > 1``).
    One aggregation pass for all candidates."""
    if not candidate_cols:
        return [], []
    per_pid = df.groupBy(pid).agg(
        *[F.countDistinct(c).alias(c) for c in candidate_cols])
    row = per_pid.agg(*[F.max(c).alias(c) for c in candidate_cols]).first()
    static = [c for c in candidate_cols if (row[c] or 0) <= 1]
    dynamic = [c for c in candidate_cols if (row[c] or 0) > 1]
    return static, dynamic


def enwiden(df: DataFrame, pid: str, session_col: str, order_col: str,
            value_cols: list[str] | None = None,
            static_cols: list[str] | None = None,
            sessions: list | None = None,
            auto_split: bool = False) -> DataFrame:
    """Long → wide: one row per participant, ``<col>_<LABEL>`` per dynamic
    column × session label (reference: analysis/export.py:24-169).

    ``auto_split=True`` applies the reference's static/dynamic rule to all
    non-key columns; otherwise ``value_cols`` pivot and ``static_cols`` keep
    their first non-null value.
    """
    others = [c for c in df.columns if c not in (pid, session_col, order_col)]
    if auto_split:
        static_cols, value_cols = split_static_dynamic(df, pid, others)
    else:
        value_cols = value_cols or others
        static_cols = static_cols or []

    if sessions is None:
        sessions = [r[0] for r in
                    df.select(session_col).where(F.col(session_col).isNotNull())
                      .distinct().orderBy(session_col).collect()]
    label_map = {s: normalize_session_label(s) for s in sessions}

    labeled = df.withColumn(_LABEL_COL, _map_expr(F.col(session_col), label_map))

    def first_non_null(c: str):
        # first non-null value by order_col; min_by ignores rows whose
        # ordering expression is null, so null values never win. The value
        # itself breaks order_col ties, making the result a deterministic
        # total order even when the order key is not unique.
        order = F.struct(F.col(order_col), F.col(c))
        return F.min_by(F.col(c), F.when(F.col(c).isNotNull(), order))

    aggs = [first_non_null(c).alias(c) for c in value_cols]
    wide = (labeled.groupBy(pid)
            .pivot(_LABEL_COL, sorted(set(label_map.values())))
            .agg(*aggs))
    # spark names multi-agg pivot columns "<label>_<alias>" → "<col>_<label>"
    if len(value_cols) == 1:
        renames = {lbl: f"{value_cols[0]}_{lbl}" for lbl in set(label_map.values())}
    else:
        renames = {f"{lbl}_{c}": f"{c}_{lbl}"
                   for lbl in set(label_map.values()) for c in value_cols}
    for old, new in renames.items():
        if old in wide.columns:
            wide = wide.withColumnRenamed(old, new)

    if static_cols:
        statics = df.groupBy(pid).agg(
            *[first_non_null(c).alias(c) for c in static_cols])
        wide = wide.join(statics, pid, "left")
    return wide


def _map_expr(col, mapping: dict):
    expr = None
    for raw, label in mapping.items():
        cond = col == F.lit(raw)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(None)) if expr is not None else F.lit(None)


_BAS_RE = re.compile(r"^(?P<base>.+)_BAS(?P<num>\d+)$")


def consolidate_baseline(df: DataFrame) -> DataFrame:
    """Collapse ``X_BAS1/X_BAS2/X_BAS3`` → ``X_BAS``, preferring the
    highest-numbered non-null (reference: analysis/export.py:172-233 —
    priority BAS3 > BAS2 > BAS1)."""
    groups: dict[str, list[tuple[int, str]]] = {}
    for c in df.columns:
        m = _BAS_RE.match(c)
        if m:
            groups.setdefault(m.group("base"), []).append((int(m.group("num")), c))
    out = df
    for base, cols in groups.items():
        ordered = [name for _, name in sorted(cols, reverse=True)]
        out = out.withColumn(f"{base}_BAS", F.coalesce(*[F.col(c) for c in ordered]))
        out = out.drop(*ordered)
    return out


def melt(df: DataFrame, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """Wide→long unpivot — the inverse of :func:`enwiden` (the reference
    only pivots long→wide, analysis/export.py:24-169; a user migrating
    wide uploads back to the canonical long shape needs this direction).

    Uses the native ``Dataset.unpivot`` (Spark's melt): a Generate-style
    expansion with NO shuffle — each input row emits ``len(value_cols)``
    output rows partition-locally, so the operator scales linearly and
    preserves the upstream partitioning of ``id_cols``. Mixed numeric
    widths are fine (Spark casts to the common type); callers that need
    a specific type should cast ``value_cols`` first.
    """
    return df.unpivot([F.col(c) for c in id_cols],
                      [F.col(c) for c in value_cols],
                      var_name, value_name)
