"""Differential check: Spark query result vs DuckDB oracle result.

Mirrors (conservatively) the driver's correctness gate: row count + column
names + order-insensitive exact value comparison. Floats are compared
EXACTLY — queries are designed to be bit-deterministic across engines
(raw column values, integer-derived divisions, fixed-point sums), so any
drift here is a real portability bug, not noise.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return float(int(v))  # unify int/float dtype drift (nullable ints)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return None
    return str(v) if not isinstance(v, str) else v


def canonical_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for rec in pdf.itertuples(index=False, name=None):
        canon = tuple(_canon_cell(v) for v in rec)
        # pandas uses NaN for missing in object/float cols alike
        canon = tuple(None if (isinstance(x, float) and math.isnan(x)) else x for x in canon)
        rows.append(canon)
    rows.sort(key=repr)
    return cols, rows


def _numeric_kind(dtype) -> str | None:
    k = getattr(dtype, "kind", None)
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return None


def assert_numeric_kinds_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                               name: str = "?"):
    """The driver's value hash is dtype-sensitive: a BIGINT column on one
    side fetched as float64 on the other (e.g. DuckDB SUM(BIGINT) →
    HUGEINT → float64) hash-mismatches even when every value is equal.
    Catch that class locally: a column may not be integer-kind on one side
    and float-kind on the other. (Columns with NULLs surface as float64 on
    BOTH sides, so the comparison stays symmetric.)"""
    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sk = _numeric_kind(spark_pdf[c].dtype)
        ok = _numeric_kind(oracle_pdf[c].dtype)
        if sk and ok and sk != ok:
            # NULLs on one side force that column to float64, so int-vs-float
            # kind here is a symptom of a VALUE difference (all-equal columns
            # nullify identically on both sides) — fall through and let the
            # value comparison report the real diff instead of misdirecting
            # to "align the oracle CAST".
            if spark_pdf[c].isna().any() or oracle_pdf[c].isna().any():
                continue
            raise AssertionError(
                f"[{name}] numeric dtype-kind mismatch on column {c!r}: "
                f"spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype} — "
                f"the driver's value hash WILL differ; align the oracle CAST")


def assert_df_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "?"):
    assert_numeric_kinds_match(spark_pdf, oracle_pdf, name)
    scols, srows = canonical_rows(spark_pdf)
    ocols, orows = canonical_rows(oracle_pdf)
    assert scols == ocols, f"[{name}] column mismatch: spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), f"[{name}] row count: spark={len(srows)} oracle={len(orows)}"
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, (f"[{name}] row {i} differs:\n  spark : {a}\n  oracle: {b}")
