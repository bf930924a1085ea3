"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in window aggregations (streaming/windows.py) cover
tumbling/sliding/session semantics; this module is the *custom state*
surface — per-key state the engine carries explicitly across
micro-batches, for logic the built-in operators can't express (running
counters here; the same skeleton hosts CDC-style upserts, custom
session logic, or per-key model state).

The reference has no streaming at all (SURVEY.md §2.11); this is a
scale extension for the ``events`` table.

Scale notes:
- State lives in the state store, partitioned by key — one shuffle on
  the key per micro-batch, state size O(distinct keys), not O(rows).
- Arrow batches feed the Python worker (vectorized, not per-row).
- Counters are algebraic and order-independent, so file/batch arrival
  order never changes the final answer (asserted in test_streaming).
- The fixed-point sum uses the same half-away-from-zero rounding as
  ``functions.scalars.fixed_point_sum``, so streaming totals are
  bit-identical to the batch aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, n_values bigint, "
                 "sum_value double, max_ts_us bigint")
STATE_SCHEMA = "n bigint, nv bigint, s bigint, m bigint"


def _round_half_away(y: np.ndarray) -> np.ndarray:
    """ROUND(double, 0) with Spark/DuckDB half-away-from-zero semantics
    (numpy's ``round`` is half-even, which would drift)."""
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5))


def running_user_stats(events: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Per-user running (n_events, n_values, fixed-point sum(value),
    max event-time) maintained in explicit GroupState; each micro-batch
    emits the updated row for every key it touched (update mode).

    The final emission per key equals the batch
    ``groupBy(user_id).agg(count, count(value), fixed_point_sum, max)``
    bit-for-bit — the batch-parity contract tested in test_streaming.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, nv, s, m = state.get if state.exists else (0, 0, 0, None)
        for pdf in pdf_iter:
            n += len(pdf)
            vals = pdf["value"].to_numpy(dtype="float64")
            ok = ~np.isnan(vals)
            nv += int(ok.sum())
            s += int(_round_half_away(vals[ok] * scale).sum())
            if len(pdf):
                batch_max = int(pdf["ts"].astype("int64").max()) // 1000
                m = batch_max if m is None else max(m, batch_max)
        state.update((n, nv, s, m))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "n_values": [nv], "sum_value": [s / scale],
                            "max_ts_us": [m]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


ZSCORE_OUTPUT_SCHEMA = ("user_id bigint, ts_us bigint, event_id bigint, "
                        "value double, n_prior bigint, z double, "
                        "is_anomaly boolean")
ZSCORE_STATE_SCHEMA = "vals array<bigint>"


def streaming_rolling_zscore(events: DataFrame, lookback: int = 7,
                             min_prior: int = 3, z_threshold: float = 3.0,
                             decimals: int = 4) -> DataFrame:
    """Streaming twin of ``operators.linkage.rolling_zscore``: per-key
    online anomaly scoring where the state is ONLY the last ``lookback``
    fixed-point integer views (bounded — O(keys·lookback), independent
    of stream length). Each event scores against its priors and then
    joins the state; emissions are append-mode (one scored row per
    event).

    Bit-parity contract: with chronological delivery, every (n_prior,
    z, is_anomaly) equals the batch operator bit-for-bit — the python
    floats here execute the SAME IEEE expression order as the batch
    JVM tree ((S2 − S1²/n)/(n−1), (x − S1/n)/√var), and the integer
    views use the same half-away-from-zero rounding. Asserted in
    test_streaming.
    """
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    scale = float(10 ** decimals)

    def update(key, pdf_iter, state: GroupState):
        vals = list(state.get[0]) if state.exists else []
        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            vis = _round_half_away(
                pdf["value"].to_numpy(dtype="float64") * scale)
            for ts, eid, v, vi_f in zip(pdf["ts"], pdf["event_id"],
                                        pdf["value"], vis):
                # NULL value: mirror the batch twin's frame semantics —
                # the row still occupies a window slot (rowsBetween
                # counts rows, not values) but contributes nothing to
                # the sums/counts (F.sum/F.count skip NULL vi), and it
                # scores NULL z itself.  int(NaN) would otherwise kill
                # the whole stream.
                vi = None if math.isnan(vi_f) else int(vi_f)
                slots = vals[-lookback:]
                prior = [p for p in slots if p is not None]
                n = len(prior)
                z = None
                if vi is not None and n >= min_prior:
                    nf = float(n)
                    s1 = float(sum(prior))
                    s2 = float(sum(p * p for p in prior))
                    var = (s2 - s1 * s1 / nf) / (nf - 1.0)
                    if var > 0.0:
                        z = (float(vi) - s1 / nf) / math.sqrt(var)
                rows.append((int(key[0]),
                             int(pd.Timestamp(ts).value) // 1000,
                             int(eid),
                             None if vi is None else float(v), n, z,
                             bool(z is not None and abs(z) > z_threshold)))
                vals.append(vi)
                vals = vals[-lookback:]
        state.update((vals,))
        yield pd.DataFrame(rows, columns=["user_id", "ts_us", "event_id",
                                          "value", "n_prior", "z",
                                          "is_anomaly"])

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, ZSCORE_OUTPUT_SCHEMA,
                                    ZSCORE_STATE_SCHEMA, "append",
                                    GroupStateTimeout.NoTimeout))
