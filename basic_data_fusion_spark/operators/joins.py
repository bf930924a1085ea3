"""Skew-aware and temporal join operators.

AQE's skew-join splitting (enabled in session defaults) handles
sort-merge skew automatically; the salted operators cover the cases
AQE cannot: broadcast-ineligible skewed equi-joins on clusters without
AQE, and hot-key aggregation skew.

``asof_join`` and ``interval_join`` are temporal joins Spark lacks as
primitives (the reference delegates all joins to its embedded SQL
engine — query/query_secure.py:73-92 — and has no temporal joins at
all; these are scale extensions for event data). Both are built so ONE
shuffle on the equi-key does the work — no O(n·m) theta-join, no
driver-side loop.

Semantics are IDENTICAL to the naive formulations — salt/bucket columns
never leak into results — so each has a differential test against its
naive twin (tests/test_joins.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT = "__salt"


def asof_join(left: DataFrame, right: DataFrame, left_on: str, right_on: str,
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None) -> DataFrame:
    """Backward as-of LEFT join: each left row picks up the columns of the
    single most recent right row with ``right_ts <= left_ts`` for the same
    key (inclusive, like DuckDB/Pandas ``ASOF JOIN``/``merge_asof``).

    Plan shape (the scale story): instead of an inequality join (which
    Catalyst would execute as a broadcast-nested-loop), both sides are
    tagged and unioned, then a single window over ``(key) ORDER BY (ts,
    side)`` carries the latest right-side payload forward with
    ``last(..., ignorenulls=True)``. One shuffle on the key, one
    in-partition sort — the same cost as a sort-merge join, at any scale.
    Right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so
    an exact-tie right row is visible to the left row (>= semantics).

    Rows on the right with duplicate ``(key, ts)`` would make the winner
    nondeterministic; callers should pre-dedupe (see
    ``latest_per_key``-style row_number pruning in the contract query).
    ``right_cols`` defaults to every non-key, non-ts right column.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (right_on, right_ts)]
    overlap = set(left.columns) & set(right_cols)
    if overlap:
        raise ValueError(
            f"asof_join output would duplicate columns {sorted(overlap)}; "
            "rename or restrict right_cols")
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(right_on).alias("__k"), F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"), payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns])
    null_payload = F.lit(None).cast(
        right.select(payload.alias("__r")).schema["__r"].dataType)
    l = left.select(
        F.col(left_on).alias("__k"), F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"), null_payload.alias("__r"), *left.columns)
    w = (Window.partitionBy("__k").orderBy("__t", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l.unionByName(r)
               .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1))
    return matched.select(*left.columns,
                          *[F.col(f"__m.{c}").alias(c) for c in right_cols])


def interval_join(left: DataFrame, right: DataFrame, left_on: str, right_on: str,
                  left_ts: str, right_ts: str, lower_s: float, upper_s: float,
                  strict_lower: bool = True) -> DataFrame:
    """Equi-key + bounded-time-range INNER join: pairs ``(l, r)`` with
    ``l.key == r.key`` and ``r.ts ∈ (l.ts + lower_s, l.ts + upper_s]``
    (lower bound strict by default, so a row never matches itself in a
    self-join at lag 0).

    Plan shape: a plain ``key + range`` predicate would hash-join on the
    key alone and evaluate the range as a residual filter — fine until one
    hot key concentrates a partition. Here both sides ALSO join on a time
    bucket of width ``upper_s - lower_s``: right rows land in bucket
    ``floor(ts/W)``; each left row emits its (≤2) candidate buckets
    ``floor((ts+lower)/W)`` and ``floor((ts+upper)/W)``. The shuffle key
    becomes ``(key, bucket)`` — bounded 2× fan-out of the left side, and a
    hot key spreads over time. The exact range predicate still applies, so
    semantics match the naive join bit-for-bit.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            "interval_join needs disjoint column names (it may be a "
            f"self-join); rename on one side: {sorted(overlap)}")
    width_us = max(int(round((upper_s - lower_s) * 1_000_000)), 1)
    lo_us = int(round(lower_s * 1_000_000))
    up_us = int(round(upper_s * 1_000_000))
    l_us, r_us = F.unix_micros(F.col(left_ts)), F.unix_micros(F.col(right_ts))

    lb = left.withColumn("__bl", F.explode(F.array_distinct(F.array(
        F.floor((l_us + F.lit(lo_us)) / width_us),
        F.floor((l_us + F.lit(up_us)) / width_us)))))
    rb = right.withColumn("__br", F.floor(r_us / width_us))
    lower_pred = (r_us > l_us + F.lit(lo_us)) if strict_lower \
        else (r_us >= l_us + F.lit(lo_us))
    joined = lb.join(rb, (F.col(left_on) == F.col(right_on))
                     & (F.col("__bl") == F.col("__br"))
                     & lower_pred & (r_us <= l_us + F.lit(up_us)), "inner")
    return joined.drop("__bl", "__br")


def salted_join(big: DataFrame, small: DataFrame, big_key: str, small_key: str,
                how: str = "left", salt: int = 8, seed: int = 42) -> DataFrame:
    """Equi-join where ``big`` has skewed key frequencies: big rows get a
    random salt in [0, salt); ``small`` is replicated salt× so every
    (key, salt) bucket finds its match. One hot key now spreads over
    ``salt`` shuffle partitions instead of one straggler task.

    Cost: ``small`` shuffles salt× its size — use only when the small
    side is modest and the skew is real (otherwise prefer broadcast or
    AQE)."""
    big_s = big.withColumn(SALT, (F.rand(seed) * salt).cast("int"))
    small_s = (small.withColumn(SALT, F.explode(F.array(
        *[F.lit(i) for i in range(salt)]))))
    out = big_s.join(small_s.withColumnRenamed(SALT, f"{SALT}_r"),
                     (big_s[big_key] == small_s[small_key])
                     & (big_s[SALT] == F.col(f"{SALT}_r")), how)
    return out.drop(SALT, f"{SALT}_r")


def two_phase_agg(df: DataFrame, keys: list[str], aggs: list[Column],
                  merge_aggs: list[Column], salt: int = 16,
                  seed: int = 42) -> DataFrame:
    """Hot-key aggregation: phase 1 aggregates by (keys, salt) — the hot
    key's rows split across ``salt`` reducers — phase 2 merges the salt
    partials per key.

    ``aggs``: phase-1 aggregate columns (aliased); ``merge_aggs``:
    phase-2 columns combining the phase-1 aliases (e.g. phase 1
    ``F.sum(x).alias("s")``, phase 2 ``F.sum("s").alias("s")``).
    Algebraic aggregates only (sum/count/min/max — not exact distinct)."""
    salted = df.withColumn(SALT, (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*keys, SALT).agg(*aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def skew_report(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Key-skew diagnosis before a join/groupBy: the top-k heaviest keys
    with count and share of total — the number to check against
    `spark.sql.adaptive.skewJoin` thresholds (or to decide salting).
    One aggregation + a tiny top-k sort; the share division is
    integer-derived and deterministic."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.count()
    return (counts.orderBy(F.desc("n_rows"), F.asc(key)).limit(top_k)
            .withColumn("share", F.col("n_rows").cast("double") / F.lit(total)))
