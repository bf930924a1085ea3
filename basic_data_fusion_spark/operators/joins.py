"""Skew-aware join/aggregation utilities.

AQE's skew-join splitting (enabled in session defaults) handles
sort-merge skew automatically; these explicit operators cover the cases
AQE cannot: broadcast-ineligible skewed equi-joins on clusters without
AQE, and hot-key aggregation skew.

Semantics are IDENTICAL to the plain operators — salt never leaks into
results — so each has a differential test against its unsalted twin
(tests/test_joins.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


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
