"""Record linkage and time-series regularization operators.

Three pipeline operators the reference has no analogue for (its only
matching is exact equi-key merge; data_handling/merge_strategy.py:24-44)
but that any entity-resolution or telemetry pipeline needs:

- ``blocked_fuzzy_pairs``: approximate string matching (edit distance)
  made scale-safe by blocking — candidate pairs are generated only
  within a block, so the O(n²) comparison never touches the full
  cross product. Same architecture as the MinHash-LSH dedup
  (operators/dedup.py): cheap bucketing first, exact verify second.
- ``latest_snapshot``: changelog -> current-state compaction (the read
  side of a CDC upsert): one row per key, the one with the greatest
  (ts, tiebreak). Expressed as a rank-1 window so Spark collapses it
  to WindowGroupLimit — partial top-1 per partition BEFORE the
  shuffle, so the exchange carries at most one row per (key,
  partition), not the whole history.
- ``gap_fill_daily``: sparse per-key daily series -> dense calendar
  grid with forward-filled values. The grid is generated
  distributively (sequence + explode per key — no driver-side
  calendar), and the fill is one window pass with
  ``last(ignorenulls=True)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(df: DataFrame, id_col: str, text_col: str,
                        block: Column, max_distance: int) -> DataFrame:
    """Candidate pairs ``(id_a, id_b, distance)`` with Levenshtein
    ``distance <= max_distance``, compared only within equal ``block``
    values (``id_a < id_b`` canonical order, distinct ids).

    The block expression is the scale lever: the join shuffles on the
    block key, so worst-case work is Σ|block|² — callers pick a block
    (token, prefix, phonetic code, length band) that keeps blocks small.
    ``F.levenshtein`` evaluates JVM-side inside the join's residual
    filter; no Python crosses the row path. A skewed mega-block is the
    one failure mode — diagnose with joins.skew_report on the block
    column and tighten the block expression (this mirrors the
    LSH-band/verify split in dedup.minhash_dedup_pairs, where the same
    concern is handled by banding).
    """
    keyed = (df.select(F.col(id_col), F.col(text_col), block.alias("__b"))
             .dropDuplicates([id_col]))
    a = keyed.select(F.col(id_col).alias("id_a"),
                     F.col(text_col).alias("text_a"), F.col("__b"))
    b = keyed.select(F.col(id_col).alias("id_b"),
                     F.col(text_col).alias("text_b"),
                     F.col("__b").alias("__b2"))
    return (a.join(b, (F.col("__b") == F.col("__b2"))
                   & (F.col("id_a") < F.col("id_b")), "inner")
            .withColumn("distance", F.levenshtein("text_a", "text_b"))
            .where(F.col("distance") <= max_distance)
            .select("id_a", "id_b", "text_a", "text_b", "distance"))


def latest_snapshot(df: DataFrame, keys: list[str], ts_col: str,
                    tiebreak: str) -> DataFrame:
    """Current state of a changelog: the single latest row per key group,
    latest = max ``(ts_col, tiebreak)`` (the tiebreak column makes the
    winner deterministic when timestamps collide — use the monotonic
    change id). Rank-1 ``row_number`` is planner-recognized: the
    physical plan runs WindowGroupLimit(Partial) before the exchange and
    WindowGroupLimit(Final) after, so shuffle volume is one row per key
    per input partition regardless of history depth.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc(),
                                          F.col(tiebreak).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def scd2_history(df: DataFrame, keys: list[str], ts_col: str, tiebreak: str,
                 change_cols: list[str]) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a changelog: one
    row per *value interval* — consecutive rows whose ``change_cols``
    are unchanged collapse into the earliest row of the run, and each
    surviving row gains ``valid_from`` (its own timestamp),
    ``valid_to`` (the next change's timestamp, NULL while current) and
    ``is_current``.

    Two window passes over the same ``(keys) ORDER BY (ts, tiebreak)``
    spec: pass 1 compares each row's change-struct to its ``lag`` and
    drops no-change rows; pass 2 takes ``lead(ts)`` over the survivors.
    Both windows hash-partition on the same keys, so Catalyst reuses
    one exchange — history depth costs one shuffle total. The
    null-safe struct comparison makes NULL attribute values compare
    stable (NULL -> NULL is "no change").
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(),
                                          F.col(tiebreak).asc())
    cur = F.struct(*[F.col(c) for c in change_cols])
    changed = ~F.lag(cur).over(w).eqNullSafe(cur)  # first row: lag NULL -> True
    hist = df.withColumn("__chg", changed).where(F.col("__chg")).drop("__chg")
    return (hist
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w))
            .withColumn("is_current", F.col("valid_to").isNull()))


def gap_fill_daily(df: DataFrame, key: str, day_col: str, value_col: str,
                   observed_flag: str = "observed") -> DataFrame:
    """Densify a sparse per-key daily series onto each key's own
    [min(day), max(day)] calendar and forward-fill ``value_col``.

    Three stages, all distributed: (1) per-key span via one grouped
    min/max; (2) calendar expansion with ``sequence(min, max, 1 day)``
    + ``explode`` — day count per key is bounded by the span, and the
    rows are generated on executors, never enumerated on the driver;
    (3) LEFT join of observations onto the grid (same key+day shuffle
    partitioning Catalyst reuses from (1)) and one forward-fill window
    ``last(value, ignorenulls=True)``. Day one of every key is observed
    by construction (the span starts at the first observation), so the
    fill never reads before the frame. ``observed_flag`` marks real
    rows vs filled rows for downstream weighting.
    """
    span = df.groupBy(key).agg(F.min(day_col).alias("__d0"),
                               F.max(day_col).alias("__d1"))
    grid = span.select(
        key,
        F.explode(F.sequence(
            F.col("__d0"), F.col("__d1"),
            F.expr("interval 1 day"))).alias(day_col))
    dense = grid.join(df, on=[key, day_col], how="left")
    w = (Window.partitionBy(key).orderBy(day_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (dense
            .withColumn(observed_flag, F.col(value_col).isNotNull())
            .withColumn(value_col,
                        F.last(value_col, ignorenulls=True).over(w)))


def rolling_zscore(df: DataFrame, key: str, ts_col: str, tiebreak: str,
                   value_col: str, lookback: int = 7,
                   min_prior: int = 3, z_threshold: float = 3.0,
                   decimals: int = 6) -> DataFrame:
    """Rolling z-score anomaly detection over an ordered series
    (time-series quality monitoring — the online companion to the
    engine's batch z-score/MAD outlier ops): each observation scores
    against the mean/std of its own trailing window of the previous
    ``lookback`` observations (the current row is EXCLUDED, so an
    outlier never masks itself).

    Determinism: window sums accumulate over fixed-point integer views
    of the value (``round(v·10^decimals)``), the frame order is the
    total order (ts, tiebreak), and mean/variance exit through one
    fixed IEEE expression tree — bit-identical on any engine; rows with
    fewer than ``min_prior`` priors or a degenerate (zero-variance)
    window yield NULL z. One shuffle (the per-key window); no state
    beyond the frame.

    Returns the key/ts/tiebreak/value columns plus (n_prior, z,
    is_anomaly). Overflow headroom: the squared integer view must fit
    BIGINT across the frame — |v|·10^decimals must stay below
    ~3e9/√lookback; pick ``decimals`` accordingly (the z-score loses
    nothing at 4-6 dp for typical metric ranges).
    """
    from ..functions.scalars import half_up_long
    scale = float(10 ** decimals)
    vi = half_up_long(F.col(value_col) * F.lit(scale))
    w = (Window.partitionBy(key)
         .orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
         .rowsBetween(-lookback, -1))
    base = (df.select(key, ts_col, tiebreak, value_col)
            .withColumn("__s1", F.sum(vi).over(w))
            .withColumn("__s2", F.sum(vi * vi).over(w))
            .withColumn("n_prior", F.count(vi).over(w)))
    n = F.col("n_prior").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    mean_i = s1 / n
    # sample variance of the integer view: (S2 − S1²/n)/(n−1)
    var_i = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    x_i = vi.cast("double")
    z = F.when((F.col("n_prior") >= min_prior) & (var_i > F.lit(0.0)),
               (x_i - mean_i) / F.sqrt(var_i))
    return (base
            .withColumn("z", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(F.col("z")) > F.lit(z_threshold),
                                   F.lit(False)))
            .drop("__s1", "__s2"))
