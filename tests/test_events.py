"""Funnel / retention semantics on crafted event sequences (ordering
edge cases that the sf oracles can't isolate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_fusion_spark.operators.events import funnel_counts, retention_matrix


def _ev(spark, rows):
    return (spark.createDataFrame(rows, "user_id long, event_type string, ts_s string")
            .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s"))


def test_funnel_strict_ordering(spark):
    ev = _ev(spark, [
        (1, "view", "2024-01-01 10:00:00"),     # u1: full path
        (1, "click", "2024-01-01 10:01:00"),
        (1, "purchase", "2024-01-01 10:02:00"),
        (2, "click", "2024-01-01 09:00:00"),    # u2: click BEFORE first view
        (2, "view", "2024-01-01 10:00:00"),
        (3, "view", "2024-01-01 10:00:00"),     # u3: purchase before click
        (3, "purchase", "2024-01-01 10:00:30"),
        (3, "click", "2024-01-01 10:01:00"),
        (4, "purchase", "2024-01-01 10:00:00"), # u4: never entered funnel
    ])
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_retention_matrix_offsets(spark):
    ev = _ev(spark, [
        (1, "view", "2024-01-01 10:00:00"),   # Mon w0 cohort
        (1, "view", "2024-01-10 10:00:00"),   # active w1
        (2, "view", "2024-01-09 10:00:00"),   # w1 cohort
    ])
    got = {(str(r["cohort_week"])[:10], r["week_offset"]): r["n_users"]
           for r in retention_matrix(ev).collect()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 1): 1,
                   ("2024-01-08", 0): 1}
