"""Join operators: differential tests against naive twins."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from basic_data_fusion_spark.operators.joins import (
    asof_join,
    interval_join,
    salted_join,
    two_phase_agg,
)


def _norm(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_left(spark):
    # hot key 1 (80% of rows) + a tail
    big = spark.createDataFrame(
        [(1 if i % 5 != 4 else i % 20, i) for i in range(1000)], "k int, v int")
    small = spark.createDataFrame([(i, f"d{i}") for i in range(20)], "k int, name string")
    plain = big.join(small, "k", "left").select("k", "v", "name")
    salted = salted_join(big, small, "k", "k", how="left", salt=8) \
        .select(big["k"].alias("k"), "v", "name")
    assert _norm(plain, ["k", "v", "name"]) == _norm(salted, ["k", "v", "name"])


def test_salted_join_inner(spark):
    big = spark.createDataFrame([(1, 10), (1, 11), (2, 12), (9, 13)], "k int, v int")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    plain = big.join(small, "k", "inner").select("v", "s")
    salted = salted_join(big, small, "k", "k", how="inner", salt=4).select("v", "s")
    assert _norm(plain, ["v", "s"]) == _norm(salted, ["v", "s"])


def test_two_phase_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(999)], "k int, c long, x double")
    plain = df.groupBy("k").agg(
        F.count("c").alias("n"), F.sum("c").alias("s"),
        F.min("x").alias("mn"), F.max("x").alias("mx"))
    twop = two_phase_agg(
        df, ["k"],
        aggs=[F.count("c").alias("n"), F.sum("c").alias("s"),
              F.min("x").alias("mn"), F.max("x").alias("mx")],
        merge_aggs=[F.sum("n").alias("n"), F.sum("s").alias("s"),
                    F.min("mn").alias("mn"), F.max("mx").alias("mx")])
    assert _norm(plain, ["k", "n", "s", "mn", "mx"]) == \
        _norm(twop, ["k", "n", "s", "mn", "mx"])


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00")),   # between r1 and r2
         (2, 10, _ts("2024-01-01T12:00:00")),   # exact tie with r2 -> inclusive
         (3, 10, _ts("2024-01-01T00:00:00")),   # before any right row -> nulls
         (4, 99, _ts("2024-01-02T00:00:00"))],  # key with no right rows
        "lid long, k long, lts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T09:00:00"), "r1"),
         (10, _ts("2024-01-01T12:00:00"), "r2"),
         (10, _ts("2024-01-03T00:00:00"), "r3")],
        "k long, rts timestamp, tag string")
    out = {r["lid"]: r["tag"]
           for r in asof_join(left, right, "k", "k", "lts", "rts",
                              ["tag"]).collect()}
    assert out == {1: "r1", 2: "r2", 3: None, 4: None}


def test_asof_join_matches_naive_formulation(spark):
    # randomized-ish deterministic data, unique (k, rts) on the right
    left = spark.createDataFrame(
        [(i, i % 7, _ts("2024-01-01T00:00:00").replace(hour=i % 24))
         for i in range(200)], "lid long, k long, lts timestamp")
    right = spark.createDataFrame(
        [(i % 7, _ts("2024-01-01T00:00:00").replace(hour=(i * 5) % 24, minute=30),
          float(i)) for i in range(48)],
        "k long, rts timestamp, payload double").dropDuplicates(["k", "rts"])
    fast = asof_join(left, right, "k", "k", "lts", "rts", ["payload"])
    l, r = left.alias("l"), right.alias("r")
    naive = (l.join(r, (F.col("l.k") == F.col("r.k"))
                    & (F.col("r.rts") <= F.col("l.lts")), "left")
             .groupBy("l.lid", "l.k", "l.lts")
             .agg(F.max_by("r.payload", "r.rts").alias("payload"))
             .select(F.col("lid"), F.col("k"), F.col("lts"), "payload"))
    assert _norm(fast, ["lid", "payload"]) == _norm(naive, ["lid", "payload"])


def test_asof_join_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1, 1, _ts("2024-01-01T00:00:00"))],
                               "a long, k long, ts timestamp")
    with pytest.raises(ValueError, match="duplicate"):
        asof_join(df, df, "k", "k", "ts", "ts", ["a"])


def test_interval_join_matches_naive_range_join(spark):
    # events every 40s; window (0, 90] spans bucket boundaries both ways
    base = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [(i, i % 3, base.replace(minute=(i * 40) // 60, second=(i * 40) % 60))
         for i in range(40)], "lid long, lk long, lts timestamp")
    right = spark.createDataFrame(
        [(100 + i, i % 3, base.replace(minute=(i * 25) // 60, second=(i * 25) % 60))
         for i in range(60)], "rid long, rk long, rts timestamp")
    fast = interval_join(left, right, "lk", "rk", "lts", "rts", 0.0, 90.0)
    l_us, r_us = F.unix_micros(F.col("l.lts")), F.unix_micros(F.col("r.rts"))
    naive = (left.alias("l").join(
        right.alias("r"),
        (F.col("l.lk") == F.col("r.rk"))
        & (r_us > l_us) & (r_us <= l_us + 90_000_000), "inner"))
    key_cols = ["lid", "rid"]
    assert _norm(fast, key_cols) == _norm(naive, key_cols)
    assert fast.count() > 0  # the window actually matches something


def test_interval_join_strict_vs_inclusive_lower(spark):
    t = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame([(1, 5, t)], "lid long, lk long, lts timestamp")
    right = spark.createDataFrame([(2, 5, t)], "rid long, rk long, rts timestamp")
    assert interval_join(left, right, "lk", "rk", "lts", "rts",
                         0.0, 60.0).count() == 0          # strict: no lag-0 match
    assert interval_join(left, right, "lk", "rk", "lts", "rts",
                         0.0, 60.0, strict_lower=False).count() == 1


def test_interval_join_rejects_shared_column_names(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))],
                               "k long, ts timestamp")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(df, df, "k", "k", "ts", "ts", 0.0, 60.0)


def test_skew_report_shares(spark):
    from basic_data_fusion_spark.operators.joins import skew_report

    rows = [(1,)] * 70 + [(2,)] * 20 + [(3,)] * 10
    df = spark.createDataFrame(rows, "k long")
    rep = skew_report(df, "k", top_k=2).collect()
    assert [r["k"] for r in rep] == [1, 2]
    assert rep[0]["n_rows"] == 70 and rep[0]["share"] == 0.7
