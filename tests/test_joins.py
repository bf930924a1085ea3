"""Skew utilities: differential tests against unsalted twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_fusion_spark.operators.joins import salted_join, two_phase_agg


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
