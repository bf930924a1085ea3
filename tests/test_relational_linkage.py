"""Semantics of the decorrelated-subquery shapes (operators/relational)
and the linkage / time-series operators (operators/linkage), on small
controlled data plus differential twins against naive formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_fusion_spark.operators import linkage, relational


# ---------------------------------------------------------------------------
# relational
# ---------------------------------------------------------------------------

def test_exists_semi_no_fanout(spark):
    outer = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long")
    inner = spark.createDataFrame(
        [(1, 5), (1, 6), (2, 100)], "ik long, iv long")
    got = relational.exists_semi(
        outer, inner,
        (F.col("k") == F.col("ik")) & (F.col("iv") < F.col("v"))).collect()
    # k=1 matches twice but appears ONCE; k=2 has no iv<20 match; k=3 none
    assert sorted((r["k"], r["v"]) for r in got) == [(1, 10)]
    # inner columns never leak
    assert {c for r in got for c in r.asDict()} == {"k", "v"}


def test_not_exists_anti_complement(spark):
    outer = spark.createDataFrame([(i,) for i in range(6)], "k long")
    inner = spark.createDataFrame([(0,), (2,), (4,)], "ik long")
    cond = F.col("k") == F.col("ik")
    semi = {r["k"] for r in relational.exists_semi(outer, inner, cond).collect()}
    anti = {r["k"] for r in relational.not_exists_anti(outer, inner, cond).collect()}
    assert semi | anti == set(range(6)) and not semi & anti


def test_below_group_fraction_matches_naive(spark):
    rows = [("a", float(q)) for q in (1, 2, 3, 10)] + [("b", 4.0)] * 3
    df = spark.createDataFrame(rows, "g string, q double")
    got = relational.below_group_fraction(df, "g", "q", 0.5).collect()
    # group a: avg 4.0, keep q < 2.0 -> {1}; group b: avg 4, keep q < 2 -> {}
    assert [(r["g"], r["q"]) for r in got] == [("a", 1.0)]
    # salt columns never leak
    assert set(got[0].asDict()) == {"g", "q"}


def test_above_global_scalar_stays_in_plan(spark):
    df = spark.createDataFrame([(i * 1.0,) for i in range(10)], "v double")
    scalar = df.agg(F.avg("v").alias("cut"))  # 4.5
    out = relational.above_global_scalar(df, "v", scalar, "cut")
    assert sorted(r["v"] for r in out.collect()) == [5.0, 6.0, 7.0, 8.0, 9.0]
    # single lazy DAG: the scalar is a broadcast join in the plan, not a
    # pre-collected literal
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_having_keys(spark):
    df = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50), (3, 400)], "k long, v long")
    keys = relational.having_keys(
        df, "k", F.sum("v").alias("s"), F.col("s") > 250)
    assert sorted(r["k"] for r in keys.collect()) == [1, 3]
    assert keys.columns == ["k"]


def test_positive_mean_cents_ignores_nonpositive(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (1.25,), (2.75,)], "v double")
    got = relational.positive_mean_cents(df, "v").first()["__global_avg"]
    assert got == 2.0


# ---------------------------------------------------------------------------
# linkage
# ---------------------------------------------------------------------------

def test_blocked_fuzzy_pairs_blocking_and_distance(spark):
    df = spark.createDataFrame(
        [(1, "red widget"), (2, "bed widget"), (3, "red gadget"),
         (4, "red widget")],  # 4 duplicates 1's text but distinct id
        "id long, name string")
    pairs = linkage.blocked_fuzzy_pairs(
        df, "id", "name",
        block=F.element_at(F.split("name", " "), -1), max_distance=2)
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in pairs.collect()}
    # (1,2) same block 'widget', distance 1; (1,4) distance 0;
    # (1,3) distance 2 but DIFFERENT block -> excluded by design
    assert got == {(1, 2): 1, (1, 4): 0, (2, 4): 1}


def test_latest_snapshot_deterministic_tiebreak(spark):
    rows = [(1, "a", 100, 1, 10.0), (1, "a", 200, 2, 20.0),
            (1, "a", 200, 3, 30.0),  # same ts as id=2: tiebreak -> id 3
            (2, "a", 50, 4, 40.0)]
    df = spark.createDataFrame(rows, "k long, t string, ts long, cid long, v double")
    got = {(r["k"], r["t"]): (r["cid"], r["v"])
           for r in linkage.latest_snapshot(df, ["k", "t"], "ts", "cid").collect()}
    assert got == {(1, "a"): (3, 30.0), (2, "a"): (4, 40.0)}


def test_latest_snapshot_plan_uses_group_limit(spark):
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(100)], "k long, ts long, v double")
    out = linkage.latest_snapshot(df, ["k"], "ts", "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # partial top-1 before the exchange


def test_scd2_history_collapses_runs(spark):
    rows = [(1, 1, "A"), (1, 2, "A"),   # no-change row collapses
            (1, 3, "B"), (1, 4, "A"),   # A again: NEW interval (type 2)
            (2, 1, None), (2, 2, None),  # NULL -> NULL is "no change"
            (2, 3, "C")]
    df = spark.createDataFrame(rows, "k long, ts long, status string")
    hist = linkage.scd2_history(df, ["k"], "ts", "ts", ["status"])
    got = [(r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
           for r in hist.orderBy("k", "valid_from").collect()]
    assert got == [
        (1, "A", 1, 3, False),
        (1, "B", 3, 4, False),
        (1, "A", 4, None, True),
        (2, None, 1, 3, False),
        (2, "C", 3, None, True),
    ]


def test_scd2_history_single_exchange(spark):
    df = spark.createDataFrame(
        [(i % 5, i, "s" + str(i % 2)) for i in range(50)],
        "k long, ts long, status string")
    hist = linkage.scd2_history(df, ["k"], "ts", "ts", ["status"])
    plan = hist._jdf.queryExecution().executedPlan().toString()
    # both window passes hash-partition on k -> Catalyst reuses ONE shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_gap_fill_daily_fills_and_flags(spark):
    import datetime as dt

    d = dt.date
    rows = [(1, d(2024, 1, 1), 10.0), (1, d(2024, 1, 4), 40.0),
            (2, d(2024, 1, 2), 5.0)]
    df = spark.createDataFrame(rows, "k long, day date, v double")
    got = {(r["k"], str(r["day"])): (r["v"], r["observed"])
           for r in linkage.gap_fill_daily(df, "k", "day", "v").collect()}
    assert got == {
        (1, "2024-01-01"): (10.0, True),
        (1, "2024-01-02"): (10.0, False),   # filled forward
        (1, "2024-01-03"): (10.0, False),
        (1, "2024-01-04"): (40.0, True),
        (2, "2024-01-02"): (5.0, True),     # single-day span: no padding
    }


def test_rolling_zscore_hand_computed(spark):
    """Priors exclude the current row; z matches numpy on the trailing
    sample; min_prior and zero-variance windows yield NULL z; a planted
    spike flags."""
    import numpy as np
    import pytest
    from basic_data_fusion_spark.operators.linkage import rolling_zscore

    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 100.0, 10.0]
    rows = [("u", float(i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id string, ts double, "
                                     "event_id long, value double")
    got = {r["event_id"]: r for r in
           rolling_zscore(df, "user_id", "ts", "event_id", "value",
                          lookback=7, min_prior=3).collect()}
    assert got[0]["z"] is None and got[2]["z"] is None  # < 3 priors
    assert got[0]["n_prior"] == 0 and got[3]["n_prior"] == 3
    # z of the spike at index 6 vs its 6 priors
    prior = np.array(vals[:6])
    expect = (100.0 - prior.mean()) / prior.std(ddof=1)
    assert got[6]["z"] == pytest.approx(expect, rel=1e-6)
    assert got[6]["is_anomaly"] and not got[5]["is_anomaly"]
    # the spike inflates the next window's std -> ordinary point not flagged
    assert not got[7]["is_anomaly"]

    const = spark.createDataFrame(
        [("u", float(i), i, 5.0) for i in range(6)],
        "user_id string, ts double, event_id long, value double")
    z0 = rolling_zscore(const, "user_id", "ts", "event_id", "value",
                        min_prior=3).collect()
    assert all(r["z"] is None for r in z0)  # zero variance -> NULL, not NaN
    again = {r["event_id"]: r["z"] for r in
             rolling_zscore(df.repartition(5), "user_id", "ts", "event_id",
                            "value", lookback=7, min_prior=3).collect()}
    assert again == {k: r["z"] for k, r in got.items()}
