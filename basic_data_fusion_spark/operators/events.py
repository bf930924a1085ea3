"""Event-sequence analytics: funnels and retention cohorts.

The reference has no event-time analysis at all (its only temporal notion
is the categorical session label, query/query_secure.py:119-125); these
are the standard product-analytics queries over the ``events`` table
(TESTDATA.md), built to the same scale rules as the rest of the engine:
every stage shuffles on ``user_id`` (so consecutive joins/aggs reuse one
partitioning and AQE coalesces), grouping keys are tiny, and nothing
collects to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Ordered-funnel user counts: a user reaches step *i* iff they have a
    step-*i* event STRICTLY AFTER their earliest qualifying step-*i−1*
    event (first-touch attribution, the common product-analytics
    definition). Returns one row per step: (step, n_users).

    Each stage is a filtered min-aggregation joined to the previous
    stage's per-user frontier — k−1 equi-joins on ``user_id``, all on the
    same shuffle key. No window over the full event stream is needed, so
    a user with millions of events costs the same as one with ten.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(user_col, type_col, ts_col)
    frontier = (ev.filter(F.col(type_col) == steps[0])
                .groupBy(user_col).agg(F.min(ts_col).alias("__ts")))
    tiers = [frontier]
    for step in steps[1:]:
        nxt = (ev.filter(F.col(type_col) == step)
               .join(frontier.select(user_col, F.col("__ts").alias("__prev")),
                     user_col)
               .filter(F.col(ts_col) > F.col("__prev"))
               .groupBy(user_col).agg(F.min(ts_col).alias("__ts")))
        tiers.append(nxt)
        frontier = nxt
    counts = [t.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit(s).alias("step"), "n_users")
              for s, t in zip(steps, tiers)]
    return reduce(lambda a, b: a.unionByName(b), counts)


def retention_matrix(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly retention cohorts: users grouped by the week of their first
    event; one row per (cohort_week, week_offset) with the count of
    cohort users active that week. ``week_offset`` is exact (both weeks
    are Monday-truncated, so the day difference is a multiple of 7).

    Plan: first-event agg + distinct activity weeks + one join, all
    shuffled on ``user_id``; the final (cohort, offset) aggregation key
    has ~weeks² cardinality — tiny at any data scale.
    """
    first = (events.groupBy(user_col)
             .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week")))
    active = (events.select(user_col,
                            F.date_trunc("week", F.col(ts_col)).alias("active_week"))
              .distinct())
    offset = (F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7
              ).cast("long")
    return (active.join(first, user_col)
            .select(F.col("cohort_week"), offset.alias("week_offset"),
                    F.col(user_col))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct(F.col(user_col)).alias("n_users")))
