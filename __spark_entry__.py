"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The testdata star schema maps onto the engine's hub/spoke data model as:
``customer`` = the hub ("demographics") table keyed by ``c_custkey``;
``orders``/``nation`` = spoke ("behavioral") tables; ``c_acctbal`` plays
the age-like numeric demographic; ``c_mktsegment`` the categorical one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basic_data_fusion_spark.catalog import Catalog
from basic_data_fusion_spark.operators import aggregations as agg
from basic_data_fusion_spark.plans.builder import PlanBuilder
from basic_data_fusion_spark.plans.spec import (
    BehavioralFilter,
    DemographicFilters,
    QuerySpec,
)

SF0001 = "/root/testdata/sf0.001"

# spoke table → (hub key, spoke key)
TPCH_JOIN_MAP = {
    "orders": ("c_custkey", "o_custkey"),
    "nation": ("c_nationkey", "n_nationkey"),
}


def _catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    cat = Catalog(spark, sf_dir, primary_id="c_custkey", hub_table="customer")
    for dim in ("nation", "region", "supplier", "part"):
        if cat.has_table(dim):
            cat.info(dim).is_dimension = True
    return cat


def _flagship_spec() -> QuerySpec:
    return QuerySpec(
        tables=["orders", "nation"],
        demographic=DemographicFilters(age_range=(1000.0, 8000.0)),
        behavioral=[
            BehavioralFilter("customer", "c_mktsegment", "categorical",
                             ["AUTOMOBILE", "BUILDING", "MACHINERY"]),
            BehavioralFilter("orders", "o_orderstatus", "categorical", ["O", "F"]),
        ],
        selected_columns={
            "orders": ["o_orderkey", "o_totalprice", "o_orderstatus"],
            "nation": ["n_name"],
        },
    )


def _builder(spark: SparkSession, sf_dir: str, spec: QuerySpec | None = None) -> PlanBuilder:
    return PlanBuilder(_catalog(spark, sf_dir), spec or _flagship_spec(),
                       age_column="c_acctbal", join_map=TPCH_JOIN_MAP)


_FLAGSHIP_FROM_WHERE = """
FROM customer demo
LEFT JOIN orders ON demo.c_custkey = orders.o_custkey
LEFT JOIN nation ON demo.c_nationkey = nation.n_nationkey
WHERE demo.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  AND demo.c_acctbal BETWEEN 1000.0 AND 8000.0
  AND orders.o_orderstatus IN ('O', 'F')
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference EP2: merged hub/spoke row-set) on sf0.001."""
    return _builder(spark, SF0001).dataframe()


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def q_flagship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _builder(spark, sf_dir).dataframe()


def q_participant_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _builder(spark, sf_dir).count_distinct_df()


def q_segment_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _builder(spark, sf_dir).filtered()
    return agg.groupby_count_distinct(df, "c_mktsegment", "c_custkey")


def q_acctbal_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _builder(spark, sf_dir).filtered()
    return agg.min_max(df, "c_acctbal")


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark, sf_dir)
    return agg.distinct_ordered(cat.load("customer"), "c_mktsegment")


def q_top_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark, sf_dir)
    return agg.top_k_categories(cat.load("customer"), "c_mktsegment", k=3)


def q_numeric_ranges_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _catalog(spark, sf_dir).load("lineitem")
    aggs = []
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return li.agg(*aggs)


def q_filter_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _builder(spark, sf_dir)
    base = b.joined()
    steps = [
        ("segment", F.col("demo.c_mktsegment").isin(["AUTOMOBILE", "BUILDING", "MACHINERY"])),
        ("acctbal", F.col("demo.c_acctbal").between(1000.0, 8000.0)),
        ("order_status", F.col("orders.o_orderstatus").isin(["O", "F"])),
    ]
    return agg.filter_impact_report(base, "c_custkey", steps)


def q_enwiden_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 enwiden on the long-format events table: user_id = participant,
    event_type = session label, value pivoted first-non-null by event_id."""
    from basic_data_fusion_spark.operators.reshape import enwiden

    ev = _catalog(spark, sf_dir).load("events").select("user_id", "event_type", "event_id", "value")
    return enwiden(ev, pid="user_id", session_col="event_type",
                   order_col="event_id", value_cols=["value"])


def q_baseline_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+A8: pivot lineitem quantity by line number (labels 1/2/3 → BAS1-3
    via the session-label map), then consolidate to one _BAS column
    preferring the highest-numbered non-null."""
    from basic_data_fusion_spark.operators.reshape import consolidate_baseline, enwiden

    li = (_catalog(spark, sf_dir).load("lineitem")
          .where(F.col("l_linenumber") <= 3)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))
    wide = enwiden(li, pid="l_orderkey", session_col="l_linenumber",
                   order_col="l_partkey", value_cols=["l_quantity"])
    return consolidate_baseline(wide)


def q_column_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 deterministic tier: per-column n / missing / mean / median / min /
    max for customer+lineitem numerics. Mean via fixed-point sum and median
    via exact percentile rounded to 4 (2-decimal source data → the round is
    identity on true values, only kills cross-engine ulp drift)."""
    from basic_data_fusion_spark.functions.scalars import fixed_point_sum

    cat = _catalog(spark, sf_dir)
    out = None
    for table, cols in (("customer", ["c_acctbal"]),
                        ("lineitem", ["l_quantity", "l_extendedprice", "l_discount"])):
        df = cat.load(table)
        total = df.count()
        for c in cols:
            col = F.col(c).cast("double")
            one = df.agg(
                F.count(col).alias("n_non_null"),
                (fixed_point_sum(col) / F.count(col)).alias("mean"),
                F.round(F.expr(f"percentile({c}, 0.5)"), 4).alias("median"),
                F.min(col).alias("min"),
                F.max(col).alias("max"),
            ).select(
                F.lit(f"{table}.{c}").alias("column"),
                "n_non_null",
                (F.lit(total) - F.col("n_non_null")).alias("n_missing"),
                "mean", "median", "min", "max",
            )
            out = one if out is None else out.unionByName(one)
    return out


def _register_views(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    cat = _catalog(spark, sf_dir)
    for t in tables:
        cat.load(t).createOrReplaceTempView(t)


def _det_sql():
    from basic_data_fusion_spark.operators import deterministic_sql as ds
    return {
        "pearson_corr": ds.pearson_corr_sql("lineitem", [
            # scales sized to each term's magnitude (see pearson_corr_sql)
            dict(x="l_quantity", y="l_extendedprice",
                 sx=1e6, sy=1e4, sxx=1e4, syy=1.0, sxy=1e2),
            dict(x="l_quantity", y="l_discount",
                 sx=1e6, sy=1e8, sxx=1e4, syy=1e10, sxy=1e8),
            dict(x="l_extendedprice", y="l_discount",
                 sx=1e4, sy=1e8, sxx=1.0, syy=1e10, sxy=1e4),
        ]),
        "spearman_corr": ds.spearman_corr_sql("lineitem", "l_quantity", "l_discount"),
        "ols_regression": ds.ols_regression_sql("lineitem", "l_quantity", "l_extendedprice"),
        "anova_acctbal_by_segment": ds.anova_sql("customer", "c_mktsegment", "c_acctbal"),
        "histogram_acctbal": ds.histogram_sql("customer", "c_acctbal", bins=10),
        "quality_audit_orders": ds.quality_audit_sql(
            "orders", "o_orderkey",
            ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]),
    }


def _make_det_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
        return spark.sql(sql)
    return run


def q_dist_stats_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 distribution statistics — deterministic tier; the only
    engine-specific token is the exact-quantile function name."""
    from basic_data_fusion_spark.operators.deterministic_sql import dist_stats_sql

    _register_views(spark, sf_dir, ["customer"])
    return spark.sql(dist_stats_sql("customer", "c_acctbal", "percentile"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_merge": q_flagship_merge,
        "participant_count": q_participant_count,
        "segment_breakdown": q_segment_breakdown,
        "acctbal_minmax": q_acctbal_minmax,
        "distinct_segments": q_distinct_segments,
        "top_segments": q_top_segments,
        "numeric_ranges_lineitem": q_numeric_ranges_lineitem,
        "filter_impact": q_filter_impact,
        "enwiden_events": q_enwiden_events,
        "baseline_consolidation": q_baseline_consolidation,
        "column_summary": q_column_summary,
        "dist_stats_acctbal": q_dist_stats_acctbal,
        **{name: _make_det_query(sql) for name, sql in _det_sql().items()},
    }


def oracle_sql() -> dict[str, str]:
    from basic_data_fusion_spark.operators.deterministic_sql import dist_stats_sql

    det = dict(_det_sql())  # shared text: the oracle runs the same SQL
    det["dist_stats_acctbal"] = dist_stats_sql("customer", "c_acctbal", "quantile_cont")
    return {
        **det,
        "flagship_merge": f"""
            SELECT demo.c_custkey, demo.c_name, demo.c_nationkey, demo.c_acctbal,
                   demo.c_mktsegment, orders.o_orderkey, orders.o_totalprice,
                   orders.o_orderstatus, nation.n_name
            {_FLAGSHIP_FROM_WHERE}
        """,
        "participant_count": f"""
            SELECT COUNT(DISTINCT demo.c_custkey) AS n_participants
            {_FLAGSHIP_FROM_WHERE}
        """,
        "segment_breakdown": f"""
            SELECT demo.c_mktsegment,
                   COUNT(DISTINCT demo.c_custkey) AS n_participants
            {_FLAGSHIP_FROM_WHERE}
            GROUP BY demo.c_mktsegment
        """,
        "acctbal_minmax": f"""
            SELECT MIN(demo.c_acctbal) AS min_c_acctbal,
                   MAX(demo.c_acctbal) AS max_c_acctbal
            {_FLAGSHIP_FROM_WHERE}
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer
            WHERE c_mktsegment IS NOT NULL ORDER BY c_mktsegment
        """,
        "top_segments": """
            SELECT c_mktsegment, COUNT(*) AS n FROM customer
            WHERE c_mktsegment IS NOT NULL
            GROUP BY c_mktsegment
            ORDER BY n DESC, c_mktsegment ASC LIMIT 3
        """,
        "numeric_ranges_lineitem": """
            SELECT MIN(l_quantity) AS min_l_quantity, MAX(l_quantity) AS max_l_quantity,
                   MIN(l_extendedprice) AS min_l_extendedprice, MAX(l_extendedprice) AS max_l_extendedprice,
                   MIN(l_discount) AS min_l_discount, MAX(l_discount) AS max_l_discount,
                   MIN(l_tax) AS min_l_tax, MAX(l_tax) AS max_l_tax
            FROM lineitem
        """,
        "filter_impact": """
            WITH b AS (
              SELECT COUNT(DISTINCT demo.c_custkey) AS n FROM customer demo
              LEFT JOIN orders ON demo.c_custkey = orders.o_custkey
              LEFT JOIN nation ON demo.c_nationkey = nation.n_nationkey
            ),
            s1 AS (
              SELECT COUNT(DISTINCT demo.c_custkey) AS n FROM customer demo
              LEFT JOIN orders ON demo.c_custkey = orders.o_custkey
              LEFT JOIN nation ON demo.c_nationkey = nation.n_nationkey
              WHERE demo.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
            ),
            s2 AS (
              SELECT COUNT(DISTINCT demo.c_custkey) AS n FROM customer demo
              LEFT JOIN orders ON demo.c_custkey = orders.o_custkey
              LEFT JOIN nation ON demo.c_nationkey = nation.n_nationkey
              WHERE demo.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
                AND demo.c_acctbal BETWEEN 1000.0 AND 8000.0
            ),
            s3 AS (
              SELECT COUNT(DISTINCT demo.c_custkey) AS n FROM customer demo
              LEFT JOIN orders ON demo.c_custkey = orders.o_custkey
              LEFT JOIN nation ON demo.c_nationkey = nation.n_nationkey
              WHERE demo.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
                AND demo.c_acctbal BETWEEN 1000.0 AND 8000.0
                AND orders.o_orderstatus IN ('O', 'F')
            )
            SELECT 'baseline' AS step, b.n AS n_remaining, 0 AS n_removed,
                   0.0 AS pct_removed, 0.0 AS cum_pct_removed FROM b
            UNION ALL
            SELECT 'segment', s1.n, b.n - s1.n,
                   (100.0 * (b.n - s1.n)) / b.n,
                   (100.0 * (b.n - s1.n)) / b.n FROM b, s1
            UNION ALL
            SELECT 'acctbal', s2.n, s1.n - s2.n,
                   (100.0 * (s1.n - s2.n)) / s1.n,
                   (100.0 * (b.n - s2.n)) / b.n FROM b, s1, s2
            UNION ALL
            SELECT 'order_status', s3.n, s2.n - s3.n,
                   (100.0 * (s2.n - s3.n)) / s2.n,
                   (100.0 * (b.n - s3.n)) / b.n FROM b, s1, s2, s3
        """,
        "enwiden_events": """
            SELECT user_id,
                   first(value ORDER BY event_id, value) FILTER (WHERE event_type = 'click'    AND value IS NOT NULL) AS value_CLICK,
                   first(value ORDER BY event_id, value) FILTER (WHERE event_type = 'error'    AND value IS NOT NULL) AS value_ERROR,
                   first(value ORDER BY event_id, value) FILTER (WHERE event_type = 'purchase' AND value IS NOT NULL) AS value_PURCHASE,
                   first(value ORDER BY event_id, value) FILTER (WHERE event_type = 'signup'   AND value IS NOT NULL) AS value_SIGNUP,
                   first(value ORDER BY event_id, value) FILTER (WHERE event_type = 'view'     AND value IS NOT NULL) AS value_VIEW
            FROM events GROUP BY user_id
        """,
        "baseline_consolidation": """
            SELECT l_orderkey,
                   COALESCE(q3, q2, q1) AS l_quantity_BAS
            FROM (
              SELECT l_orderkey,
                     first(l_quantity ORDER BY l_partkey, l_quantity)
                       FILTER (WHERE l_linenumber = 1 AND l_quantity IS NOT NULL) AS q1,
                     first(l_quantity ORDER BY l_partkey, l_quantity)
                       FILTER (WHERE l_linenumber = 2 AND l_quantity IS NOT NULL) AS q2,
                     first(l_quantity ORDER BY l_partkey, l_quantity)
                       FILTER (WHERE l_linenumber = 3 AND l_quantity IS NOT NULL) AS q3
              FROM lineitem WHERE l_linenumber <= 3 GROUP BY l_orderkey
            )
        """,
        "column_summary": """
            SELECT 'customer.c_acctbal' AS "column",
                   COUNT(c_acctbal) AS n_non_null,
                   (SELECT COUNT(*) FROM customer) - COUNT(c_acctbal) AS n_missing,
                   SUM(CAST(ROUND(c_acctbal * 1000000.0, 0) AS BIGINT)) / 1000000.0 / COUNT(c_acctbal) AS mean,
                   ROUND(quantile_cont(c_acctbal, 0.5), 4) AS median,
                   MIN(c_acctbal) AS min, MAX(c_acctbal) AS max
            FROM customer
            UNION ALL
            SELECT 'lineitem.' || c AS "column", n_non_null, n_missing, mean, median, min, max
            FROM (
              SELECT 'l_quantity' AS c, COUNT(l_quantity) AS n_non_null,
                     (SELECT COUNT(*) FROM lineitem) - COUNT(l_quantity) AS n_missing,
                     SUM(CAST(ROUND(l_quantity * 1000000.0, 0) AS BIGINT)) / 1000000.0 / COUNT(l_quantity) AS mean,
                     ROUND(quantile_cont(l_quantity, 0.5), 4) AS median,
                     MIN(l_quantity) AS min, MAX(l_quantity) AS max
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', COUNT(l_extendedprice),
                     (SELECT COUNT(*) FROM lineitem) - COUNT(l_extendedprice),
                     SUM(CAST(ROUND(l_extendedprice * 1000000.0, 0) AS BIGINT)) / 1000000.0 / COUNT(l_extendedprice),
                     ROUND(quantile_cont(l_extendedprice, 0.5), 4),
                     MIN(l_extendedprice), MAX(l_extendedprice)
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', COUNT(l_discount),
                     (SELECT COUNT(*) FROM lineitem) - COUNT(l_discount),
                     SUM(CAST(ROUND(l_discount * 1000000.0, 0) AS BIGINT)) / 1000000.0 / COUNT(l_discount),
                     ROUND(quantile_cont(l_discount, 0.5), 4),
                     MIN(l_discount), MAX(l_discount)
              FROM lineitem
            )
        """,
    }
