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
    }


def oracle_sql() -> dict[str, str]:
    return {
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
    }
