"""Correlated-subquery relational shapes, decorrelated the Spark way.

The reference's generated SQL has no subqueries at all (its one query
template is hub LEFT JOIN spokes; query/query_secure.py:73-92), but a
user replacing it with this engine writes them constantly — EXISTS /
NOT EXISTS membership tests, per-group scalar thresholds ("rows below
half their group's average"), HAVING-gated IN lists, and global-scalar
comparisons. Catalyst decorrelates such subqueries into joins; these
operators build the decorrelated plan DIRECTLY with the DataFrame API,
so the physical shape is explicit and guaranteed:

- EXISTS        -> LEFT SEMI join (never fans out the outer side)
- NOT EXISTS    -> LEFT ANTI join
- per-group avg -> one partial-aggregated pass over the fact, joined
                  back by key (the agg side is |groups| rows — Spark
                  broadcasts it when small, AQE decides otherwise)
- global scalar -> a 1-row aggregate cross-joined (broadcast) into the
                  predicate, never a driver collect in the plan path

Aggregate outputs that feed cross-engine comparison use fixed-point
integer sums (functions/scalars.fixed_point_sum) so results are
bit-deterministic at any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from basic_data_fusion_spark.functions.scalars import fixed_point_sum


def exists_semi(outer: DataFrame, inner: DataFrame,
                condition: Column) -> DataFrame:
    """``outer WHERE EXISTS (inner WHERE condition)`` as a LEFT SEMI join.

    The semi join returns each outer row at most once no matter how many
    inner rows match, and never materializes inner columns — exactly the
    EXISTS semantics, with none of the DISTINCT-after-inner-join cost a
    naive rewrite pays. ``condition`` may mix equi and non-equi terms
    (e.g. ``l_orderkey == o_orderkey AND l_shipdate > o_orderdate``);
    Catalyst extracts the equi part as the shuffle key and keeps the
    rest as a residual filter, so this stays a single hash/sort-merge
    shuffle — never a nested-loop — as long as one equi term exists.
    """
    return outer.join(inner, condition, "left_semi")


def not_exists_anti(outer: DataFrame, inner: DataFrame,
                    condition: Column) -> DataFrame:
    """``outer WHERE NOT EXISTS (inner WHERE condition)`` as a LEFT ANTI
    join — same single-shuffle shape as :func:`exists_semi`."""
    return outer.join(inner, condition, "left_anti")


def below_group_fraction(fact: DataFrame, group_key: str, value_col: str,
                         fraction: float) -> DataFrame:
    """Rows with ``value < fraction * AVG(value) OVER their group`` — the
    classic correlated scalar subquery (TPC-H Q17's
    ``l_quantity < 0.2 * (SELECT AVG(l_quantity) ... WHERE p_partkey =
    ...)``), decorrelated into aggregate + join-back.

    Plan: one grouped aggregation over the fact produces |groups| rows of
    ``(key, sum, count)``; that small relation joins back to the fact on
    the key (broadcast under the threshold). Two scans of the fact, one
    shuffle each — versus the reference pattern of re-running a subquery
    per row. The average is ``exact_integer_sum / count`` so the
    threshold is the same double on every engine when values are
    integral (l_quantity is); for decimal-valued columns pass the fact
    through a fixed-point cast first.
    """
    stats = (fact.groupBy(group_key)
             .agg(F.sum(value_col).alias("__s"),
                  F.count(value_col).alias("__n")))
    thresh = (F.col("__s") / F.col("__n")) * F.lit(fraction)
    return (fact.join(stats, on=group_key, how="inner")
            .where(F.col(value_col) < thresh)
            .drop("__s", "__n"))


def having_keys(fact: DataFrame, key: str, agg_col: Column,
                predicate: Column) -> DataFrame:
    """Distinct ``key`` values whose group aggregate passes ``predicate``
    — the inner side of ``IN (SELECT key ... GROUP BY key HAVING ...)``
    (TPC-H Q18 shape). Compose with a semi join against the outer table;
    the grouped aggregate does partial (map-side) combine before its one
    shuffle, so the produced key list is as cheap as the data allows.

    ``agg_col`` must be aliased; ``predicate`` references that alias.
    """
    return fact.groupBy(key).agg(agg_col).where(predicate).select(key)


def above_global_scalar(df: DataFrame, value_col: str,
                        scalar_df: DataFrame, scalar_col: str) -> DataFrame:
    """``df WHERE value > (SELECT scalar FROM ...)`` without collecting the
    scalar to the driver: the 1-row aggregate is cross-joined (Catalyst
    broadcasts a 1-row relation) and applied as a filter. Keeping the
    scalar in-plan means the whole query stays one lazy DAG — reusable,
    cacheable, and resumable by AQE — instead of two sequential jobs.
    """
    return (df.crossJoin(F.broadcast(scalar_df))
            .where(F.col(value_col) > F.col(scalar_col))
            .drop(scalar_col))


def equals_global_scalar(df: DataFrame, value_col: str,
                         scalar_df: DataFrame, scalar_col: str) -> DataFrame:
    """``df WHERE value = (SELECT scalar FROM ...)`` — the argmax-membership
    shape (TPC-H Q15's ``total_revenue = (SELECT MAX(total_revenue) ...)``).
    Same in-plan mechanics as :func:`above_global_scalar`: the 1-row
    aggregate broadcasts into a filter, so finding "all rows at the
    maximum" costs one extra 1-row stage instead of a driver round-trip,
    and ties at the max are all returned (Q15 semantics)."""
    return (df.crossJoin(F.broadcast(scalar_df))
            .where(F.col(value_col) == F.col(scalar_col))
            .drop(scalar_col))


def positive_mean_cents(df: DataFrame, value_col: str) -> DataFrame:
    """1-row helper: bit-deterministic mean of the positive values of a
    2-decimal column (TPC-H Q22's ``AVG(c_acctbal) WHERE c_acctbal >
    0.00``), as ``fixed_point_sum / count`` so every engine and every
    partitioning yields the identical double."""
    pos = df.where(F.col(value_col) > 0.0)
    return pos.agg(
        (fixed_point_sum(F.col(value_col), scale=100)
         / F.count(value_col)).alias("__global_avg"))
