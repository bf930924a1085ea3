"""Run every __spark_entry__.queries() entry against its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF0001, duckdb_con
from tests.oracle_check import assert_df_equal

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # rows-only check (driver's weaker tier for non-SQL-expressible ops)
        sdf = q(spark, SF0001)
        assert sdf.count() >= 0
        return
    spark_pdf = q(spark, SF0001).toPandas()
    con = duckdb_con(SF0001)
    oracle_pdf = con.execute(oracles[name]).fetchdf()
    assert_df_equal(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
