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


def test_gate_cap_active_parity(spark):
    """The driver sf is below _GATE_MAX_ROWS, so the standing parity
    rows never exercise the top-n branch of the r13 gate re-pricing.
    Shrink the cap until it ACTIVATES at sf0.001 (documents=500:
    0.3-slice=150 docs, held split~25 docs) and assert every re-priced
    contract still value-matches its DuckDB oracle — both sides read
    the module constant, so the differential covers the exact
    (draw, id) top-n replay (ORDER BY hex8, doc_id LIMIT n)."""
    caps = {
        "dedup_recall_report": 60,
        "leakage_safe_split": 60,
        "incremental_clusters": 60,
        "incremental_clusters_banded": 60,
        "lsh_config_sweep": 60,
        "fuzzy_decontam_sweep": 10,   # held split is ~25 docs here
    }
    saved = entrymod._GATE_MAX_ROWS
    try:
        for name, cap in caps.items():
            entrymod._GATE_MAX_ROWS = cap
            spark_pdf = entrymod.queries()[name](spark, SF0001).toPandas()
            con = duckdb_con(SF0001)
            oracle_pdf = con.execute(
                entrymod.oracle_sql()[name]).fetchdf()
            assert_df_equal(spark_pdf, oracle_pdf, f"{name}@cap={cap}")
    finally:
        entrymod._GATE_MAX_ROWS = saved
