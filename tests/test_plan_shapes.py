"""Plan-level deployment guards: the physical-plan properties SCALE.md
claims (pushdown, pruning, broadcast, JVM-only pipelines) asserted on
`.executedPlan`, so a regression that silently de-optimizes a plan fails
CI instead of surfacing as a 100 TB incident."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF0001


@pytest.fixture(autouse=True)
def _cold_cache(spark):
    # other tests persist relations over the same tables (EP3 caches the
    # joined base); a cached plan compiles to InMemoryTableScan and hides
    # the scan-level properties being asserted here
    spark.catalog.clearCache()
    yield


def _final_plan(df) -> str:
    df.collect()  # finalize AQE so the adaptive plan is the real one
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pushdown_pruning_broadcast(spark):
    df = entrymod.queries()["flagship_merge"](spark, SF0001)
    plan = _final_plan(df)
    pushed = [m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", plan)
              if m.group(1).strip()]
    assert pushed, "spec predicates must reach the parquet scan"
    assert any("c_acctbal" in p for p in pushed)
    assert "BroadcastHashJoin" in plan, "dimension sides should broadcast at sf"
    # column pruning: no scan should read the full customer schema
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        assert "c_comment" not in m.group(1), "unprojected column read from disk"


def test_participant_count_semi_join_single_distinct_exchange(spark):
    df = entrymod.queries()["participant_count"](spark, SF0001)
    plan = _final_plan(df)
    assert "LeftSemi" in plan, "spoke filters must become semi-joins (no fan-out)"


def test_text_pipeline_stays_jvm_side(spark):
    for name in ["quality_scores", "repetition_scores", "lang_id"]:
        df = entrymod.queries()[name](spark, SF0001)
        plan = _final_plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
            f"{name}: Python UDF crept into a hot path"
        # toString marks whole-stage-codegen spans with a '*(n)' prefix
        assert re.search(r"\*\(\d+\)", plan), f"{name}: no codegen span"


def test_pricing_summary_single_shuffle(spark):
    df = entrymod.queries()["pricing_summary"](spark, SF0001)
    plan = _final_plan(df)
    n_exchanges = len(re.findall(r"\bExchange\b", plan))
    assert n_exchanges <= 2, (  # 1 agg shuffle (+1 AQE read is same exchange)
        f"grouped aggregate should shuffle once, saw {n_exchanges} exchanges")
    assert "partial" in plan.lower(), "map-side partial aggregation missing"
