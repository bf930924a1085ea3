"""Property-based differential tests (hypothesis): engine operators vs
independent pure-Python reimplementations on generated inputs. Few
examples per property (each example is a Spark round-trip); the
generators aim at the edge structure, not volume."""

from __future__ import annotations

import hashlib

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from basic_data_fusion_spark.functions.scalars import hash_split, stratified_keep
from basic_data_fusion_spark.operators import dedup, text

FAST = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _md5_hex(key: int) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()


@FAST
@given(rate=st.integers(min_value=0, max_value=256),
       keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True))
def test_stratified_keep_matches_python_md5(spark, rate, keys):
    df = spark.createDataFrame([(k, "s") for k in keys], "id long, g string")
    kept = {r["id"] for r in
            df.filter(stratified_keep(F.col("g"), F.col("id"), {"s": rate / 256}))
            .collect()}
    expect = ({k for k in keys if _md5_hex(k)[:2] < format(rate, "02x")}
              if 0 < rate < 256 else (set(keys) if rate == 256 else set()))
    assert kept == expect


@FAST
@given(keys=st.lists(st.integers(0, 100_000), min_size=1, max_size=50, unique=True),
       train=st.integers(1, 14))
def test_hash_split_matches_python_md5(spark, keys, train):
    val = (16 - train) // 2 or 1
    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {r["id"]: r["s"] for r in
           df.select("id", hash_split(F.col("id"), train, val).alias("s")).collect()}

    def expect(k: int) -> str:
        nib = int(_md5_hex(k)[0], 16)
        return "train" if nib < train else ("val" if nib < train + val else "test")

    assert got == {k: expect(k) for k in keys}


@FAST
@given(words=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30))
def test_max_run_matches_python(spark, words):
    doc = " ".join(words)
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    got = text.repetition_features(df).first()["max_run"]
    best = run = 1
    for prev, cur in zip(words, words[1:]):
        run = run + 1 if cur == prev else 1
        best = max(best, run)
    assert got == best


@FAST
@given(edges=st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in dedup.connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert got == expect
