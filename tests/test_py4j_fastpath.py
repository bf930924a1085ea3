"""Pins for the py4j handle cache (basic_data_fusion_spark.py4j_fastpath).

The fast path monkeypatches py4j 0.10.9.x private surface
(``JVMView.__getattr__`` / ``JavaClass.__getattr__``); these tests fail
loudly when a py4j/Spark upgrade moves it (the install would silently
degrade to the stock slow path otherwise) and pin the semantics the
cache must preserve: methods/classes cached, field VALUES never cached,
plans byte-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_data_fusion_spark import py4j_fastpath


def test_install_active():
    # package import already ran install(); a second call is an
    # idempotent no-op and must still report active
    assert py4j_fastpath.install() is True
    from py4j import java_gateway as jg

    assert getattr(jg.JVMView.__getattr__, "__bdfs_fastpath__", False)
    assert getattr(jg.JavaClass.__getattr__, "__bdfs_fastpath__", False)


def test_cached_handles_are_reused(spark):
    jvm = spark.sparkContext._jvm
    c1 = getattr(jvm, "org.apache.spark.sql.functions")
    c2 = getattr(jvm, "org.apache.spark.sql.functions")
    assert c1 is c2  # JavaClass handle cached per view
    m1 = getattr(c1, "col")
    m2 = getattr(c1, "col")
    assert m1 is m2  # static-method JavaMember cached per class


def test_field_reads_not_cached(spark):
    # static FIELD access returns the current value (an int here), not a
    # handle — the cache must pass it through uncached both times
    jvm = spark.sparkContext._jvm
    cls = getattr(jvm, "java.lang.Integer")
    v1 = cls.MAX_VALUE
    v2 = cls.MAX_VALUE
    assert v1 == v2 == 2147483647
    per = py4j_fastpath._MEMBER_CACHE.get(cls)
    assert per is None or "MAX_VALUE" not in per


def test_columns_behave_identically(spark):
    # end to end through the cached path: expression strings and results
    # match the stock semantics
    df = spark.range(5).select((F.col("id") * 2).alias("x"))
    assert [r["x"] for r in df.orderBy("id").collect()] == [0, 2, 4, 6, 8]
    assert "CAST" in str(F.col("x").cast("bigint"))


def test_missing_name_still_raises(spark):
    from py4j.protocol import Py4JError
    import pytest

    jvm = spark.sparkContext._jvm
    cls = getattr(jvm, "java.lang.Integer")
    with pytest.raises(Py4JError):
        getattr(cls, "no_such_member_xyz")
