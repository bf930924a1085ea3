"""Synthetic data generator (SURVEY §2.1 S12).

The reference ships a seeded numpy generator with age-correlated
measures and planned missingness (reference: generate_synthetic_data.py:
26-210 — seed 42, dropout ``subject % 7``, missing sessions ``% 5`` in
tests/test_data_merge_comprehensive.py:36-151). This is the Spark-native
form: ``spark.range(n)`` plus pure-expression columns.

Determinism at scale: ``F.rand(seed)`` is seeded PER PARTITION, so its
output changes whenever the partition layout does — useless for
reproducible corpora. Every random stream here instead derives from
``xxhash64(id, salt)``: row-content-addressed, so the same row gets the
same values under any partitioning, any cluster size, any retry. The
gaussian uses Box-Muller over two hash-uniforms — still a JVM
expression, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_TWO31 = float(1 << 31)


def hash_uniform(id_col: Column, salt: int, seed: int = 42) -> Column:
    """U(0,1) addressed by (row id, salt, seed) — partition-invariant."""
    h = F.xxhash64(id_col, F.lit(salt), F.lit(seed))
    # +0.5 keeps the value strictly inside (0,1) so log()/Box-Muller are safe
    return (F.pmod(h, F.lit(1 << 31)).cast("double") + F.lit(0.5)) / F.lit(_TWO31)


def hash_gaussian(id_col: Column, salt: int, seed: int = 42) -> Column:
    """N(0,1) via Box-Muller over two independent hash-uniforms."""
    u = hash_uniform(id_col, salt * 2 + 1, seed)
    v = hash_uniform(id_col, salt * 2 + 2, seed)
    return F.sqrt(F.lit(-2.0) * F.log(u)) * F.cos(F.lit(2.0 * math.pi) * v)


def synthetic_participants(spark: SparkSession, n: int, seed: int = 42,
                           sessions: list[str] | None = None) -> DataFrame:
    """Cross-sectional (sessions=None) or longitudinal participant table
    with the reference's statistical shape: age U[18, 80], sex ~ 50/50,
    a cognition measure negatively correlated with age, and planned
    missingness (dropout ``subject % 7`` after the first session,
    measure missing for ``subject % 5 == 0`` rows)."""
    df = spark.range(n).select(F.col("id").alias("subject"))
    age = F.floor(F.lit(18) + hash_uniform(F.col("subject"), 1, seed) * 63) \
        .cast("int")
    sex = F.when(hash_uniform(F.col("subject"), 2, seed) < 0.5,
                 F.lit("F")).otherwise(F.lit("M"))
    df = (df.withColumn("ursi", F.concat(F.lit("M"), F.lpad(
        F.col("subject").cast("string"), 8, "0")))
          .withColumn("age", age)
          .withColumn("sex", sex))
    if sessions:
        sess = F.explode(F.array(*[F.lit(s) for s in sessions]))
        df = df.withColumn("session_num", sess)
        # dropout: subjects ≡ 0 (mod 7) only attend the first session
        df = df.filter((F.col("session_num") == sessions[0])
                       | (F.col("subject") % 7 != 0))
        df = df.withColumn("customID", F.concat_ws("_", "ursi", "session_num"))
        row_key = F.xxhash64("subject", "session_num")
    else:
        row_key = F.col("subject")
    # age-correlated measure + noise; missing for subject % 5 == 0
    cog = (F.lit(110.0) - F.lit(0.45) * F.col("age")
           + hash_gaussian(row_key, 3, seed) * F.lit(5.0))
    df = df.withColumn(
        "cognition_score",
        F.when(F.col("subject") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(cog, 2)))
    return df.drop("subject")
