"""Partitioned-layout helpers: directory partition pruning for time/
category-sliced scans.

Bucketing (sources/bucketing.py) removes the JOIN shuffle; directory
partitioning removes the SCAN itself for slice queries. At 100 TB the
events table is written `partitionBy(event_date)` so a
`WHERE event_date BETWEEN ...` query lists only the matching
directories — I/O scales with the slice, not the table. The pruning is
Catalyst's (PartitionFilters in the FileScan); these helpers make the
layout + the plan-level guard explicit.

The reference has no partitioned storage (one CSV per table —
data_handling/metadata.py:32-50); this is a scale extension.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_time_partitioned(df: DataFrame, path: str, ts_col: str = "ts",
                           date_col: str = "event_date",
                           mode: str = "overwrite") -> None:
    """Write parquet partitioned by the date of ``ts_col``. The derived
    date column becomes a directory key (`.../event_date=2024-01-05/`);
    the timestamp column itself stays in the files untouched."""
    (df.withColumn(date_col, F.to_date(ts_col))
     .write.mode(mode).partitionBy(date_col).parquet(path))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def partition_filters(df: DataFrame) -> list[str]:
    """The PartitionFilters the scan will apply (empty = full scan)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def assert_partition_pruned(df: DataFrame) -> None:
    """Plan-level guard: the query must reach the scan with at least one
    partition filter — otherwise the layout isn't being exploited and a
    slice query would read the full table."""
    if not partition_filters(df):
        raise AssertionError(
            "scan has no PartitionFilters — the predicate did not prune "
            "the partitioned layout (filter on the partition column, with "
            "literals/foldable expressions)")


def compact(spark: SparkSession, src: str, dest: str,
            target_mb: int = 128, fmt: str = "parquet") -> int:
    """Small-files compaction: rewrite a directory into ~``target_mb``
    output files and return the file count. Streaming sinks and
    per-batch writers leave thousands of KB-sized files; at scale the
    NameNode/listing cost and per-file open overhead dominate scans long
    before data size does. Sizing uses the actual on-disk bytes (driver
    listing, no data read); the rewrite is one job — coalesce when
    shrinking (no shuffle), repartition otherwise.

    The reference never faces this (per-upload CSVs, csv_utils.py), but
    any pipeline writing with ``exactly_once_parquet_sink`` or
    date-partitioned layouts needs periodic compaction.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src)
    cur = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files < cur else df.repartition(n_files)
    out.write.format(fmt).mode("overwrite").save(dest)
    return n_files


def delete_rows_partitioned(spark: SparkSession, path: str, predicate,
                            partition_col: str = "event_date") -> int:
    """Targeted row deletion from a partitioned parquet layout (the
    GDPR/right-to-be-forgotten pattern): rewrite ONLY the partitions that
    contain matching rows — dynamic partition overwrite leaves every
    other partition's files physically untouched, so a delete touching 3
    of 10,000 date partitions rewrites 0.03% of the table. Returns the
    number of partitions rewritten.

    The surviving rows of affected partitions are localCheckpoint'ed
    before the overwrite: Spark (correctly) refuses to overwrite a path
    its own plan is still reading from, and the checkpoint cuts that
    lineage. The materialized set is only the affected partitions —
    bounded by the delete's spread, not table size.
    """
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df = spark.read.parquet(path)
        affected = df.filter(predicate).select(partition_col).distinct()
        n_affected = affected.count()
        if n_affected == 0:
            return 0
        survivors = (df.join(affected, partition_col, "left_semi")
                     .filter(~predicate)
                     .localCheckpoint())
        (survivors.write.mode("overwrite")
         .partitionBy(partition_col).parquet(path))
        return n_affected
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def shard_assignments(df: DataFrame, id_col: str = "doc_id",
                      order_col: str | None = None) -> DataFrame:
    """Deterministic 16-way training-shard plan: shard = first md5 nibble
    of the id (engine-portable, balanced in expectation, no RNG state);
    within-shard position = rank by (md5, id) — i.e. a reproducible
    global shuffle, the last step before serializing training data.
    Returns ``(id, shard, pos)``.

    Scale shape: the md5 expressions are embarrassingly parallel; the
    only shuffle is the per-shard rank (16 partitions regardless of
    corpus size). For >16 shards compose nibbles; for shard-count that
    must scale with data, write with ``write_sharded`` instead, which
    never ranks globally.
    """
    h = F.md5(F.col(id_col).cast("string"))
    shard = (F.position(F.substring(h, 1, 1), F.lit("0123456789abcdef")) - 1)
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (df.select(F.col(id_col), h.alias("__h"),
                      shard.cast("int").alias("shard"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .select(id_col, "shard", "pos"))


def write_sharded(df: DataFrame, path: str, id_col: str = "doc_id",
                  n_shards: int = 16) -> None:
    """Materialize hash-sharded training data: one directory per shard
    (``shard=N/``), rows routed by md5 of the id so re-runs and engines
    agree byte-for-byte on membership. Rows are sorted within each
    shard's partitions by the hash — a deterministic intra-shard shuffle
    that breaks source ordering (the usual pre-training requirement)
    without any global sort."""
    h = F.md5(F.col(id_col).cast("string"))
    out = (df.withColumn("__h", h)
           .withColumn("shard",
                       F.pmod(F.conv(F.substring("__h", 1, 8), 16, 10)
                              .cast("long"), F.lit(n_shards)).cast("int")))
    (out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite").partitionBy("shard").parquet(path))


def spread_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input is a NARROW SCAN —
    the spread idiom for CPU-bound expression pipelines (tokenize /
    md5 / shingle / dot-product passes).

    A single small file pins such a pass to one core in local tests; an
    unconditional ``repartition`` fixes that but becomes a full-corpus
    round-robin SHUFFLE at 100 TB, where a parquet corpus is already
    split into thousands of balanced ``maxPartitionBytes`` tasks and
    needs no spread at all.

    Two-stage check, cheap-first: (1) if the ANALYZED plan already
    contains a shuffle-producing operator (aggregate / join / window /
    sort / repartition / distinct), the data is redistributed upstream —
    skip entirely.  This guard matters twice over: probing such a plan
    with ``.rdd`` forces a full physical-planning pass (~seconds on a
    long curation chain, paid at every plan build), and the pre-AQE
    partition estimate it returns is wrong anyway (it reported 1 for a
    post-join relation, which would insert a spurious mid-chain text
    shuffle — measured 1.5× on the chained curation query).  (2) For
    scan-shaped plans the partition-count probe runs as before (no job;
    the file listing it triggers is needed by the query regardless).
    Results are unaffected either way — every consumer pipeline is
    partitioning-invariant by design (hash-checked).

    The operator check WALKS the analyzed logical plan's node tree
    (``TreeNode.nodeName`` per node) rather than word-matching the
    rendered plan string — a column named ``Sort`` or a string literal
    ``'Join'`` in a filter appears verbatim in the rendered text and
    would false-positive a plain scan into silently skipping its spread
    (round-6 fix; the private-API surface is pinned by
    tests/test_sources.py::test_spread_narrow_plan_probe so a Spark
    upgrade that changes it fails loudly instead of silently)."""
    # Streaming frames pass through untouched: their per-micro-batch
    # partitioning is set by the source (maxFilesPerTrigger & co.), a
    # pre-execution spread is meaningless, and the `.rdd` probe below
    # is illegal on a streaming plan — this guard is what lets the
    # dedup/minhash expression operators run unchanged inside a
    # streaming query (the stateless fuzzy-decontam gate).
    if df.isStreaming:
        return df
    if _plan_has_shuffle_node(df):
        return df
    npart = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < npart:
        return df.repartition(npart)
    return df


# Logical operators whose presence implies the data is (or will be)
# redistributed — or, for Generate/explode, that row width is about to
# fan out — upstream of the consumer, making a pre-spread pointless.
# Repartition covers coalesce/repartition(n); RepartitionByExpression
# covers repartition(cols)/hint-based forms.
_SHUFFLE_NODE_NAMES = frozenset({
    "Aggregate", "Join", "Window", "Sort", "Repartition",
    "RepartitionByExpression", "Deduplicate", "Generate",
    "GlobalLimit", "Intersect", "Except",
})


def _plan_has_shuffle_node(df: DataFrame) -> bool:
    """True if the analyzed logical plan contains a shuffle-producing
    (or row-fanning) operator node.  Walks ``nodeName()`` over the py4j
    plan tree — exact class-derived names, immune to column names or
    string literals that happen to contain operator words."""
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.nodeName() in _SHUFFLE_NODE_NAMES:
            return True
        children = node.children()
        it = children.iterator()
        while it.hasNext():
            stack.append(it.next())
    return False


def shard_manifest(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-shard integrity manifest for a sharded export — the handoff
    artifact a consumer checks before training: document count, token
    count, and an ORDER-INDEPENDENT content checksum per shard
    (sum of each document's 60-bit content-md5 prefix, mod 2^60), so
    two independently-produced copies of a shard can be compared
    without re-reading either in a fixed order.

    One map-only pass derives (shard, tokens, checksum-term) per doc;
    one 16-group aggregation produces the manifest. The checksum is
    commutative integer arithmetic — engine-portable and partitioning-
    independent, unlike a hash of concatenated rows. Reference
    analogue: none (layout extension)."""
    from ..operators.text import fingerprint, token_count

    h = F.md5(F.col(id_col).cast("string"))
    shard = (F.position(F.substring(h, 1, 1),
                        F.lit("0123456789abcdef")) - 1).cast("int")
    term = F.conv(F.substring(fingerprint(F.col(text_col)), 1, 15),
                  16, 10).cast("decimal(38,0)")
    per_doc = df.select(
        shard.alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("__tok"),
        term.alias("__term"))
    two60 = 2 ** 60
    return (per_doc.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("__tok").cast("long").alias("n_tokens"),
                 F.pmod(F.sum("__term"), F.lit(two60).cast("decimal(38,0)"))
                 .cast("long").alias("content_checksum"))
            .orderBy("shard"))
