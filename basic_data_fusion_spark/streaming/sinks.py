"""Streaming sinks: exactly-once parquet output via foreachBatch.

Structured Streaming's file sink is append-only exactly-once already,
but only for blind appends. ``foreachBatch`` is the general sink
surface (upserts, merges, multi-sink fan-out); the cost is that the
batch function may be re-invoked with the SAME batch_id after a failure,
so the function itself must be idempotent. The pattern here makes the
write replay-safe by making the target deterministic per batch:
mode=overwrite into a ``batch_id=N`` directory — a retry of batch N
rewrites the same files instead of duplicating rows.

Scale notes: each micro-batch writes through the normal distributed
parquet path (one file per partition); the checkpoint tracks batch
progress, so AvailableNow restarts resume, not reprocess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def exactly_once_parquet_sink(df: DataFrame, path: str, checkpoint: str,
                              available_now: bool = True) -> StreamingQuery:
    """Write a streaming DataFrame to ``path`` with replay-idempotent
    batches (`batch_id=N` partition directories, overwrite-per-batch)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    writer = (df.writeStream.foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read everything the sink has produced (batch_id becomes a
    partition column via directory discovery)."""
    return spark.read.parquet(path)
