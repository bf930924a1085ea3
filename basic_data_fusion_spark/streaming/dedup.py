"""Streaming deduplication with bounded state.

The batch dedup ladder (operators/dedup.py) assumes a complete corpus;
an ingestion pipeline sees the same document/event again within minutes
(at-least-once sources, retried producers). ``streaming_exact_dedup``
drops re-deliveries with state bounded by the watermark —
``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only until
the watermark passes its event time, so state is O(keys per watermark
window), not O(all keys ever) (the unbounded-state failure mode of plain
``dropDuplicates`` on a stream).

The reference has no streaming surface (SURVEY.md §2.11); its nearest
analogue is upload-time duplicate-file detection
(file_handling/csv_utils.py content fingerprinting), which this extends
to continuous ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_exact_dedup(df: DataFrame, keys: list[str], ts_col: str = "ts",
                          watermark: str = "10 minutes") -> DataFrame:
    """Keep the first arrival per ``keys``; re-deliveries within the
    watermark horizon are dropped, state expires after it. On a batch
    DataFrame this degrades to plain ``dropDuplicates`` (same keep-one
    semantics, no state concern), so one call site serves both the
    backfill and the live path."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return (df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))
