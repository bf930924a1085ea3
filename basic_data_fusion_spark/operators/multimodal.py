"""Multimodal (image/audio/video) column operators.

Beyond the reference's surface (BASELINE.json north star): media travel
as opaque ``binary`` columns with typed metadata structs; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas
iterators over ``mapInPandas`` — the only layer in this engine where
Python touches row data, because codecs are Python-side by nature.

The container has no image/audio libraries, so the actual codec step is
gated: with PIL/soundfile present the real decode runs; without them a
clearly-marked deterministic fake (seeded by the content hash) stands in
so the Spark-side plumbing — schema, batch shape, partition sizing,
UDF signatures — is real and testable end-to-end. Swap ``_decode_*``
for real codecs in production; nothing else changes.

Scale notes:
- binary payloads never shuffle except where the operator's semantics
  require it (feature extraction is map-only);
- ``repartition_for_payloads`` sizes partitions by total payload bytes,
  not row count — 1000 × 10 MB images is 10 GB in one task otherwise;
- Arrow batch size is the memory knob: rows_per_batch × payload must fit
  the executor's Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codec gate: real decode if available
    from PIL import Image  # noqa: F401
    HAS_PIL = True
except Exception:
    HAS_PIL = False

IMAGE_META_SCHEMA = StructType([
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
])

IMAGE_TABLE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("data", BinaryType()),
    StructField("meta", IMAGE_META_SCHEMA),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_intensity", DoubleType()),
    StructField("decode_ok", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("feature", ArrayType(DoubleType())),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("frame_data", BinaryType()),
])


def _content_rng_values(data: bytes, n: int) -> list[float]:
    """Deterministic pseudo-values in [0,1) derived from content bytes —
    the STAND-IN for real decoded statistics (not a real decode)."""
    out: list[float] = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(data + counter.to_bytes(4, "little")).digest()
        for i in range(0, 32, 8):
            out.append(int.from_bytes(h[i:i + 8], "little") / 2**64)
            if len(out) >= n:
                break
        counter += 1
    return out


def repartition_for_payloads(df: DataFrame, data_col: str = "data",
                             target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition so each task handles ~target_bytes of payload.
    Row-count partitioning is wrong for media: payload sizes vary by
    1000×. One count+sum pass decides the partition count."""
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.length(data_col)).alias("bytes")).first()
    total = row["bytes"] or 0
    nparts = max(1, int(total / target_bytes) + 1)
    return df.repartition(nparts)


def decode_images(df: DataFrame, id_col: str = "media_id",
                  data_col: str = "data",
                  rows_per_batch: int = 64) -> DataFrame:
    """Decode → (dims, channels, mean intensity). Real decode under PIL;
    deterministic fake otherwise (flagged by ``decode_ok``: 1 = real,
    0 = stand-in)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(rows_per_batch))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                data = bytes(data) if data is not None else b""
                if HAS_PIL:
                    try:
                        import numpy as np
                        from PIL import Image as PILImage

                        img = PILImage.open(io.BytesIO(data))
                        arr = np.asarray(img, dtype="float64")
                        rows.append((mid, img.width, img.height,
                                     arr.shape[2] if arr.ndim == 3 else 1,
                                     float(arr.mean()), 1))
                        continue
                    except Exception:
                        pass
                v = _content_rng_values(data, 3)
                rows.append((mid, int(v[0] * 1024) + 1, int(v[1] * 1024) + 1,
                             3, v[2] * 255.0, 0))
            yield pd.DataFrame(rows, columns=[
                id_col, "width", "height", "channels", "mean_intensity",
                "decode_ok"])

    return df.select(id_col, data_col).mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "media_id",
                     data_col: str = "data", dim: int = 16,
                     rows_per_batch: int = 64) -> DataFrame:
    """Content → dense feature vector (array<double>). The embedding
    model is a deterministic content-hash fake (the real model is a
    production swap-in); the batching/schema/shuffle contract is real —
    output joins directly against the similarity operators."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ])
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(rows_per_batch))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(mid, _content_rng_values(bytes(d) if d is not None else b"", dim))
                    for mid, d in zip(pdf[id_col], pdf[data_col])]
            yield pd.DataFrame(rows, columns=[id_col, "feature"])

    return df.select(id_col, data_col).mapInPandas(run, schema)


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Resize payloads. REAL only under PIL; otherwise raises — a resize
    has no honest fake (the bytes must change meaningfully)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "resize_images requires PIL; container has no image codecs. "
            "The mapInPandas plumbing is identical to decode_images.")

    schema = StructType([
        StructField(id_col, LongType()),
        StructField("data", BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image as PILImage

        for pdf in batches:
            rows = []
            for mid, d in zip(pdf[id_col], pdf[data_col]):
                img = PILImage.open(io.BytesIO(bytes(d)))
                out = io.BytesIO()
                img.resize((width, height)).save(out, format=img.format or "PNG")
                rows.append((mid, out.getvalue()))
            yield pd.DataFrame(rows, columns=[id_col, "data"])

    return df.select(id_col, data_col).mapInPandas(run, schema)


def sample_frames(df: DataFrame, every_n: int = 10, frame_size: int = 1024,
                  id_col: str = "media_id", data_col: str = "data",
                  rows_per_batch: int = 16) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (1→many
    via the pandas iterator). Without a real container parser the
    "frames" are fixed-stride byte slices — a deterministic stand-in
    that preserves the fan-out shape, schema, and memory profile."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(rows_per_batch))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, d in zip(pdf[id_col], pdf[data_col]):
                data = bytes(d) if d is not None else b""
                n_frames = max(1, len(data) // frame_size)
                for fi in range(0, n_frames, every_n):
                    rows.append((mid, fi,
                                 data[fi * frame_size:(fi + 1) * frame_size]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_index", "frame_data"])

    return df.select(id_col, data_col).mapInPandas(run, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("rms_level", DoubleType()),
    StructField("peak_level", DoubleType()),
    StructField("decode_ok", IntegerType()),
])


def decode_audio(df: DataFrame, id_col: str = "media_id",
                 data_col: str = "data",
                 rows_per_batch: int = 64) -> DataFrame:
    """Audio decode → (sample_rate, duration, RMS/peak level). The audio
    codecs (soundfile/librosa) are not in this container, so the decode
    is a DETERMINISTIC STAND-IN (content-hash derived, ``decode_ok=0``);
    the Spark-side plumbing — binary column in, Arrow batch shapes,
    typed metadata out — is the real contract a codec drops into (swap
    the body of the per-row branch, keep the schema)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(rows_per_batch))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rates = [8000, 16000, 22050, 44100, 48000]
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                data = bytes(data) if data is not None else b""
                v = _content_rng_values(data, 4)
                rows.append((mid, rates[int(v[0] * len(rates))],
                             round(v[1] * 600.0, 3),
                             round(v[2] * 0.5, 6),
                             round(min(1.0, v[2] * 0.5 + v[3] * 0.5), 6), 0))
            yield pd.DataFrame(rows, columns=[
                id_col, "sample_rate", "duration_s", "rms_level",
                "peak_level", "decode_ok"])

    return df.select(id_col, data_col).mapInPandas(run, AUDIO_SCHEMA)
