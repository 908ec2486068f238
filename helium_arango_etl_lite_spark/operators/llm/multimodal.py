"""Multimodal column plumbing (SURVEY.md section 2.8).

Image/audio/video ride through the engine as opaque ``binary`` columns with
a typed metadata struct. The Spark-side plumbing — schema, batch iteration,
partition sizing — is real and tested; the actual media decode is stubbed
behind ``NotImplementedError`` / a deterministic fake because the media
libraries (PIL/ffmpeg/torchaudio) are not in this container.

Scale notes: binary payloads make row groups huge — the readers of such
tables must drop ``spark.sql.files.maxPartitionBytes`` and use
``mapInPandas`` (streamed Arrow batches, bounded memory) rather than
collect-style UDFs; that is the shape implemented here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("meta", StructType([
            StructField("mime", StringType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("duration_ms", LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    """Placeholder for the actual media decode (PIL / ffmpeg / soundfile).
    Not available in this environment by design."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this container"
    )


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: byte-histogram folded into
    ``dim`` buckets, normalised. Lets the full pipeline (batch shapes, Arrow
    round-trip, schema) be exercised and asserted without media libs.

    Vectorised with numpy — the point of the Arrow/pandas batch path is
    that the Python stage runs array-at-a-time, not byte-at-a-time; a real
    decoder (PIL/ffmpeg) is likewise a C call per payload.
    """
    if payload is None:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8) % dim
    counts = np.bincount(arr, minlength=dim)
    return (counts / max(1, len(payload))).tolist()


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas chunk holds a bounded slice of rows, so
    executor memory stays flat regardless of table size. This is the
    canonical shape for any decode/resize/frame-sample stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["content"].map(lambda b: fake_feature(b, dim)),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


CHECKED_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def extract_features_checked(media: DataFrame, dim: int = 8) -> DataFrame:
    """Oracle-checkable twin of :func:`extract_features`: same mapInPandas
    plumbing, but features emitted as array<double> rounded to 6dp so an
    ANSI-SQL oracle can reproduce the values exactly (the payloads under
    test are ASCII, so byte == codepoint on the SQL side).

    Rounding is half-away-from-zero, NOT Python's half-to-even ``round`` —
    SQL engines round half away, and power-of-two payload lengths hit
    exact .5 cases where the two conventions differ.
    """
    def checked(b: bytes | None) -> list[float]:
        f = np.asarray(fake_feature(b, dim))
        # half-away-from-zero at 6dp, vectorised
        return (np.floor(f * 1e6 + 0.5) / 1e6).tolist()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf["content"].map(checked),
                }
            )

    return media.mapInPandas(batches, CHECKED_FEATURE_SCHEMA)


def text_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: documents.text encoded as a binary
    payload with metadata — gives the multimodal path real data to chew."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("text").alias("width"),
            F.lit(1).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
