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

    Per-payload form, kept as the semantic spec; the batch path below
    (:func:`_batch_features`) computes the same histogram for a whole Arrow
    chunk in one ``bincount`` and is what the mapInPandas stages use.
    """
    if payload is None:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8) % dim
    counts = np.bincount(arr, minlength=dim)
    return (counts / max(1, len(payload))).tolist()


def _batch_features(contents: pd.Series, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch histogram: one pass, no per-row Python.

    Concatenates every payload in the chunk into a single byte buffer and
    scatter-counts ``row_index * dim + byte % dim`` with one ``bincount``
    (a segmented histogram — the same trick a real decoder stage would use
    to amortise per-call overhead). Returns (n_bytes[rows], hist[rows, dim]
    normalised). Null payloads contribute an all-zero row.
    """
    vals = contents.to_numpy(dtype=object)
    n = len(vals)
    lens = np.fromiter(
        (0 if b is None else len(b) for b in vals), dtype=np.int64, count=n
    )
    blob = b"".join(b for b in vals if b is not None and len(b) > 0)
    hist = np.zeros((n, dim), dtype=np.int64)
    if blob:
        bytes8 = np.frombuffer(blob, dtype=np.uint8).astype(np.int64) % dim
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        flat = np.bincount(row_idx * dim + bytes8, minlength=n * dim)
        hist = flat.reshape(n, dim)
    feat = hist / np.maximum(1, lens)[:, None]
    return lens, feat


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas chunk holds a bounded slice of rows, so
    executor memory stays flat regardless of table size, and the Python
    stage is one vectorised histogram per chunk (no per-row loop). This is
    the canonical shape for any decode/resize/frame-sample stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens, feat = _batch_features(pdf["content"], dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": lens,
                    "feature": list(feat.astype(np.float32)),
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
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens, feat = _batch_features(pdf["content"], dim)
            # half-away-from-zero at 6dp, whole-matrix
            feat = np.floor(feat * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": lens,
                    "feature": list(feat),
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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame_sig", StringType(), True),
    ]
)


def frame_sample(
    media: DataFrame, frame_ms: int = 40, k: int = 4
) -> DataFrame:
    """Uniform video frame sampling: pick ``k`` evenly spaced frames from
    each clip's timeline and emit one row per sampled frame.

    The Spark-side plumbing is entirely real and JVM-side: the frame count
    derives from the metadata struct (duration / frame interval), the
    sampled indices are a ``transform(sequence(...))`` array (distinct, so
    short clips yield fewer rows), and the fan-out is one ``explode`` — the
    same row-multiplying shape as the reference's witness explode
    (reference follower.py:180-202), applied to media. The decode of the
    frame at ``ts_ms`` is the stubbed step (:func:`real_decode`); the
    deterministic stand-in slices the payload proportionally to the frame
    position and signs it with md5, so tests and the SQL oracle can pin
    every row. At 100 TB this stage runs BEFORE any decode: sampling on
    metadata costs one scan of (id, meta) with the binary column pruned
    away, and only sampled frames ever reach the expensive decoder.
    """
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / F.lit(frame_ms)).cast("long")
    )
    idx = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: (i * n_frames / F.lit(k)).cast("long"),
        )
    )
    exploded = media.select(
        "media_id",
        "content",
        n_frames.alias("n_frames"),
        F.explode(idx).alias("frame_idx"),
    )
    # deterministic stand-in for the decode: slice 16 bytes at the frame's
    # proportional offset and sign them (real_decode is the stubbed step)
    off = (
        F.col("frame_idx")
        * (F.octet_length("content") / F.col("n_frames"))
    ).cast("long")
    return exploded.withColumn("_off", off).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * frame_ms).alias("ts_ms"),
        F.md5(
            F.expr("substring(content, cast(_off + 1 as int), 16)")
        ).alias("frame_sig"),
    )
