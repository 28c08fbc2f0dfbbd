"""Multimodal columns (X5): image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing — schema, batch iteration, partition sizing —
is real and tested; the actual media decoding is STUBBED because the
image/audio libraries are not available in this environment. Each stub
is deterministic so tests can assert exact outputs; swap `_fake_*` for
Pillow/torchaudio/ffmpeg calls in production.

Scale notes:
- Binary payloads ride in the same parquet row groups as metadata;
  ``spark.sql.files.maxPartitionBytes`` bounds task input so a
  partition of 10 MB blobs still fits executor memory.
- mapInPandas streams Arrow batches — one Python worker per task,
  vectorized transfer; never a per-row Python UDF.
- Feature extraction emits fixed-size vectors, so downstream
  similarity ops (operators/similarity.py) apply unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Unified multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode + feature-extract.

    Real implementation would be e.g. PIL.Image.open + resize + model
    embed; not available here, so features are derived from the md5
    digest — stable, collision-resistant, and unit-testable.
    """
    if payload is None:
        raise NotImplementedError("media decode of null payload")
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame) -> DataFrame:
    """Decode payloads and emit fixed-size feature vectors via
    mapInPandas (Arrow-batched; one Python worker per task)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_decode_features(p) if p is not None else None
                    ),
                }
            )

    return df.mapInPandas(batches, schema=_FEATURES_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize images to (width, height) via mapInPandas.

    Decode/re-encode is stubbed (``NotImplementedError`` on a real
    image MIME; deterministic byte-fold for the fixture payloads) —
    the Spark-side contract is real: same schema in/out, width/height
    metadata updated, non-image rows pass through untouched.
    """

    def _fake_resize(payload: bytes) -> bytes:
        if payload is None:
            return None
        # real impl: PIL.Image.open(io.BytesIO(payload)).resize(...)
        out_len = max(width * height // 64, 1)
        reps = (out_len // max(len(payload), 1)) + 1
        return (payload * reps)[:out_len]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            is_img = pdf["modality"] == "image"
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(_fake_resize)
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            pdf["width"] = pdf["width"].astype("Int32")
            pdf["height"] = pdf["height"].astype("Int32")
            yield pdf

    return df.mapInPandas(batches, schema=MEDIA_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Sample frames from video rows: one output row per sampled frame
    (1-to-N via mapInPandas, the generator shape ffmpeg plumbing
    needs). Frame decode is stubbed deterministically (slice of the
    payload keyed by frame index); duration metadata drives the
    sampling grid, defaulting to one frame when absent.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_payload": []
            }
            vids = pdf[pdf["modality"] == "video"]
            for _, row in vids.iterrows():
                dur = row["duration_ms"]
                n = 1 if pd.isna(dur) else min(int(dur) // every_ms + 1, max_frames)
                payload = row["payload"] or b""
                for i in range(n):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    # real impl: ffmpeg seek+decode at frame_ts_ms
                    out["frame_payload"].append(payload[i : i + 16] if payload else None)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=_FRAMES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: the
    text payload becomes the opaque binary column. Exercises the real
    schema/plumbing without shipping binaries in testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
