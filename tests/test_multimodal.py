"""X5 multimodal plumbing tests: schema round-trip, feature
extraction, resize metadata, frame sampling fan-out. Decode stubs are
deterministic, so outputs are exact."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.operators import multimodal as MM
from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, "documents", SF).limit(30)
    return MM.media_from_documents(docs).cache()


def test_features_deterministic_md5_fold(spark, media):
    out = MM.extract_features(media).filter(F.col("media_id") == 0).collect()[0]
    src = media.filter(F.col("media_id") == 0).collect()[0]
    digest = hashlib.md5(bytes(src.payload)).digest()
    assert out.payload_bytes == len(bytes(src.payload))
    assert [round(x, 6) for x in out.feature] == [
        round(b / 255.0, 6) for b in digest[: MM.FEATURE_DIM]
    ]


def test_resize_updates_image_rows_only(spark, media):
    out = MM.resize_media(media, 64, 32)
    rows = out.collect()
    # schema-stable pass (nullability flags may differ)
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in media.schema
    ]
    for r in rows:
        if r.modality == "image":
            assert (r.width, r.height) == (64, 32)
            assert len(bytes(r.payload)) == 64 * 32 // 64
        else:
            assert r.width is None and r.height is None


def test_sample_frames_fanout(spark, media):
    # give every video a 3500 ms duration -> 4 frames at 1000 ms grid
    vids = media.withColumn(
        "duration_ms",
        F.when(F.col("modality") == "video", F.lit(3500)).otherwise(F.col("duration_ms")),
    )
    n_videos = vids.filter(F.col("modality") == "video").count()
    frames = MM.sample_frames(vids, every_ms=1000)
    assert frames.count() == n_videos * 4
    one = frames.filter(F.col("media_id") == 2).orderBy("frame_idx").collect()
    assert [r.frame_ts_ms for r in one] == [0, 1000, 2000, 3000]
