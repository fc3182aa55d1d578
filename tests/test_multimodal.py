"""Multimodal plumbing tests: schema/batch-shape/cardinality of the
mapInPandas media operators, with the deterministic fake codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.multimodal.binary import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_features,
    partition_for_decode,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"m{i}", bytes([i] * (100 + i)), "image" if i % 2 == 0 else "video",
         {"mime": "image/png" if i % 2 == 0 else "video/mp4",
          "width": 64, "height": 64,
          "duration_ms": 3500 if i % 2 else None, "sample_rate": None})
        for i in range(10)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_features_shape_and_determinism(media):
    out = decode_features(media, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 10
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows.values())
    assert rows["m0"]["n_bytes"] == 100
    again = {r["media_id"]: r for r in decode_features(media, fake=True).collect()}
    assert rows["m3"]["feature"] == again["m3"]["feature"]


def test_decode_without_codec_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_features(media, fake=False).collect()


def test_resize_updates_meta_and_content(media):
    out = resize_images(media, 8, 8, fake=True)
    assert out.schema == MEDIA_SCHEMA
    r = out.where(F.col("media_id") == "m1").collect()[0]
    assert len(bytes(r["content"])) == 64
    assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
    assert r["meta"]["duration_ms"] == 3500  # untouched fields survive


def test_sample_frames_cardinality(media):
    out = sample_frames(media, every_ms=1000, fake=True)
    # videos only (duration 3500ms → 3 frames each), images → 0 frames
    counts = {r["media_id"]: r["n"] for r in out.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in counts.values())
    assert set(counts) == {f"m{i}" for i in range(10) if i % 2 == 1}


def test_partition_for_decode_splits(media):
    out = partition_for_decode(media, target_bytes_per_task=300)
    assert out.rdd.getNumPartitions() >= 3
    assert out.count() == 10
