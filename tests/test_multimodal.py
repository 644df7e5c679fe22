"""Multimodal plumbing: schemas, stub gating, resize math, frame explode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_12_0_spark.operators.multimodal import (
    decode_media,
    extract_features,
    make_media_table,
    resize_images,
    sample_frames,
)
from flink_1_12_0_spark.tables import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    t = load_tables(spark, SF_DIR)
    return make_media_table(t["documents"])


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["meta"].startswith("struct<mime:string,width:int,height:int")


def test_decode_stub_gating(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(media, real=True).collect()
    row = decode_media(media).where(F.col("media_id") == 0).collect()[0]
    assert row["n_bytes"] > 0 and 0 <= row["mean_level"] < 256


def test_feature_vector_shape(media):
    rows = extract_features(media, dim=8).limit(5).collect()
    for r in rows:
        assert len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])


def test_resize_clamps_aspect(media):
    out = resize_images(media, 100, 100).select("media_id", "meta.width", "meta.height")
    for r in out.collect():
        assert r["width"] <= 100 and r["height"] <= 100


def test_sample_frames_only_videos(media):
    frames = sample_frames(media, fps=2.0)
    mimes = {r["mime"] for r in frames.select("meta.mime").distinct().collect()}
    assert mimes == {"video/mp4"}
    one = frames.where(F.col("media_id") == 2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in one] == list(range(len(one)))
