"""Multimodal plumbing tests: binary schema contract, mapInPandas batch
shape, stubbed codec behavior, frame-sample planning."""

from __future__ import annotations

import pytest

from octopusdb_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    resize_stub,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG\r\n" + b"x" * 500, 64, 64, None),
        (2, "audio", b"RIFF" + b"y" * 1000, None, None, 2500),
        (3, "video", b"\x00\x00\x01\xba" + b"z" * 2000, 320, 240, 1000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_batch_shape(media_df):
    out = extract_features(media_df).collect()
    assert len(out) == 3
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["byte_len"] == 506
    assert by_id[2]["byte_len"] == 1004
    assert all(r["feat_dim"] == 3 for r in out)
    # deterministic stub: same input → same features
    out2 = extract_features(media_df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_unknown_media_type_raises(spark, media_df):
    bad = spark.createDataFrame([(9, "hologram", b"abc", None, None, None)], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="hologram"):
        extract_features(bad).collect()


def test_resize_stub_metadata_only(media_df):
    out = resize_stub(media_df, 128, 128).collect()
    assert all(r["meta_width"] == 128 and r["meta_height"] == 128 for r in out)
    orig = {r["media_id"]: bytes(r["payload"]) for r in media_df.collect()}
    assert all(bytes(r["payload"]) == orig[r["media_id"]] for r in out)


def test_frame_sample_plan(media_df):
    frames = frame_sample_plan(media_df, every_ms=250).collect()
    # only the video row (id=3, 1000ms) → ts 0,250,500,750,1000
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 250, 500, 750, 1000]
    assert {r["media_id"] for r in frames} == {3}
