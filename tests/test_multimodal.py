"""Multimodal plumbing tests: schema, batch shape, decode stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG" + bytes(range(200)), "png", 640, 480, None, None),
        (2, "image", b"\xff\xd8JPEG" + bytes(100), "jpeg", 32, 48, None, None),
        (3, "audio", b"RIFFWAVE" + bytes(300), "wav", None, None, None, 16000),
        (4, "video", b"\x00mp4" + bytes(500), "mp4", 1920, 1080, 25, None),
        (5, "image", None, "png", 8, 8, None, None),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


@pytest.fixture(autouse=True)
def _register_fakes():
    mm.register_decoder("image", mm.fake_decoder)
    mm.register_decoder("audio", mm.fake_decoder)
    mm.register_decoder("video", mm.fake_decoder)
    yield
    mm._DECODERS.clear()


def test_extract_features_shape_and_determinism(media_df):
    out = mm.extract_features(media_df)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,"
        "feature:array<double>>"
    )
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 5
    assert all(len(r.feature) == 64 for r in rows.values())
    assert rows[1].n_bytes == 204
    assert rows[5].n_bytes == 0  # null payload → empty, not crash
    # deterministic: same content → same features
    again = {r.media_id: r for r in mm.extract_features(media_df).collect()}
    assert rows[1].feature == again[1].feature


def test_extract_features_matches_local_decoder(media_df):
    payload = b"\x89PNG" + bytes(range(200))
    expect = mm.fake_decoder(payload, "png")
    got = (
        mm.extract_features(media_df)
        .filter(F.col("media_id") == 1)
        .collect()[0]
        .feature
    )
    np.testing.assert_allclose(got, expect)


def test_unregistered_kind_raises(spark, media_df):
    mm._DECODERS.clear()
    with pytest.raises(Exception, match="no decoder registered"):
        mm.extract_features(media_df).collect()


def test_sample_frames_explodes_only_videos(media_df):
    out = mm.sample_frames(media_df, every_nth=10).collect()
    assert {r.media_id for r in out} == {4}
    assert [r.frame_index for r in out] == [0, 10, 20]
    assert all(isinstance(r.frame_bytes, (bytes, bytearray)) for r in out)


def test_resize_metadata_never_touches_payload(media_df):
    out = mm.resize_metadata(media_df, max_side=256)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    rows = {r.media_id: r for r in out.collect()}
    assert (rows[4].resized_width, rows[4].resized_height) == (256, 144)
    assert (rows[2].resized_width, rows[2].resized_height) == (32, 48)
    # planning half is pure column math on metadata columns
    assert "pythonUDF" not in plan.lower()
