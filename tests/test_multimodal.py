"""Multimodal binary-column plumbing: image stats/thumbnails (real) and
the stubbed audio/video decoders keep typed schemas and batch shapes."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.imaging.png import decode_png, encode_png
from ocr_spark.multimodal import (
    AUDIO_FEATURES_SCHEMA,
    IMAGE_STATS_SCHEMA,
    THUMBNAIL_SCHEMA,
    VIDEO_FRAMES_SCHEMA,
    _decode_audio,
    image_stats_udf,
    make_audio_features_udf,
    make_frame_sample_udf,
    make_thumbnail_udf,
)


@pytest.fixture(scope="module")
def media_df(spark):
    imgs = [
        ("m_gray", np.full((40, 60), 128, dtype=np.uint8)),
        ("m_rgb", np.zeros((20, 30, 3), dtype=np.uint8)),
    ]
    rows = [(ref, encode_png(a), a.shape[1], a.shape[0]) for ref, a in imgs]
    rows.append(("m_bad", b"not a png", 0, 0))
    return spark.createDataFrame(
        rows, "media_ref string, png binary, width int, height int"
    )


def test_image_stats(spark, media_df):
    out = {
        r["media_ref"]: r
        for r in media_df.mapInPandas(image_stats_udf, IMAGE_STATS_SCHEMA).collect()
    }
    assert out["m_gray"]["width"] == 60 and out["m_gray"]["channels"] == 1
    assert out["m_gray"]["mean_intensity"] == 128.0
    assert out["m_rgb"]["channels"] == 3
    assert out["m_bad"]["decode_ok"] is False


def test_thumbnail(spark, media_df):
    out = media_df.mapInPandas(make_thumbnail_udf(16), THUMBNAIL_SCHEMA).collect()
    refs = {r["media_ref"] for r in out}
    assert refs == {"m_gray", "m_rgb"}  # undecodable row dropped
    for r in out:
        t = decode_png(bytes(r["thumb"]))
        assert t.shape == (16, 16)


def test_audio_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        _decode_audio(b"RIFF....")


def test_audio_fake_deterministic(spark, media_df):
    out1 = media_df.mapInPandas(
        make_audio_features_udf(fake=True), AUDIO_FEATURES_SCHEMA
    ).collect()
    out2 = media_df.mapInPandas(
        make_audio_features_udf(fake=True), AUDIO_FEATURES_SCHEMA
    ).collect()
    k = lambda rows: sorted((r["media_ref"], r["rms"]) for r in rows)  # noqa: E731
    assert k(out1) == k(out2)
    assert all(r["n_samples"] == 16000 for r in out1)


def test_frame_sample_fake(spark, media_df):
    out = media_df.mapInPandas(
        make_frame_sample_udf(fake=True), VIDEO_FRAMES_SCHEMA
    ).collect()
    assert {r["media_ref"] for r in out} == {"m_gray", "m_rgb", "m_bad"}
    assert all(r["frame_idx"] == 0 for r in out)
