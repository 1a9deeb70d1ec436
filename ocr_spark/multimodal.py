"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched UDFs.

The image path is real (our PNG codec + numpy kernels). Audio decode and
video frame-sampling need codec libraries that are absent in this
container, so those decoders are stubbed behind import-tries with a
clearly marked NotImplementedError — the Spark-side plumbing (schemas,
UDF signatures, batch shapes, partitioning) is real and tested, and a
deterministic fake keeps the pipeline exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

IMAGE_STATS_SCHEMA = (
    "media_ref string, width int, height int, channels int, "
    "mean_intensity double, std_intensity double, decode_ok boolean"
)

THUMBNAIL_SCHEMA = "media_ref string, thumb binary, thumb_w int, thumb_h int"

AUDIO_FEATURES_SCHEMA = (
    "media_ref string, n_samples bigint, duration_s double, rms double, "
    "decode_ok boolean"
)

VIDEO_FRAMES_SCHEMA = "media_ref string, frame_idx int, frame_png binary"


def image_stats_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode PNG payloads and emit typed per-image stats."""
    from ocr_spark.imaging.png import decode_png

    for b in batches:
        rows = []
        for r in b.itertuples():
            data = bytes(r.png) if r.png is not None else b""
            try:
                img = decode_png(data)
                ch = 1 if img.ndim == 2 else img.shape[2]
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "channels": ch,
                        "mean_intensity": round(float(img.mean()), 6),
                        "std_intensity": round(float(img.std()), 6),
                        "decode_ok": True,
                    }
                )
            except Exception:  # noqa: BLE001 — undecodable -> typed skip row
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "width": 0,
                        "height": 0,
                        "channels": 0,
                        "mean_intensity": 0.0,
                        "std_intensity": 0.0,
                        "decode_ok": False,
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "media_ref", "width", "height", "channels",
                "mean_intensity", "std_intensity", "decode_ok",
            ],
        )


def make_thumbnail_udf(size: int = 64):
    """Resize every decodable image to size x size (real, bilinear)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_spark.imaging.kernels import resize_bilinear, to_gray
        from ocr_spark.imaging.png import decode_png, encode_png

        for b in batches:
            rows = []
            for r in b.itertuples():
                data = bytes(r.png) if r.png is not None else b""
                try:
                    img = to_gray(decode_png(data))
                except Exception:  # noqa: BLE001
                    continue
                thumb = resize_bilinear(img, size, size)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "thumb": encode_png(thumb),
                        "thumb_w": size,
                        "thumb_h": size,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "thumb", "thumb_w", "thumb_h"]
            )

    return fn


def _decode_audio(data: bytes) -> np.ndarray:
    """Real audio decode needs soundfile/ffmpeg — absent here.

    STUB: raises unless a deterministic fake is requested by the caller.
    """
    try:
        import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this container); "
            "use fake=True for the deterministic stand-in"
        ) from None
    raise NotImplementedError("real audio path not wired in this build")


def _fake_samples(data: bytes, n: int = 16000) -> np.ndarray:
    """Deterministic stand-in: bytes -> seeded waveform (same shape the
    real decoder would produce), so partitioning/batching is testable."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


def make_audio_features_udf(sample_rate: int = 16000, fake: bool = True):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                data = bytes(r.png) if r.png is not None else b""
                samples = _fake_samples(data) if fake else _decode_audio(data)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "n_samples": len(samples),
                        "duration_s": round(len(samples) / sample_rate, 6),
                        "rms": round(float(np.sqrt(np.mean(samples**2))), 6),
                        "decode_ok": True,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "n_samples", "duration_s", "rms", "decode_ok"],
            )

    return fn


def make_frame_sample_udf(every_n: int = 10, fake: bool = True):
    """Video frame sampling. Real decode needs ffmpeg — STUBBED; the fake
    treats the payload as a single-frame 'video' (its PNG), emitting the
    frames the real sampler would."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "video decode requires ffmpeg (not in this container)"
            )
        for b in batches:
            rows = []
            for r in b.itertuples():
                data = bytes(r.png) if r.png is not None else b""
                if not data:
                    continue
                rows.append(
                    {"media_ref": r.media_ref, "frame_idx": 0, "frame_png": data}
                )
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "frame_png"])

    return fn
