import numpy as np
import pytest

from ocr_spark.imaging.png import decode_png, encode_png


@pytest.mark.parametrize("shape", [(7, 5), (16, 9, 3), (8, 8, 4)])
def test_roundtrip(shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_roundtrip_large_gray():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(512, 321), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


@pytest.mark.parametrize("junk", [b"", b"not a png", b"\x89PNG\r\n\x1a\n" + b"xx"])
def test_reject_garbage(junk):
    with pytest.raises(ValueError):
        decode_png(junk)


def test_reject_bad_dims():
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.float32))
