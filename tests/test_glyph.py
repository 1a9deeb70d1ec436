import numpy as np
import pytest

from ocr_spark.extract.glyph import (
    MAX_BYTES_PER_LINE,
    extract_text,
    render_page,
    wrap_line,
)
from ocr_spark.imaging import kernels as K

LINES = ["hello world", "abc 123", "quick brown"]
EXPECTED = "\n".join(LINES)


def _page():
    return render_page(LINES, 640, 400)


def test_plain_roundtrip():
    text, conf = extract_text(_page())
    assert text == EXPECTED and conf == 1.0


def test_utf8_roundtrip():
    lines = ["héllo", "كتاب1", "日本2"]
    page = render_page(lines, 640, 400)
    text, conf = extract_text(page)
    assert text == "\n".join(lines) and conf == 1.0


@pytest.mark.parametrize("f", [1.15, 1.7, 2.07, 3.0, 300 / 72])
def test_scaled_roundtrip(f):
    page = _page()
    up = K.resize_bilinear(page, int(640 * f), int(400 * f))
    text, conf = extract_text(up)
    assert text == EXPECTED and conf == 1.0


@pytest.mark.parametrize("angle", [-8.0, -3.0, 2.2, 6.0])
def test_skew_correct_then_decode(angle):
    rot = K.rotate_expand(_page(), angle)
    det = K.hough_skew(rot)
    fixed = K.rotate_expand(rot, -det)
    text, conf = extract_text(fixed)
    assert text == EXPECTED and conf == 1.0


def test_binarized_roundtrip():
    for fn in (K.binarize_otsu, K.binarize_adaptive):
        text, conf = extract_text(fn(_page()))
        assert text == EXPECTED and conf == 1.0


def test_uncorrected_skew_fails():
    # the decoder must be SENSITIVE to preprocessing mistakes: an
    # uncorrected 6-degree skew cannot decode cleanly (SURVEY.md §7.3)
    rot = K.rotate_expand(_page(), 6.0)
    text, conf = extract_text(rot)
    assert text != EXPECTED


def test_empty_and_blank():
    assert extract_text(np.full((50, 50), 255, dtype=np.uint8)) == ("", 0.0)
    assert extract_text(np.zeros((3, 3), dtype=np.uint8)) == ("", 0.0)


def test_wrap_line():
    assert wrap_line("a" * 40) == ["a" * 15, "a" * 15, "a" * 10]
    assert wrap_line("") == [""]
    # utf-8 aware: arabic chars are 2 bytes
    parts = wrap_line("كتاب" * 5)
    assert all(len(p.encode("utf-8")) <= MAX_BYTES_PER_LINE for p in parts)


def test_too_long_line_raises():
    with pytest.raises(ValueError):
        render_page(["x" * (MAX_BYTES_PER_LINE + 1)], 800, 100)


def test_partial_band_is_skipped_not_garbage():
    page = _page()
    # cut vertically through the middle of the lines: bands lose a sync bar
    clipped = page[:, : page.shape[1] // 4]
    text, conf = extract_text(clipped)
    assert conf < 1.0
