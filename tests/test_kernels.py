import numpy as np
import pytest

from ocr_spark.imaging import kernels as K


def test_to_gray_weights():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[..., 0] = 255  # pure red
    assert int(K.to_gray(img)[0, 0]) == 76  # round(0.299*255)


def test_otsu_bimodal():
    img = np.concatenate([np.full(500, 30), np.full(500, 220)]).astype(np.uint8)
    t = K.otsu_threshold(img.reshape(20, 50))
    assert 30 <= t < 220
    b = K.binarize_otsu(img.reshape(20, 50))
    assert set(np.unique(b)) == {0, 255}


def test_binarize_otsu_invert():
    img = np.full((10, 10), 255, dtype=np.uint8)
    img[2:5, 2:5] = 0
    inv = K.binarize_otsu(img, invert=True)
    assert inv[3, 3] == 255 and inv[0, 0] == 0


def test_adaptive_keeps_small_marks():
    img = np.full((100, 100), 255, dtype=np.uint8)
    img[40:44, 40:44] = 0  # 4x4 mark, below any block size
    b = K.binarize_adaptive(img)
    assert b[41, 41] == 0 and b[10, 10] == 255


def test_normalize_minmax():
    img = (np.linspace(100, 160, 100).reshape(10, 10)).astype(np.uint8)
    out = K.normalize_minmax(img)
    assert out.min() == 0 and out.max() == 255


def test_median3_removes_salt():
    img = np.full((30, 30), 255, dtype=np.uint8)
    img[10, 10] = 0  # isolated pepper
    assert K.median3(img)[10, 10] == 255


def test_rotate_expand_geometry():
    img = np.full((100, 200), 255, dtype=np.uint8)
    out = K.rotate_expand(img, 90.0)
    # 90-degree rotation swaps dimensions (within rounding)
    assert abs(out.shape[0] - 200) <= 1 and abs(out.shape[1] - 100) <= 1


@pytest.mark.parametrize("angle", [-9.0, -4.0, -1.8, 1.8, 4.0, 9.0])
def test_hough_skew_roundtrip(angle):
    from ocr_spark.extract.glyph import render_page

    page = render_page(["hello world", "abc def ghi", "foo bar baz"], 640, 400)
    rot = K.rotate_expand(page, angle)
    det = K.hough_skew(rot)
    assert abs(det - angle) < 0.5
    # correction convention: rotate_expand(img, -detected) levels the image
    fixed = K.rotate_expand(rot, -det)
    assert abs(K.hough_skew(fixed)) < 0.5


def test_hough_skew_level_is_zero():
    from ocr_spark.extract.glyph import render_page

    page = render_page(["hello world", "abc def"], 640, 300)
    assert abs(K.hough_skew(page)) < 0.3


def test_connected_components():
    mask = np.zeros((20, 20), dtype=bool)
    mask[2:5, 2:6] = True  # area 12
    mask[10:12, 10:12] = True  # area 4
    mask[15, 0] = True  # area 1
    comps = K.connected_components(mask, min_area=2)
    assert len(comps) == 2
    assert (2, 2, 4, 3, 12) in comps and (10, 10, 2, 2, 4) in comps


def test_connected_components_diagonal_8conn():
    mask = np.zeros((5, 5), dtype=bool)
    mask[1, 1] = True
    mask[2, 2] = True  # diagonal touch -> one component
    comps = K.connected_components(mask, min_area=0)
    assert len(comps) == 1 and comps[0][4] == 2


def test_dilate():
    mask = np.zeros((11, 11), dtype=bool)
    mask[5, 5] = True
    out = K.dilate(mask, k=5, iterations=2)
    assert out[1, 1] and out[9, 9] and not out[0, 0]


def test_resize_shapes_and_identity():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    assert K.resize_bilinear(img, 10, 10) is not img
    assert K.resize_bilinear(img, 23, 17).shape == (17, 23)
    rgb = np.stack([img] * 3, axis=-1)
    assert K.resize_bilinear(rgb, 30, 20).shape == (20, 30, 3)


def test_estimate_noise_gate():
    rng = np.random.default_rng(3)
    clean = np.full((200, 200), 255, dtype=np.uint8)
    assert K.estimate_noise(clean) < 0.05
    noisy = np.where(
        rng.random(clean.shape) < 0.08,
        rng.integers(0, 2, clean.shape).astype(np.uint8) * 255,
        clean,
    ).astype(np.uint8)
    assert K.estimate_noise(noisy) > 0.1
