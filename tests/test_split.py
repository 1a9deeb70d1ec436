"""Splitter semantics against the reference rules (SURVEY.md §2.5)."""

import numpy as np

from ocr_spark.config import SplitConfig
from ocr_spark.fixtures import page_components, page_grid, page_projection
from ocr_spark.splitting.split import (
    _grid_rows_cols,
    _grid_size,
    _select_nearest_gaps,
    _filter_min_size,
    _target_chunks,
    analyze_layout,
    needs_splitting,
    smart_split,
    split_grid,
)

CFG = SplitConfig()


def test_needs_splitting_thresholds():
    assert not needs_splitting((1000, 1000), CFG)  # 1 MP, dims ok
    assert needs_splitting((1500, 1500), CFG)  # 2.25 MP
    assert needs_splitting((100, 2100), CFG)  # dimension trigger
    assert needs_splitting((2100, 100), CFG)


def test_target_chunks_arithmetic():
    # projection.py:104-117: max(ceil(MP/2), ceil(w/2048)*ceil(h/2048), 2)
    assert _target_chunks(1500, 1500, CFG) == 2
    assert _target_chunks(3000, 3000, CFG) == 5  # 9MP/2 = 4.5 -> 5 > 2*2
    assert _target_chunks(4100, 100, CFG) == 3  # dims: 3*1, mp: 1


def test_grid_rows_cols():
    assert _grid_rows_cols(2) == (2, 1)
    assert _grid_rows_cols(5) == (3, 2)
    assert _grid_rows_cols(9) == (3, 3)


def test_select_nearest_gaps():
    # greedy closest-to-ideal (projection.py:170-209)
    assert _select_nearest_gaps([100, 480, 900], 1, 1000) == [480]
    assert _select_nearest_gaps([100, 200], 3, 1000) == [100, 200]
    assert _select_nearest_gaps([], 2, 1000) == []


def test_filter_min_size_sequential():
    # both sides of each split must be >= min_chunk_size as we go
    assert _filter_min_size([100, 600], 1000, 256) == [600]
    assert _filter_min_size([300, 400, 700], 1000, 256) == [300, 700]
    assert _filter_min_size([900], 1000, 256) == []


def test_projection_page_splits_on_gaps():
    rng = np.random.default_rng(0)
    out = smart_split(page_projection(rng), CFG)
    assert out.split_method == "projection" and out.was_split
    # cuts must pass through whitespace: every chunk decodes cleanly later
    rows, cols = out.grid_shape
    assert cols == 1 and rows >= 2


def test_components_page_uses_component_splitter():
    rng = np.random.default_rng(0)
    page = page_components(rng)
    layout = analyze_layout(page, CFG)
    assert not layout.h_gap_positions  # dashes defeat projection
    out = smart_split(page, CFG)
    assert out.split_method == "components" and out.was_split


def test_grid_page_falls_back_to_grid_with_overlap():
    rng = np.random.default_rng(0)
    out = smart_split(page_grid(rng), CFG)
    assert out.split_method == "grid" and out.was_split
    rows, cols = out.grid_shape
    assert rows >= 2
    interior = [c for c in out.chunks if 0 < c.row < rows - 1]
    assert all(c.overlap_top > 0 and c.overlap_bottom > 0 for c in interior)


def test_small_image_passthrough():
    img = np.full((500, 500), 255, dtype=np.uint8)
    out = smart_split(img, CFG)
    assert not out.was_split and out.split_method == "none"
    assert len(out.chunks) == 1 and out.chunks[0].width == 500


def test_grid_rtl_horizontal_strips():
    # prefer_horizontal_splits reshapes to strips (grid.py:111-127)
    cfg = SplitConfig(prefer_horizontal_splits=True)
    # 3x3 grid, total 9 > 4 -> cols capped at 2, rows = ceil(9/2) = 5
    assert _grid_size(2500, 2500, cfg) == (5, 2)
    # small grid (2x2, total <= 4) -> single column of horizontal strips
    assert _grid_size(1100, 1100, cfg) == (4, 1)


def test_grid_overlap_arithmetic():
    img = np.full((2000, 2000), 255, dtype=np.uint8)
    out = split_grid(img, CFG)
    rows, cols = out.grid_shape
    base_h, base_w = 2000 / rows, 2000 / cols
    ov_y, ov_x = int(base_h * 0.4), int(base_w * 0.4)
    for c in out.chunks:
        assert c.overlap_top == (ov_y if c.row > 0 else 0)
        assert c.overlap_left == (ov_x if c.col > 0 else 0)
        assert c.image.shape == (c.height, c.width)


def test_chunk_coverage_reassembles_page():
    # non-overlapping splitters tile the page exactly
    rng = np.random.default_rng(1)
    page = page_projection(rng)
    out = smart_split(page, CFG)
    recon = np.zeros_like(page)
    for c in out.chunks:
        recon[c.y : c.y + c.height, c.x : c.x + c.width] = c.image
    assert np.array_equal(recon, page)
