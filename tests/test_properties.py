"""Property-based tests (SURVEY.md §5.4) over the pure-Python stages."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.config import MergeConfig
from ocr_spark.extract.glyph import extract_text, render_page, wrap_line
from ocr_spark.extract.inferlog import parse_infer_output
from ocr_spark.merge.merger import ChunkText, merge_chunks
from ocr_spark.textproc.boilerplate import extract_main_content

_SET = settings(deadline=None, max_examples=40)

# printable ASCII words, glyph-safe (<= 13 bytes per line)
_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=6
)
_line = st.builds(lambda a, b: f"{a} {b}"[:13], _word, _word)


@_SET
@given(st.lists(_line, min_size=1, max_size=8))
def test_glyph_roundtrip_random_lines(lines):
    n_rendered = sum(len(wrap_line(l)) for l in lines)
    # margin=24 top+bottom, CELL=18 per line + CELL line_gap between
    page = render_page(lines, width=420, height=60 + 36 * n_rendered)
    text, conf = extract_text(page)
    assert text == "\n".join(lines)
    assert conf == 1.0


@_SET
@given(st.text(max_size=400))
def test_boilerplate_idempotent(text):
    once = extract_main_content(text)
    assert extract_main_content(once) == once


@_SET
@given(st.lists(_line, min_size=1, max_size=9), st.booleans())
def test_merge_preserves_reading_order_without_overlap(texts, rtl):
    """Unique non-overlapping chunk texts come back in (row, col) order
    (reversed cols for RTL), joined by the section separator."""
    uniq = [f"{i:02d}{t}" for i, t in enumerate(texts)]
    cols = 3
    chunks = [
        ChunkText(row=i // cols, col=i % cols, text=t, confidence=1.0)
        for i, t in enumerate(uniq)
    ]
    merged = merge_chunks(chunks, MergeConfig(rtl=rtl))
    order = sorted(
        range(len(uniq)),
        key=lambda i: (i // cols, -(i % cols) if rtl else (i % cols)),
    )
    assert merged == "\n\n".join(uniq[i] for i in order)


@_SET
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
def test_inferlog_roundtrip_plain_text(text):
    if "=" * 15 in text or "save results" in text.lower():
        return
    m = "=" * 21
    raw = f"{m}\n{m}\n{text}\nsave results"
    body = [
        l for l in text.split("\n")
        if not (l.strip().startswith("BASE:") or l.strip().startswith("PATCHES:"))
    ]
    assert parse_infer_output(raw) == "\n".join(body).strip()


@_SET
@given(st.integers(0, 2**32 - 1))
def test_corpus_media_always_processable(seed):
    """Any fixture page class processes without exception and with a
    fully decodable result (confidence 1.0) under the default profile."""
    from ocr_spark.config import get_profile
    from ocr_spark.core import process_image
    from ocr_spark.fixtures import PAGE_CLASSES

    rng = np.random.default_rng(seed)
    name, fn = PAGE_CLASSES[seed % len(PAGE_CLASSES)]
    res = process_image(fn(rng), get_profile("default"))
    assert not res.skipped
    assert res.text, name
