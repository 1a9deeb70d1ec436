"""Merge semantics vs the reference ResultMerger (merger.py)."""

from ocr_spark.config import MergeConfig
from ocr_spark.merge.merger import (
    ChunkText,
    merge_chunks,
    merge_formatted,
    normalize_arabic,
    remove_overlap,
)

LTR = MergeConfig()
RTL = MergeConfig(rtl=True)


def _c(row, col, text):
    return ChunkText(row=row, col=col, text=text)


def test_reading_order_ltr():
    chunks = [_c(1, 0, "c"), _c(0, 1, "b"), _c(0, 0, "a")]
    assert merge_chunks(chunks, LTR) == "a\n\nb\n\nc"


def test_reading_order_rtl():
    # RTL: (row, -col) — right column first (merger.py:134-140)
    chunks = [_c(0, 0, "left"), _c(0, 1, "right")]
    assert merge_chunks(chunks, RTL) == "right\n\nleft"


def test_single_chunk_short_circuit():
    assert merge_chunks([_c(0, 0, "  x  ")], LTR) == "x"
    assert merge_chunks([], LTR) == ""


def test_exact_overlap_at_threshold():
    # exactly min_overlap_chars (10) of shared suffix/prefix is stripped
    prev = "AAAA0123456789"
    cur = "0123456789BBBB"
    assert remove_overlap(prev, cur, LTR) == "BBBB"
    # 9 chars shared -> below threshold -> kept
    prev9 = "AAAA012345678"
    cur9 = "012345678BBBB"
    assert remove_overlap(prev9, cur9, LTR) == cur9


def test_full_duplicate_chunk_dropped():
    text = "line one two three four five six seven"
    merged = merge_chunks([_c(0, 0, text), _c(0, 1, text)], LTR)
    assert merged == text


def test_non_adjacent_no_dedup():
    text = "shared text of more than ten chars"
    chunks = [_c(0, 1, text), _c(1, 0, text)]  # diagonal: not adjacent
    assert merge_chunks(chunks, LTR) == text + "\n\n" + text


def test_fuzzy_overlap():
    # >= 0.95 similarity and >= 80% exact word matches (merger.py:308-355):
    # a 5-word window with one OCR-garbled character qualifies (4/5 exact)
    prev = "words alpha beta gamma delta epsilon"
    cur = "alpha beta gamma delXa epsilon fresh content here"
    out = remove_overlap(prev, cur, LTR)
    assert out.startswith("fresh")
    # one wrong word out of four (75% exact) must NOT dedup
    prev2 = "alpha beta gamma delta"
    cur2 = "alpha beta gamma deltX fresh content here"
    assert remove_overlap(prev2, cur2, LTR) == cur2
    # dissimilar texts untouched
    cur3 = "totally different words follow here now"
    assert remove_overlap(prev, cur3, LTR) == cur3


def test_normalize_arabic():
    word = "كِتَابٌ"
    assert normalize_arabic(word) == "كتاب"


def test_rtl_overlap_diacritic_insensitive():
    # same text, once with diacritics: normalized comparison must match and
    # the strip position must map back to original indices
    base = "كتاب جديد في المكتبة الآن"
    marked = "كِتَاب جَديد في المَكتبة الآن"
    cur = marked + " تكملة النص هنا"
    out = remove_overlap(base, cur, RTL)
    assert out == "تكملة النص هنا"


def test_empty_chunks_skipped():
    chunks = [_c(0, 0, "a" * 12), _c(0, 1, "   "), _c(0, 2, "b" * 12)]
    merged = merge_chunks(chunks, LTR)
    assert merged == "a" * 12 + "\n\n" + "b" * 12


def test_merge_formatted_markers():
    out = merge_formatted([_c(0, 0, "x"), _c(0, 1, "y")], LTR)
    assert "[Chunk 0: Row 0, Col 0]" in out and "x" in out and "y" in out
