"""Reading-order merge + overlap dedup for split-page chunk texts.

Reproduces the reference ResultMerger semantics exactly
(/root/reference/app/ocr/splitting/merger.py):

* M1 reading order: (row, col) LTR / (row, -col) RTL ........ merger.py:119-147
* M2 exact overlap: longest suffix(prev[-500:]) == prefix(cur[:500])
  of length >= min_overlap_chars, stripped from cur ......... merger.py:286-306
* M3 fuzzy overlap: <=10-word windows, SequenceMatcher >= 0.95
  AND >= 80% exact word matches ............................. merger.py:308-355
* M4 Arabic normalization: strip 22 tashkeel marks for comparison,
  map the normalized overlap back to original indices ....... merger.py:16-39,199-272
* M5 adjacency gate (|drow|+|dcol| == 1 in one axis) + "\n\n" join
  ........................................................... merger.py:149-197
* M6 debug merge with chunk markers ......................... merger.py:357-385

This runs per (doc_id, offset) group inside an applyInPandas UDF in the
Spark pipeline — the group is tiny (one page's chunks), so plain Python
string work is amortized per Arrow batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from difflib import SequenceMatcher

from ocr_spark.config import MergeConfig

# the 22 tashkeel marks listed at merger.py:16-39 (U+064B..U+065F, U+0670)
ARABIC_DIACRITICS = frozenset(
    [chr(cp) for cp in range(0x064B, 0x0660)] + [chr(0x0670)]
)
_DIACRITIC_TRANSLATE = {ord(c): None for c in ARABIC_DIACRITICS}


@dataclass(frozen=True)
class ChunkText:
    row: int
    col: int
    text: str
    confidence: float = 0.0


def normalize_arabic(text: str) -> str:
    """Strip tashkeel diacritics for overlap comparison (M4)."""
    return text.translate(_DIACRITIC_TRANSLATE)


def reading_order_key(rtl: bool):
    """Sort key for chunk reading order (M1)."""
    if rtl:
        return lambda c: (c.row, -c.col)
    return lambda c: (c.row, c.col)


def _exact_overlap_len(prev_tail: str, cur_head: str, min_chars: int) -> int:
    """Longest L >= min_chars with prev_tail[-L:] == cur_head[:L] (M2)."""
    max_l = min(len(prev_tail), len(cur_head))
    for length in range(max_l, min_chars - 1, -1):
        if prev_tail[-length:] == cur_head[:length]:
            return length
    return 0


def _fuzzy_overlap_len(prev_tail: str, cur_head: str) -> int:
    """Word-window fuzzy overlap: similarity >= 0.95 and >= 80% exact word
    matches; returns char length of the overlapping head of cur (M3)."""
    words_prev = prev_tail.split()
    words_cur = cur_head.split()
    if len(words_prev) < 3 or len(words_cur) < 3:
        return 0
    for window in range(min(len(words_prev), len(words_cur), 10), 2, -1):
        suffix = words_prev[-window:]
        prefix = words_cur[:window]
        sim = SequenceMatcher(None, " ".join(suffix), " ".join(prefix)).ratio()
        if sim >= 0.95:
            exact = sum(1 for a, b in zip(suffix, prefix) if a == b)
            if exact / window >= 0.8:
                return len(" ".join(words_cur[:window]))
    return 0


def _map_normalized_pos(original: str, normalized_len: int) -> int:
    """Index in `original` after `normalized_len` non-diacritic chars
    (merger.py:248-272)."""
    count = 0
    for i, ch in enumerate(original):
        if ch not in ARABIC_DIACRITICS:
            count += 1
        if count >= normalized_len:
            return i + 1
    return len(original)


def remove_overlap(prev_text: str, cur_text: str, cfg: MergeConfig) -> str:
    """Strip the duplicated head of cur_text (M2/M3, RTL-aware M4).

    Window caps (500 chars) and thresholds match merger.py:215-284.
    """
    if not prev_text or not cur_text:
        return cur_text
    prev_tail = prev_text[-500:]
    cur_head = cur_text[:500]

    if cfg.rtl:
        prev_norm = normalize_arabic(prev_tail)
        cur_norm = normalize_arabic(cur_head)
        exact = _exact_overlap_len(prev_norm, cur_norm, cfg.min_overlap_chars)
        if exact >= cfg.min_overlap_chars:
            pos = _map_normalized_pos(cur_head, exact)
            return cur_text[pos:].strip()
        fuzzy = _fuzzy_overlap_len(prev_norm, cur_norm)
        if fuzzy > 0:
            pos = _map_normalized_pos(cur_head, fuzzy)
            return cur_text[pos:].strip()
        return cur_text

    exact = _exact_overlap_len(prev_tail, cur_head, cfg.min_overlap_chars)
    if exact >= cfg.min_overlap_chars:
        return cur_text[exact:].strip()
    fuzzy = _fuzzy_overlap_len(prev_tail, cur_head)
    if fuzzy > 0:
        return cur_text[fuzzy:].strip()
    return cur_text


def _adjacent(a: ChunkText, b: ChunkText) -> bool:
    """Grid adjacency gate (merger.py:190-197)."""
    dr, dc = abs(a.row - b.row), abs(a.col - b.col)
    return (dr == 0 and dc == 1) or (dr == 1 and dc == 0)


def merge_chunks(chunks: list[ChunkText], cfg: MergeConfig) -> str:
    """Merge chunk texts in reading order with overlap dedup (merger.py:90-188)."""
    if not chunks:
        return ""
    if len(chunks) == 1:
        return chunks[0].text.strip()
    ordered = sorted(chunks, key=reading_order_key(cfg.rtl))

    parts: list[str] = []
    prev_text = ""
    for i, cur in enumerate(ordered):
        text = cur.text.strip()
        if not text:
            continue
        if not prev_text:
            parts.append(text)
            prev_text = text
            continue
        if _adjacent(cur, ordered[i - 1]):
            deduped = remove_overlap(prev_text, text, cfg)
            if deduped:
                parts.append(deduped)
                prev_text = text
        else:
            parts.append(text)
            prev_text = text
    return cfg.section_separator.join(parts).strip()


def merge_formatted(chunks: list[ChunkText], cfg: MergeConfig) -> str:
    """Debug merge with [Chunk i: Row r, Col c] markers (merger.py:357-385)."""
    ordered = sorted(chunks, key=reading_order_key(cfg.rtl))
    parts = []
    for i, c in enumerate(ordered):
        text = c.text.strip()
        if text:
            parts.append(f"[Chunk {i}: Row {c.row}, Col {c.col}]\n{text}")
    return "\n\n".join(parts)
