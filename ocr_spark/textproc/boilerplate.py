"""Text-density / link-density boilerplate classifier (readability /
Boilerpipe-style block heuristics).

The reference has no text branch — this operator is mandated by the
north_rule ("text spans flow through a text-density/link-density
boilerplate classifier"), so its spec is frozen HERE and mirrored by the
fixture generator + oracle (SURVEY.md §7.4 hard part #6):

A text span is a sequence of blocks separated by blank lines ("\n\n").
A block is boilerplate iff ANY of:
  B1  link_density  >= 0.25      (fraction of words containing an URL-ish
                                  substring: 'http://', 'https://', 'www.')
  B2  copyright line             (block starts with '©', 'Copyright', or
                                  '(c)' case-insensitively)
  B3  short low-stopword block   (<= 6 words AND stopword ratio <= 0.2 AND
                                  not sentence-like, i.e. no terminal '.')
The extracted span text = non-boilerplate blocks joined by "\n\n".
"""

from __future__ import annotations

import re

# frozen 50-word English stopword list — part of the classifier spec
STOPWORDS = frozenset(
    """a an and are as at be but by for from had has have he her his i if in
    is it its my no not of on or our she so that the their them they this to
    was we were what when which who will with you your""".split()
)

_LINK_RE = re.compile(r"https?://|(?:^|\W)www\.", re.IGNORECASE)
_COPYRIGHT_RE = re.compile(r"^\s*(?:©|\(c\)|copyright\b)", re.IGNORECASE)
_WORD_RE = re.compile(r"\S+")


def block_features(block: str) -> dict:
    """Per-block density features (the classifier's feature vector)."""
    words = _WORD_RE.findall(block)
    n_words = len(words)
    link_words = sum(1 for w in words if _LINK_RE.search(w))
    stop_words = sum(1 for w in words if w.lower().strip(".,;:!?\"'()") in STOPWORDS)
    n_chars = len(block)
    alpha_chars = sum(ch.isalpha() for ch in block)
    return {
        "n_words": n_words,
        "link_density": link_words / n_words if n_words else 0.0,
        "stopword_ratio": stop_words / n_words if n_words else 0.0,
        "text_density": alpha_chars / n_chars if n_chars else 0.0,
        "ends_sentence": block.rstrip().endswith((".", "!", "?")),
        "is_copyright": bool(_COPYRIGHT_RE.search(block)),
    }


def is_boilerplate(block: str) -> bool:
    f = block_features(block)
    if f["n_words"] == 0:
        return True
    if f["link_density"] >= 0.25:  # B1
        return True
    if f["is_copyright"]:  # B2
        return True
    if f["n_words"] <= 6 and f["stopword_ratio"] <= 0.2 and not f["ends_sentence"]:
        return True  # B3
    return False


def extract_main_content(text: str) -> str:
    """Strip boilerplate blocks; keep main-content blocks in order."""
    if not text:
        return ""
    blocks = [b for b in text.split("\n\n")]
    kept = [b for b in blocks if b.strip() and not is_boilerplate(b)]
    return "\n\n".join(kept)
