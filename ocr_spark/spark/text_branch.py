"""Text-span branch: boilerplate strip as pure Catalyst expressions.

Re-expresses ocr_spark.textproc.boilerplate (the frozen classifier spec,
SURVEY.md §7.4) with Spark SQL higher-order functions — split / filter /
rlike / array_join — so the text branch runs entirely JVM-side inside
whole-stage codegen: zero Python, zero Arrow transfer. At 100 TB the text
branch is the majority of spans (FIXTURES.md row mix), so keeping it off
the Python worker path matters more than anything else in this file.

tests/test_spark_text_branch.py asserts exact string equality against the
Python classifier over the fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark.textproc.boilerplate import STOPWORDS

_PUNCT_CLASS = "[.,;:!?\"'()]"
# Character-class parity with the Python classifier: Java regexes are
# ASCII-classed by default (\s misses U+00A0, \W misses non-ASCII word
# chars), while Python's str regexes are Unicode-aware — without (?U) a
# block containing a non-breaking space tokenizes differently and the
# two classifiers DISAGREE (span-sequence equality break). (?U) turns on
# UNICODE_CHARACTER_CLASS; _WS additionally covers \x1c-\x1f (the ASCII
# separator controls), which Python's \s / str.strip() treat as
# whitespace but Unicode White_Space does not.
_WS = "(?:\\s|[\\x1c-\\x1f])"
_LINK_PATTERN = "(?U)https?://|(^|\\W)www\\."
_COPYRIGHT_PATTERN = f"(?iU)^{_WS}*(©|\\(c\\)|copyright\\b)"
_ENDS_SENTENCE_PATTERN = f"(?U)[.!?]{_WS}*$"
_BLANK_PATTERN = f"(?U)^{_WS}*$"

def _stopwords_arr() -> Column:
    """Frozen 50-word stopword list as a literal array — part of the plan
    itself (constant-folded by Catalyst), no closure, no Python."""
    return F.array(*[F.lit(w) for w in sorted(STOPWORDS)])


def words_col(block: Column) -> Column:
    """Non-empty whitespace-separated tokens (re.findall(r'\\S+', b))."""
    return F.filter(F.split(block, f"(?U){_WS}+"), lambda w: w != F.lit(""))


def _norm_word(w: Column) -> Column:
    """w.lower().strip('.,;:!?\"\\'()') — the stopword lookup key."""
    return F.regexp_replace(
        F.lower(w), f"^{_PUNCT_CLASS}+|{_PUNCT_CLASS}+$", ""
    )


def block_features_cols(block: Column) -> dict[str, Column]:
    """Per-block density features (mirrors boilerplate.block_features)."""
    words = words_col(block)
    n_words = F.size(words)
    link_words = F.size(
        F.filter(words, lambda w: F.lower(w).rlike(_LINK_PATTERN))
    )
    sw = _stopwords_arr()
    stop_words = F.size(
        F.filter(words, lambda w: F.array_contains(sw, _norm_word(w)))
    )
    nw = n_words.cast("double")
    return {
        "n_words": n_words,
        "link_density": F.when(n_words > 0, link_words / nw).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_words > 0, stop_words / nw).otherwise(F.lit(0.0)),
        "ends_sentence": block.rlike(_ENDS_SENTENCE_PATTERN),
        "is_copyright": block.rlike(_COPYRIGHT_PATTERN),
    }


def is_boilerplate_col(block: Column) -> Column:
    """Catalyst twin of boilerplate.is_boilerplate (rules B1-B3)."""
    f = block_features_cols(block)
    return (
        (f["n_words"] == 0)
        | (f["link_density"] >= 0.25)  # B1
        | f["is_copyright"]  # B2
        | ((f["n_words"] <= 6) & (f["stopword_ratio"] <= 0.2) & ~f["ends_sentence"])  # B3
    )


def main_content_col(text: Column) -> Column:
    """extract_main_content as one Catalyst expression.

    blocks = text.split('\\n\\n'); keep non-blank, non-boilerplate blocks
    in order; join with '\\n\\n'.
    """
    blocks = F.split(F.coalesce(text, F.lit("")), "\n\n")
    kept = F.filter(
        blocks,
        lambda b: (~b.rlike(_BLANK_PATTERN)) & (~is_boilerplate_col(b)),
    )
    return F.array_join(kept, "\n\n")
