"""Extraction-adjacent operators exposed as driver queries:

* ``infer_output_parse`` — the E4 stdout parser (deepseek.py:213-262) as
  a pure Catalyst array expression with a DuckDB oracle. The query
  synthesizes a model-stdout wrapper around each document's text in both
  engines identically, then parses it back out.
* ``extract_pdf_metadata`` — the S3 metadata probe over the fixture
  media table (rows-only; payloads aren't visible to DuckDB).
* ``media_image_stats`` — multimodal binary-column plumbing: decode +
  per-image stats via an Arrow-batched UDF (rows-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions import QuerySpec, load

MARKER = "=" * 21
BREAKER = "=" * 15


def _is_marker(line: Column) -> Column:
    return line.contains(MARKER) & ~F.lower(line).contains("save")


def _is_breaker(line: Column) -> Column:
    return F.lower(line).contains("save results") | line.contains(BREAKER)


def _is_debug(line: Column) -> Column:
    t = F.trim(line)
    return t.startswith("BASE:") | t.startswith("PATCHES:")


def parse_infer_output_col(raw: Column) -> Column:
    """Catalyst twin of ocr_spark.extract.inferlog.parse_infer_output."""
    lines = F.split(raw, "\n")
    n = F.size(lines)
    idx = F.sequence(F.lit(1), n)
    markers = F.filter(idx, lambda i: _is_marker(F.element_at(lines, i)))
    start = F.coalesce(F.try_element_at(markers, F.lit(2)), n + 1)
    # the reference breaks on the FIRST break line anywhere (the break
    # test precedes the in-text check), marker lines excepted
    breaks = F.filter(
        idx,
        lambda i: ~_is_marker(F.element_at(lines, i))
        & _is_breaker(F.element_at(lines, i)),
    )
    stop = F.coalesce(F.try_element_at(breaks, F.lit(1)), n + 1)
    kept = F.filter(
        idx,
        lambda i: (i > start)
        & (i < stop)
        & ~_is_marker(F.element_at(lines, i))
        & ~_is_debug(F.element_at(lines, i)),
    )
    joined = F.array_join(F.transform(kept, lambda i: F.element_at(lines, i)), "\n")
    return F.regexp_replace(joined, "^\\s+|\\s+$", "")


def q_infer_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    nl = F.lit("\n")
    raw = F.concat(
        F.lit(MARKER), nl,
        F.lit("BASE:  torch.Size([1, 3])"), nl,
        F.lit("PATCHES:  torch.Size([4])"), nl,
        F.lit(MARKER), nl,
        F.col("text"), nl,
        F.lit("===============save results:==============="), nl,
        F.lit("debug tail"),
    )
    parsed = parse_infer_output_col(raw)
    return docs.select(
        "doc_id",
        F.length(parsed).alias("parsed_len"),
        F.md5(parsed.cast("binary")).alias("parsed_md5"),
    )


SQL_INFER_PARSE = f"""
WITH r AS (
  SELECT doc_id,
         '{MARKER}' || chr(10) ||
         'BASE:  torch.Size([1, 3])' || chr(10) ||
         'PATCHES:  torch.Size([4])' || chr(10) ||
         '{MARKER}' || chr(10) ||
         text || chr(10) ||
         '===============save results:===============' || chr(10) ||
         'debug tail' AS raw
  FROM documents
), s AS (
  SELECT doc_id, string_split(raw, chr(10)) AS lines FROM r
), m AS (
  SELECT doc_id, lines,
         list_filter(range(1, len(lines) + 1),
                     i -> (contains(lines[i], '{MARKER}')
                           AND NOT contains(lower(lines[i]), 'save'))) AS markers,
         list_filter(range(1, len(lines) + 1),
                     i -> NOT (contains(lines[i], '{MARKER}')
                               AND NOT contains(lower(lines[i]), 'save'))
                          AND (contains(lower(lines[i]), 'save results')
                               OR contains(lines[i], '{BREAKER}'))) AS brks
  FROM s
), p AS (
  SELECT doc_id, lines,
         coalesce(markers[2], len(lines) + 1) AS strt,
         coalesce(brks[1], len(lines) + 1) AS stop
  FROM m
), k AS (
  SELECT doc_id,
         regexp_replace(coalesce(array_to_string(
           list_transform(
             list_filter(range(1, len(lines) + 1),
                         i -> i > strt AND i < stop
                              AND NOT (contains(lines[i], '{MARKER}')
                                       AND NOT contains(lower(lines[i]), 'save'))
                              AND NOT (starts_with(trim(lines[i]), 'BASE:')
                                       OR starts_with(trim(lines[i]), 'PATCHES:'))),
             i -> lines[i]),
           chr(10)), ''), '^\\s+|\\s+$', '', 'g') AS parsed
  FROM p
)
SELECT doc_id, length(parsed) AS parsed_len, md5(parsed) AS parsed_md5 FROM k
"""


# --------------------------------------------------------------------------
# pdf metadata probe + multimodal image stats (rows-only)
# --------------------------------------------------------------------------


def q_pdf_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: page_count/title/author for every SPDF payload in the fixture
    media table (/root/reference/app/services/pdf_service.py:182-214)."""
    import pandas as pd

    from __spark_entry__ import _corpus_docs_for, _fixture_corpus_dir

    corpus = _fixture_corpus_dir(_corpus_docs_for(sf_dir))
    media = spark.read.parquet(f"{corpus}/media.parquet")

    def fn(batches):
        from ocr_spark.pdfio import is_pdf, pdf_metadata

        for b in batches:
            rows = []
            for r in b.itertuples():
                data = bytes(r.png) if r.png is not None else b""
                if not is_pdf(data):
                    continue
                try:
                    meta = pdf_metadata(data)
                except Exception:  # noqa: BLE001 — malformed -> skip row
                    continue
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "page_count": int(meta.get("page_count", 0)),
                        "title": str(meta.get("title", "")),
                        "author": str(meta.get("author", "")),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "page_count", "title", "author"]
            )

    return media.mapInPandas(
        fn, "media_ref string, page_count int, title string, author string"
    )


def q_media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column path: decode PNG payloads in Arrow
    batches and emit typed per-image stats (SURVEY.md §2 extension for
    training-data pipelines)."""
    from __spark_entry__ import _corpus_docs_for, _fixture_corpus_dir
    from ocr_spark.multimodal import IMAGE_STATS_SCHEMA, image_stats_udf

    corpus = _fixture_corpus_dir(_corpus_docs_for(sf_dir))
    media = spark.read.parquet(f"{corpus}/media.parquet")
    return media.mapInPandas(image_stats_udf, IMAGE_STATS_SCHEMA)


def q_media_quality_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A8 as a queryable table: one analyzer pass per image, metrics
    exported for corpus-level aggregation (SURVEY.md §2.4)."""
    import pandas as pd

    from __spark_entry__ import _corpus_docs_for, _fixture_corpus_dir

    corpus = _fixture_corpus_dir(_corpus_docs_for(sf_dir))
    media = spark.read.parquet(f"{corpus}/media.parquet")

    def fn(batches):
        from ocr_spark.config import PreprocessConfig
        from ocr_spark.imaging.analyzer import analyze_quality
        from ocr_spark.imaging.png import decode_png

        cfg = PreprocessConfig()
        cols = [
            "media_ref", "width", "height", "is_grayscale", "blur_score",
            "noise_level", "skew_angle", "contrast_ratio", "brightness",
            "estimated_dpi", "has_text", "is_inverted",
        ]
        for b in batches:
            rows = []
            for r in b.itertuples():
                try:
                    img = decode_png(bytes(r.png))
                except Exception:  # noqa: BLE001 — non-image payloads skipped
                    continue
                a = analyze_quality(img, cfg)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "width": a.width,
                        "height": a.height,
                        "is_grayscale": a.is_grayscale,
                        "blur_score": round(a.blur_score, 6),
                        "noise_level": round(a.noise_level, 6),
                        "skew_angle": round(a.skew_angle, 6),
                        "contrast_ratio": round(a.contrast_ratio, 6),
                        "brightness": round(a.brightness, 6),
                        "estimated_dpi": a.estimated_dpi,
                        "has_text": a.has_text,
                        "is_inverted": a.is_inverted,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        "media_ref string, width int, height int, is_grayscale boolean, "
        "blur_score double, noise_level double, skew_angle double, "
        "contrast_ratio double, brightness double, estimated_dpi int, "
        "has_text boolean, is_inverted boolean"
    )
    return media.mapInPandas(fn, schema)


QUERIES = {
    "infer_output_parse": QuerySpec(q_infer_parse, SQL_INFER_PARSE),
    "extract_pdf_metadata": QuerySpec(q_pdf_metadata, None),
    "media_image_stats": QuerySpec(q_media_image_stats, None),
    "media_quality_analysis": QuerySpec(q_media_quality_analysis, None),
}
