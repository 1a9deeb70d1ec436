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
    # regex, not trim(): Python's str.strip() (inferlog.py and the
    # reference parser) strips ALL whitespace; F.trim strips spaces only,
    # which would keep tab-indented debug lines the state machine drops
    return line.rlike("^\\s*(BASE:|PATCHES:)")


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
                              AND NOT regexp_matches(lines[i], '^\\s*(BASE:|PATCHES:)')),
             i -> lines[i]),
           chr(10)), ''), '^\\s+|\\s+$', '', 'g') AS parsed
  FROM p
)
SELECT doc_id, length(parsed) AS parsed_len, md5(parsed) AS parsed_md5 FROM k
"""


# --------------------------------------------------------------------------
# pdf metadata probe + multimodal image stats — golden-table oracles:
# the expected results are precomputed by the single-process reference
# implementation (functions/golden.py) over the SAME deterministic
# fixture media table, so these image-path queries are fully hash-gated
# despite their binary inputs being opaque to SQL.
# --------------------------------------------------------------------------


def _golden_media(spark: SparkSession):
    from ocr_spark.functions.golden import GOLDEN_DOCS, GOLDEN_SKEW, ensure_golden
    from ocr_spark.spark.corpus import fixture_corpus_dir

    ensure_golden()  # the oracle SQL reads this parquet right after us
    corpus = fixture_corpus_dir(GOLDEN_DOCS, GOLDEN_SKEW)
    return spark.read.parquet(f"{corpus}/media.parquet")


def q_pdf_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: page_count/title/author for every SPDF payload in the fixture
    media table (/root/reference/app/services/pdf_service.py:182-214)."""
    from ocr_spark.functions.golden import pdf_meta_frame

    media = _golden_media(spark)

    def fn(batches):
        for b in batches:
            yield pdf_meta_frame(b)

    return media.mapInPandas(
        fn, "media_ref string, page_count int, title string, author string"
    )


def q_media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column path: decode PNG payloads in Arrow
    batches and emit typed per-image stats (SURVEY.md §2 extension for
    training-data pipelines)."""
    from ocr_spark.multimodal import IMAGE_STATS_SCHEMA, image_stats_udf

    media = _golden_media(spark)
    return media.mapInPandas(image_stats_udf, IMAGE_STATS_SCHEMA)


def q_media_quality_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A8 as a queryable table: one analyzer pass per image, metrics
    exported for corpus-level aggregation (SURVEY.md §2.4)."""
    from ocr_spark.functions.golden import quality_frame

    media = _golden_media(spark)

    def fn(batches):
        for b in batches:
            yield quality_frame(b)

    schema = (
        "media_ref string, width int, height int, is_grayscale boolean, "
        "blur_score double, noise_level double, skew_angle double, "
        "contrast_ratio double, brightness double, estimated_dpi int, "
        "has_text boolean, is_inverted boolean"
    )
    return media.mapInPandas(fn, schema)


def q_media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over the deterministic AVI fixture table:
    the real decoder per row (the pure-numpy uncompressed-AVI walker in
    this container; PyAV when installed), every-Nth-frame stride, frames
    reduced to md5 digests. The planted truncated AVI must vanish
    (dropped row) and the planted non-RIFF payload must appear as the
    single-frame stand-in — both shapes are part of the golden gate."""
    import os

    from ocr_spark.fixtures import video_table_dir
    from ocr_spark.functions.golden import ensure_golden, video_frames_frame

    ensure_golden()
    vids = spark.read.parquet(
        os.path.join(video_table_dir(), "videos.parquet")
    )

    def fn(batches):
        for b in batches:
            yield video_frames_frame(b)

    return vids.mapInPandas(
        fn, "media_ref string, frame_idx int, frame_md5 string"
    )


def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features over the deterministic WAV fixture table: real
    per-row decode (stdlib PCM16 WAV here, soundfile when installed) —
    mono-averaged stereo, a zero-frame WAV pinning rms 0.0, and a
    non-audio payload pinning the typed decode_ok=false row."""
    import os

    from ocr_spark.fixtures import audio_table_dir
    from ocr_spark.functions.golden import audio_features_frame, ensure_golden
    from ocr_spark.multimodal import AUDIO_FEATURES_SCHEMA

    ensure_golden()
    auds = spark.read.parquet(os.path.join(audio_table_dir(), "audio.parquet"))

    def fn(batches):
        for b in batches:
            yield audio_features_frame(b)

    return auds.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def _golden_sql(name: str) -> str:
    from ocr_spark.functions import golden

    return {
        "pdf_metadata": golden.SQL_PDF_METADATA,
        "image_stats": golden.SQL_IMAGE_STATS,
        "quality": golden.SQL_QUALITY,
        "video_frames": golden.SQL_VIDEO_FRAMES,
        "audio_features": golden.SQL_AUDIO_FEATURES,
    }[name]


QUERIES = {
    "infer_output_parse": QuerySpec(q_infer_parse, SQL_INFER_PARSE),
    "extract_pdf_metadata": QuerySpec(q_pdf_metadata, _golden_sql("pdf_metadata")),
    "media_image_stats": QuerySpec(q_media_image_stats, _golden_sql("image_stats")),
    "media_quality_analysis": QuerySpec(
        q_media_quality_analysis, _golden_sql("quality")
    ),
    "media_video_frames": QuerySpec(
        q_media_video_frames, _golden_sql("video_frames")
    ),
    "media_audio_features": QuerySpec(
        q_media_audio_features, _golden_sql("audio_features")
    ),
}
