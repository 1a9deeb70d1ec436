"""Plan-shape regression tests: the physical plans the 100 TB design
point depends on must not silently regress (scan pruning, pushdown)."""

from __future__ import annotations

import contextlib
import io
import os


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_media_branch_scan_prunes_text(spark, corpus_dir):
    from ocr_spark.spark.corpus import read_corpus
    from ocr_spark.spark.pipeline import _media_span_rows

    docs, _media = read_corpus(spark, corpus_dir)
    path = os.path.join(corpus_dir, "documents.parquet")
    plan = _plan(_media_span_rows(spark, docs, path, None))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, plan
    for line in read_schemas:
        assert "text" not in line, line


def test_media_table_scan_prunes_dims(spark, corpus_dir):
    """The media join must read only (media_ref, png) — width/height
    stay out of the scan."""
    from pyspark.sql import functions as F

    from ocr_spark.spark.corpus import read_corpus
    from ocr_spark.spark.pipeline import _media_input, _media_span_rows

    docs, media = read_corpus(spark, corpus_dir)
    mi = _media_input(
        _media_span_rows(spark, docs, None, None), media, None, 8
    )
    plan = _plan(mi)
    media_scan = [
        l
        for l in plan.splitlines()
        if "ReadSchema" in l and "png" in l
    ]
    assert media_scan, plan
    for line in media_scan:
        assert "width" not in line and "height" not in line, line


def test_text_branch_stays_jvm_side(spark, corpus_dir):
    """No Python/Arrow operator may appear in the text-branch plan."""
    from ocr_spark.spark.corpus import read_corpus
    from ocr_spark.spark.pipeline import _non_media_branch, _span_rows

    docs, _media = read_corpus(spark, corpus_dir)
    plan = _plan(_non_media_branch(_span_rows(docs)))
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan, plan
