"""Driver contract for the spark-graft builder (PySpark target).

* ``entry(spark)`` — flagship: the full interleaved-document extraction
  pipeline (text boilerplate branch + media/pdf image branch) over a
  corpus derived from /root/testdata/sf0.001 plus the deterministic
  fixture media tables.
* ``queries()`` — every SQL-checkable operator (text analysis, dedup
  family, similarity search, relational/stream ops) plus rows-only
  entries for the image pipeline itself.
* ``oracle_sql()`` — DuckDB equivalents generated from the same
  constants as the Spark plans (ocr_spark.functions.*).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# corpus sizes for the image-pipeline queries, keyed by sf-dir basename
_CORPUS_DOCS = {"sf0.001": 30, "sf0.01": 60, "sf0.1": 120}
_DEFAULT_DOCS = 30
_SKEW_SPANS = 24


def _fixture_corpus_dir(n_docs: int) -> str:
    """Deterministic fixture corpus parquet, cached per size."""
    from ocr_spark.spark.corpus import write_corpus_parquet

    d = os.path.join(
        tempfile.gettempdir(), f"ocr_spark_corpus_n{n_docs}_s{_SKEW_SPANS}"
    )
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        write_corpus_parquet(d, n_docs=n_docs, skew_monster_spans=_SKEW_SPANS)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _corpus_docs_for(sf_dir: str) -> int:
    return _CORPUS_DOCS.get(os.path.basename(sf_dir.rstrip("/")), _DEFAULT_DOCS)


def _extract_query(mode: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ocr_spark.spark.corpus import read_corpus
        from ocr_spark.spark.pipeline import run_pipeline

        corpus = _fixture_corpus_dir(_corpus_docs_for(sf_dir))
        docs, media = read_corpus(spark, corpus)
        out = run_pipeline(
            spark, docs, media, mode=mode, run_id=f"q-{mode}",
            docs_path=os.path.join(corpus, "documents.parquet"),
        )
        # flatten to scalar columns (driver-hashable shape)
        return out.select(
            "doc_id", F.explode_outer("spans").alias("span")
        ).select(
            "doc_id",
            F.col("span.offset").alias("offset"),
            F.col("span.kind").alias("kind"),
            F.col("span.media_ref").alias("media_ref"),
            F.length("span.text").alias("n_chars"),
            F.md5(F.coalesce(F.col("span.text"), F.lit("")).cast("binary")).alias(
                "text_md5"
            ),
        )

    return fn


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleave sf0.001 document texts with fixture media and
    run the full extraction pipeline; returns the extracted spans."""
    from ocr_spark.spark.corpus import read_corpus
    from ocr_spark.spark.pipeline import run_pipeline
    from ocr_spark.spark.schemas import MEDIA_SCHEMA

    sf_dir = "/root/testdata/sf0.001"
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # each flat doc -> one text span (offset 0), running the text branch
    text_docs = flat.select(
        F.concat(F.lit("tdoc_"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
    corpus = _fixture_corpus_dir(_DEFAULT_DOCS)
    fix_docs, media = read_corpus(spark, corpus)
    docs = text_docs.unionByName(fix_docs)
    out = run_pipeline(spark, docs, media, mode="fused", run_id="entry")
    return out.select(
        "doc_id",
        F.col("metrics.n_spans").alias("n_spans"),
        F.col("metrics.n_media").alias("n_media"),
        F.col("metrics.n_text").alias("n_text"),
        F.col("metrics.skipped").alias("skipped"),
        F.round("metrics.ocr_confidence", 6).alias("ocr_confidence"),
        F.md5(
            F.to_json(F.struct(F.col("spans")))
        ).alias("spans_md5"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_spark.functions import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: spec.fn for name, spec in all_queries().items()
    }
    out["extract_pipeline_fused"] = _extract_query("fused")
    out["extract_pipeline_staged"] = _extract_query("staged")
    out["extract_pipeline_hybrid"] = _extract_query("hybrid")
    return out


def oracle_sql() -> dict[str, str]:
    from ocr_spark.functions import all_queries

    return {
        name: spec.sql for name, spec in all_queries().items() if spec.sql
    }
