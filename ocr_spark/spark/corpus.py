"""Fixture corpus <-> parquet plumbing.

The corpus is written with pyarrow (driver-side, small scales only — at
real scale the documents/media tables already exist as Iceberg/parquet);
Spark and the single-process oracle then read the *same bytes*, so
span-sequence equality tests see identical inputs.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_spark.fixtures import build_corpus

SPAN_ARROW = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_ARROW = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_ARROW))]
)
MEDIA_ARROW = pa.schema(
    [
        ("media_ref", pa.string()),
        ("png", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def write_corpus_parquet(
    out_dir: str,
    n_docs: int = 100,
    seed: int = 42,
    skew_monster_spans: int = 120,
    row_group_docs: int = 512,
) -> tuple[str, str]:
    """Generate the deterministic corpus and write documents/media parquet.

    Returns (docs_path, media_path)."""
    docs, media = build_corpus(
        n_docs=n_docs, seed=seed, skew_monster_spans=skew_monster_spans
    )
    os.makedirs(out_dir, exist_ok=True)
    docs_path = os.path.join(out_dir, "documents.parquet")
    media_path = os.path.join(out_dir, "media.parquet")

    docs_tbl = pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs],
        schema=DOCS_ARROW,
    )
    media_tbl = pa.Table.from_pylist(media, schema=MEDIA_ARROW)
    pq.write_table(docs_tbl, docs_path, row_group_size=row_group_docs)
    # media rows carry PNGs; small row groups keep Spark input splits balanced
    pq.write_table(media_tbl, media_path, row_group_size=256)
    return docs_path, media_path


def read_corpus(spark, corpus_dir: str):
    """(documents, media) DataFrames from a corpus dir."""
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(corpus_dir, "media.parquet"))
    return docs, media
