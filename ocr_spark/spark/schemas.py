"""Declared schemas for the engine's tables (SURVEY.md §1.3).

Fixed and explicit — the reference encodes order in Python list positions
(/root/reference/app/ocr/splitting/base.py:72, app/worker/tasks.py:182);
here order is *data* (the `offset` field), never physical row order.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), nullable=False),
        T.StructField("png", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

# span-level rows produced by the extraction stages, before reassembly
SPAN_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("steps_applied", T.ArrayType(T.StringType())),
        T.StructField("split_method", T.StringType()),
        T.StructField("skipped", T.BooleanType()),
        T.StructField("elapsed_ms", T.LongType()),
    ]
)

METRICS_STRUCT = T.StructType(
    [
        T.StructField("n_spans", T.IntegerType()),
        T.StructField("n_media", T.IntegerType()),
        T.StructField("n_text", T.IntegerType()),
        T.StructField("skipped", T.IntegerType()),
        T.StructField("steps_applied", T.ArrayType(T.StringType())),
        T.StructField("split_methods", T.ArrayType(T.StringType())),
        T.StructField("ocr_confidence", T.DoubleType()),
        T.StructField("elapsed_ms", T.LongType()),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
        T.StructField("metrics", METRICS_STRUCT),
        T.StructField(
            "lineage",
            T.StructType(
                [
                    T.StructField("run_id", T.StringType()),
                    T.StructField("partition_id", T.IntegerType()),
                    T.StructField("attempt", T.IntegerType()),
                    T.StructField("ts", T.TimestampType()),
                ]
            ),
        ),
    ]
)

# staged mode: one page per row after pdf fan-out
PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("png", T.BinaryType()),
        T.StructField("skipped", T.BooleanType()),
    ]
)

# staged mode: one chunk per row after split fan-out. Chunk pixels ride
# as raw uint8 bytes + shape, not PNG: zlib per chunk costs more than
# shuffling raw bytes under lz4 block compression (mostly-white pages
# compress fine either way).
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("chunk_raw", T.BinaryType()),
        T.StructField("chunk_h", T.IntegerType()),
        T.StructField("chunk_w", T.IntegerType()),
        T.StructField("chunk_ch", T.IntegerType()),
        T.StructField("split_method", T.StringType()),
        T.StructField("global_steps", T.ArrayType(T.StringType())),
        T.StructField("skipped", T.BooleanType()),
    ]
)

CHUNK_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("steps_applied", T.ArrayType(T.StringType())),
        T.StructField("split_method", T.StringType()),
        T.StructField("skipped", T.BooleanType()),
    ]
)

# merged per (doc, offset, page)
PAGE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("steps_applied", T.ArrayType(T.StringType())),
        T.StructField("split_method", T.StringType()),
        T.StructField("skipped", T.BooleanType()),
    ]
)
