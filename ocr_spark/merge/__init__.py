"""Reading-order merge with overlap deduplication (M1-M6)."""

from ocr_spark.merge.merger import (  # noqa: F401
    ChunkText,
    merge_chunks,
    merge_formatted,
    normalize_arabic,
    reading_order_key,
    remove_overlap,
)
