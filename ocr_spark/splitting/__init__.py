"""Content-aware page splitting: projection -> components -> grid cascade."""

from ocr_spark.splitting.split import (  # noqa: F401
    Chunk,
    SplitOutcome,
    analyze_layout,
    smart_split,
    split_projection,
    split_components,
    split_grid,
)
