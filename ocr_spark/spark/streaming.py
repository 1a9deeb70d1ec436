"""Structured Streaming surface: continuous extraction over an arriving
document stream.

The engine's semantics are batch-shaped (per-doc span reassembly with an
offset order key), so the streaming integration is the idiomatic
`readStream -> foreachBatch(run_pipeline) -> append`: every micro-batch
runs the exact same plan as the batch job (same UDF stages, same
reassembly, same metrics/lineage), and Spark's streaming checkpoint
gives exactly-once file-source progress on top of our own per-bucket
manifest for the batch path. Late/duplicate doc_ids across micro-batches
are the caller's contract (doc_id is the natural dedup key downstream).

This intentionally does NOT re-implement the pipeline with watermarked
stateful operators: span order lives in the data (offset), and one
document's spans arrive together in a file source, so per-batch
processing preserves the span-sequence-equality invariant exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ocr_spark.spark import schemas as S
from ocr_spark.spark.pipeline import run_pipeline


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    media_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    run_id: str = "stream",
    profile: str = "default",
    mode: str = "fused",
    max_files_per_trigger: int | None = None,
    available_now: bool = False,
    **pipeline_kw,
) -> StreamingQuery:
    """documents parquet files arriving in input_dir -> extracted parquet.

    available_now=True drains the currently-visible files and stops
    (the batch-catch-up trigger); otherwise the query runs continuously.
    """
    reader = spark.readStream.schema(S.DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = run_pipeline(
            spark,
            batch_df,
            media_df,
            profile=profile,
            mode=mode,
            run_id=f"{run_id}-b{batch_id}",
            **pipeline_kw,
        )
        out.write.mode("append").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
