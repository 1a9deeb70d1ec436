"""Streaming surface: a file-stream of documents drains through the same
pipeline (foreachBatch) and matches the oracle; a restarted query skips
already-processed files via the streaming checkpoint."""

from __future__ import annotations

import glob
import os
import shutil


def test_stream_extract_matches_oracle(spark, corpus_dir, oracle_extracted, tmp_path):
    from ocr_spark.spark.streaming import stream_extract

    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    # the corpus parquet arrives as one file "drop"
    shutil.copy(
        os.path.join(corpus_dir, "documents.parquet"),
        os.path.join(in_dir, "part-0001.parquet"),
    )
    media = spark.read.parquet(os.path.join(corpus_dir, "media.parquet"))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_extract(
        spark, in_dir, media, out_dir, ckpt,
        available_now=True, span_partitions=8,
    )
    q.awaitTermination(600)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == set(oracle_extracted)
    for doc_id, (ospans, _om) in oracle_extracted.items():
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in rows[doc_id]["spans"]
        ]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ospans]
        assert got == want, doc_id

    # restart with no new files: checkpoint prevents reprocessing
    n_files_before = len(glob.glob(os.path.join(out_dir, "*.parquet")))
    q2 = stream_extract(
        spark, in_dir, media, out_dir, ckpt,
        available_now=True, span_partitions=8,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == len(oracle_extracted)
    assert len(glob.glob(os.path.join(out_dir, "*.parquet"))) == n_files_before
