"""spark-submit entrypoint: the packaged job must run end-to-end from
both input styles — parquet paths and catalog tables (the Iceberg-shaped
production layout, exercised via session temp views); both get the
pruned no-spans.text media-branch scan."""

from __future__ import annotations

import json
import os


def test_job_main_parquet_paths(spark, corpus_dir, tmp_path):
    import job

    out_dir = str(tmp_path / "out")
    rc = job.main(
        [
            "--input", os.path.join(corpus_dir, "documents.parquet"),
            "--media", os.path.join(corpus_dir, "media.parquet"),
            "--out", out_dir, "--run-id", "j1",
            "--buckets", "4", "--span-partitions", "8",
        ]
    )
    assert rc == 0
    manifest = sorted(os.listdir(os.path.join(out_dir, "_manifest")))
    assert [m for m in manifest if m.endswith(".json")] == [
        f"bucket-{b:05d}.json" for b in range(4)
    ]
    with open(os.path.join(out_dir, "_manifest", "bucket-00000.json")) as f:
        row = json.load(f)
    assert row["filter"] == "bucket-column"  # partition-pruned path taken


def test_job_main_catalog_tables(spark, corpus_dir, tmp_path):
    import job

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    media = spark.read.parquet(os.path.join(corpus_dir, "media.parquet"))
    docs.createOrReplaceTempView("docs_tbl")
    media.createOrReplaceTempView("media_tbl")
    out_dir = str(tmp_path / "out")
    rc = job.main(
        [
            "--input", "table:docs_tbl",
            "--media", "table:media_tbl",
            "--out", out_dir, "--run-id", "j2",
            "--buckets", "2", "--span-partitions", "8",
        ]
    )
    assert rc == 0
    n = spark.read.parquet(
        os.path.join(out_dir, "bucket=0"), os.path.join(out_dir, "bucket=1")
    ).count()
    assert n == docs.count()
