"""Resumable bucketed execution with a per-partition checkpoint manifest.

The reference's crash-recovery contract is Redis job state + stale-job
cleanup (/root/reference/app/services/job_service.py:47-78,186-228);
restated for batch Spark (SURVEY.md §4.3): the doc space is hashed into
`n_buckets` ranges; each bucket's output commits to its own parquet dir,
then a manifest row commits atomically (tmp + rename). A restarted run
anti-joins the manifest and re-executes only missing buckets, so the
%-redone-work after a mid-run kill is bounded by one bucket.

Within a bucket Spark's own task retry (`spark.task.maxFailures`)
handles transient failures; the manifest handles driver death. Attempt
numbers come from `.inprogress` markers left behind by crashed runs —
the analog of the reference's stale-`processing` sweep.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.spark.pipeline import run_pipeline

MANIFEST_DIR = "_manifest"


def bucket_expr(n_buckets: int):
    """Deterministic doc -> bucket hash (the resume partition key).

    md5-based so it is portable: identical to corpus.bucket_of (Python)
    and computable in any SQL engine — the ingest-time layout column and
    this runtime fallback always agree."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id")), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def bucket_filter(df, n_buckets: int, b: int):
    """Predicate selecting runtime bucket `b`.

    If the input carries the materialized `bucket` layout column
    (corpus.write_corpus_parquet), filter on IT — Catalyst turns a
    deterministic predicate over a hive partition column into a
    PartitionFilter, so the scan reads ~1/n of the files instead of
    re-scanning the whole corpus once per bucket (the r1 scale bug).
    `pmod(bucket, n)` assigns every doc to exactly one runtime bucket for
    ANY layout count and any n.

    CAUTION (ADVICE r2): the two methods only assign the SAME runtime
    bucket to a given doc when n divides the layout bucket count
    (pmod(md5 % L, n) == md5 % n iff n | L) — nothing guarantees that
    (job.py defaults to --buckets 256 vs LAYOUT_BUCKETS=8). Each method
    is individually exhaustive and disjoint, so single-table use is
    always correct; what is NOT safe is filtering docs with one method
    and media with the other in the same bucket run — see
    run_extraction_job, which only prunes media when docs also filter on
    the bucket column."""
    if "bucket" in df.columns:
        return F.pmod(F.col("bucket"), F.lit(n_buckets)) == b
    return bucket_expr(n_buckets) == b


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR)


def completed_buckets(out_dir: str) -> dict[int, dict]:
    """bucket -> manifest row for every committed bucket."""
    mdir = _manifest_path(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, dict] = {}
    for name in os.listdir(mdir):
        if name.startswith("bucket-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                row = json.load(f)
            out[int(row["bucket"])] = row
    return out


def _commit_manifest(out_dir: str, row: dict) -> None:
    """Atomic manifest commit: data is already durable, then tmp+rename.
    A crash between the two leaves the bucket uncommitted -> it reruns
    idempotently (overwrite mode)."""
    mdir = _manifest_path(out_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"bucket-{row['bucket']:05d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)
    marker = os.path.join(mdir, f"bucket-{row['bucket']:05d}.inprogress")
    if os.path.exists(marker):
        os.remove(marker)


def _attempt_number(out_dir: str, bucket: int) -> int:
    """1 + number of prior uncommitted starts of this bucket."""
    marker = os.path.join(_manifest_path(out_dir), f"bucket-{bucket:05d}.inprogress")
    os.makedirs(_manifest_path(out_dir), exist_ok=True)
    attempt = 1
    if os.path.exists(marker):
        with open(marker) as f:
            try:
                attempt = int(f.read().strip() or "0") + 1
            except ValueError:
                attempt = 2
    with open(marker, "w") as f:
        f.write(str(attempt))
    return attempt


def run_extraction_job(
    spark: SparkSession,
    docs_df: DataFrame,
    media_df: DataFrame,
    out_dir: str,
    run_id: str,
    n_buckets: int = 8,
    profile: str = "default",
    mode: str = "fused",
    max_buckets: int | None = None,
    **pipeline_kw,
) -> dict:
    """Process all not-yet-committed buckets; returns a run report.

    `max_buckets` caps how many buckets this invocation processes — the
    test hook for simulating a mid-run kill."""
    done = completed_buckets(out_dir)
    filter_method = "bucket-column" if "bucket" in docs_df.columns else "hash"
    # a committed manifest row only covers THIS invocation's doc subsets
    # if the bucketing matches: rerunning the same out_dir with a
    # different --buckets (or filter method) would silently drop and
    # duplicate docs, so fail fast instead (ADVICE r1)
    for b, row in done.items():
        if int(row.get("n_buckets", -1)) != n_buckets:
            raise ValueError(
                f"resume conflict: bucket {b} committed with "
                f"n_buckets={row.get('n_buckets')}, invoked with {n_buckets}"
            )
        if row.get("filter", filter_method) != filter_method:
            raise ValueError(
                f"resume conflict: bucket {b} committed with filter="
                f"{row.get('filter')}, this input implies {filter_method}"
            )
        if row.get("mode", mode) != mode or row.get("profile", profile) != profile:
            import warnings

            warnings.warn(
                f"bucket {b} committed with mode={row.get('mode')}/"
                f"profile={row.get('profile')}; resuming with {mode}/{profile}",
                stacklevel=2,
            )
    media_has_bucket = "bucket" in media_df.columns
    if media_has_bucket and filter_method != "bucket-column":
        import warnings

        warnings.warn(
            "docs input lacks the `bucket` layout column: media pruning "
            "disabled (every bucket run scans the full media table). "
            "Ingest docs with the layout column to restore pruned resume.",
            stacklevel=2,
        )
    processed = []
    skipped = sorted(done)
    t_start = time.time()
    for b in range(n_buckets):
        if b in done:
            continue
        if max_buckets is not None and len(processed) >= max_buckets:
            break
        attempt = _attempt_number(out_dir, b)
        # media prunes on the owner-doc bucket it was ingested with —
        # without this the (PNG-heavy) media table re-scans per bucket.
        # ONLY when docs filter by the same layout column (ADVICE r2):
        # docs on the md5-hash fallback assign doc -> md5 % n, while
        # media's layout column gives pmod(md5 % L, n) — these disagree
        # unless n | L, silently turning media spans into counted skips.
        # Mixed inputs therefore run with an unpruned media scan.
        media_b = (
            media_df.filter(bucket_filter(media_df, n_buckets, b))
            if media_has_bucket and filter_method == "bucket-column"
            else media_df
        )
        result = run_pipeline(
            spark,
            docs_df,
            media_b,
            profile=profile,
            mode=mode,
            run_id=run_id,
            attempt=attempt,
            docs_filter=bucket_filter(docs_df, n_buckets, b),
            **pipeline_kw,
        )
        bucket_path = os.path.join(out_dir, f"bucket={b}")
        t0 = time.time()
        result.write.mode("overwrite").parquet(bucket_path)
        stats = (
            spark.read.parquet(bucket_path)
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("metrics.n_spans").alias("n_spans"),
                F.sum("metrics.skipped").alias("n_skipped"),
            )
            .collect()[0]
        )
        _commit_manifest(
            out_dir,
            {
                "run_id": run_id,
                "bucket": b,
                "n_buckets": n_buckets,
                "filter": filter_method,
                "attempt": attempt,
                "n_docs": int(stats["n_docs"] or 0),
                "n_spans": int(stats["n_spans"] or 0),
                "n_skipped": int(stats["n_skipped"] or 0),
                "elapsed_s": round(time.time() - t0, 3),
                "profile": profile,
                "mode": mode,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            },
        )
        processed.append(b)
    return {
        "run_id": run_id,
        "processed_buckets": processed,
        "skipped_buckets": skipped,
        "n_buckets": n_buckets,
        "elapsed_s": round(time.time() - t_start, 3),
        "complete": len(completed_buckets(out_dir)) == n_buckets,
    }


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of all committed bucket outputs."""
    done = completed_buckets(out_dir)
    paths = [os.path.join(out_dir, f"bucket={b}") for b in sorted(done)]
    if not paths:
        raise FileNotFoundError(f"no committed buckets under {out_dir}")
    return spark.read.parquet(*paths)
