#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "extraction": {"docs": N, "spans": N, "docs_per_sec": ..., "spans_per_sec": ...}}

--scaling additionally runs the extraction job at local[N] and
local[4N] (N = cpus/4) with a warmup pass each and reports throughput
at both plus efficiency = (T_N / T_4N) / 4 — the sandbox proxy for the
north_rule's two-cluster-size criterion (no real cluster here). It
also calibrates the machine's embarrassingly-parallel ceiling (pure-CPU
multiprocessing spin at N vs 4N busy cores, no Spark): this VM's host
throttles per-core throughput when all vCPUs are busy, so raw
efficiency is bounded by the ceiling; `scaling_efficiency_vs_machine`
is the plan-level signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DOCS = {"sf0.001": 60, "sf0.01": 120, "sf0.1": 240}
# scaling runs need enough work to amortize the heaviest single span
# (a 2 MP grid page costs ~100x a clean page). After the kernel strip
# fixes the heaviest span is ~3 s, so fused no longer hits a critical-
# path bound at this corpus size and measures the cleanest efficiency;
# hybrid/staged remain the answer for giant-single-span docs (500-page
# pdfs) and measure >=0.9 as well (BENCH/BASELINE.md).
SCALE_DOCS = {"sf0.001": 120, "sf0.01": 240, "sf0.1": 2400}
SCALE_MODE = "fused"
WARMUP_DOCS = 16


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def _corpus(n_docs: int, skew: int = 24) -> str:
    from ocr_spark.spark.corpus import fixture_corpus_dir

    return fixture_corpus_dir(n_docs, skew)


def _extraction_stats(corpus_dir: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(corpus_dir, "documents.parquet"), columns=["spans"])
    spans = sum(len(x) for x in tbl.column("spans").to_pylist())
    return tbl.num_rows, spans


def _run_extraction(spark, corpus_dir: str, mode: str) -> float:
    from ocr_spark.spark.corpus import read_corpus
    from ocr_spark.spark.pipeline import run_pipeline

    docs, media = read_corpus(spark, corpus_dir)
    t0 = time.time()
    run_pipeline(spark, docs, media, mode=mode, run_id=f"bench-{mode}").count()
    return time.time() - t0


def _warmup(spark, sf_dir: str | None = None) -> None:
    """Warm python workers (imports + heap) AND the JVM's execution
    memory: in this sandbox first-touch page faults run at ~5 MB/s, so
    the first shuffle/aggregate pays a large one-time tax unless warmup
    queries fault the heap first. Warmup runs at the TARGET scale so the
    JVM heap reaches its working size before anything is timed."""
    from ocr_spark.functions import all_queries

    _run_extraction(spark, _corpus(WARMUP_DOCS, skew=8), "fused")
    specs = all_queries()
    warm_sf = sf_dir or "/root/testdata/sf0.001"
    for name in ("dedup_minhash_lsh", "dedup_simhash", "events_rollup"):
        specs[name].fn(spark, warm_sf).count()


def _timed(fn, repeats: int = 2) -> float:
    """min-of-N wall clock — the fault tax hits whichever run expands the
    JVM heap, so the minimum is the steady-state figure."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def _ann_recall(spark, sf_dir: str) -> dict:
    """recall@IVF_TOPK of each ANN variant vs the brute-force top-k,
    plus the trained-IVF recall-cost CURVE over (IVF_K, nprobe) — the
    evidence behind the chosen defaults (VERDICT r3 #5). The collects
    are (n_queries * k) id pairs — bounded and tiny."""
    from pyspark.sql import functions as F

    from ocr_spark.functions import similarity as S

    def pairs_of(df):
        df = df.filter(F.col("rnk") <= S.IVF_TOPK)
        return {
            (r["query_id"], r["neighbor_id"])
            for r in df.select("query_id", "neighbor_id").collect()
        }

    def pairs(name):
        return pairs_of(S.QUERIES[name].fn(spark, sf_dir))

    truth = pairs("embedding_cosine_topk")
    out = {"k": S.IVF_TOPK, "defaults": {"ivf_k": S.IVF_K, "nprobe": S.IVF_NPROBE}}
    for name in ("embedding_ann_ivf", "embedding_ann_ivf_trained"):
        out[name] = round(len(pairs(name) & truth) / len(truth), 3)
    curve = []
    for ck in (16, 32, 64):
        cents = S.train_centroids(sf_dir, ck)
        for nprobe in (2, 4, 8):
            t0 = time.time()
            p = pairs_of(S._ivf_search(spark, sf_dir, cents, "double", nprobe))
            curve.append(
                {
                    "ivf_k": ck,
                    "nprobe": nprobe,
                    "recall": round(len(p & truth) / len(truth), 3),
                    "sec": round(time.time() - t0, 3),
                }
            )
    out["ivf_curve"] = curve
    return out


def run_suite(sf_dir: str, cpus: int) -> dict:
    from ocr_spark.functions import all_queries
    from ocr_spark.spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", app_name="ocr-spark-bench",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, sf_dir)

    n_docs = BENCH_DOCS.get(os.path.basename(sf_dir.rstrip("/")), 60)
    corpus = _corpus(n_docs)
    docs_n, spans_n = _extraction_stats(corpus)

    queries: dict[str, float] = {}
    # extraction modes run INTERLEAVED round-robin with per-mode minima
    # (VERDICT r2 #3): sequential per-mode blocks let whichever mode runs
    # first absorb residual page-fault/contention tax, which once
    # recorded hybrid (a superset plan) as faster than fused — an
    # ordering artifact, not a plan property. Round-robin spreads the tax
    # across modes; min-of-3 recovers each mode's steady state.
    modes = ("fused", "hybrid", "staged")
    runs: dict[str, list[float]] = {m: [] for m in modes}
    for _ in range(3):
        for m in modes:
            t0 = time.time()
            _run_extraction(spark, corpus, m)
            runs[m].append(round(time.time() - t0, 3))
    best = {m: min(ts) for m, ts in runs.items()}
    t_fused, t_hy = best["fused"], best["hybrid"]
    queries["extract_fused"] = round(best["fused"], 3)
    queries["extract_hybrid"] = round(best["hybrid"], 3)
    queries["extract_staged"] = round(best["staged"], 3)

    headline = [
        "text_boilerplate",
        "text_token_stats",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "dedup_clusters",
        "sample_stratified",
        "vocab_top_terms",
        "embedding_cosine_topk",
        "embedding_ann_lsh",
        "embedding_ann_ivf",
        "embedding_ann_ivf_trained",
        "events_sessionize",
        "events_span_reassembly",
        "tpch_revenue_by_nation",
        "infer_output_parse",
    ]
    specs = all_queries()
    for name in headline:
        queries[name] = round(
            _timed(lambda: specs[name].fn(spark, sf_dir).count()), 3
        )

    # ANN quality: recall@k of each IVF variant against the brute-force
    # truth (VERDICT r2 #6 — the trained quantizer must show its recall)
    recall = _ann_recall(spark, sf_dir)

    # corpus-level quality metrics (SURVEY §7.6: skip counts, confidence)
    from pyspark.sql import functions as F

    from ocr_spark.spark.corpus import read_corpus
    from ocr_spark.spark.pipeline import run_pipeline

    docs_df, media_df = read_corpus(spark, corpus)
    ext = run_pipeline(spark, docs_df, media_df, mode="fused", run_id="bench-metrics")
    # confidence over docs that extracted at least one media span —
    # all-skipped docs report 0.0 by construction and would skew the stat
    has_media = F.col("metrics.n_media") > F.col("metrics.skipped")
    agg = ext.agg(
        F.sum("metrics.skipped").alias("skips"),
        F.avg(F.when(has_media, F.col("metrics.ocr_confidence"))).alias("avg_conf"),
        F.min(F.when(has_media, F.col("metrics.ocr_confidence"))).alias("min_conf"),
    ).collect()[0]
    spark.stop()

    total = round(sum(queries.values()), 3)
    return {
        "metric": "extraction+ops suite wall clock",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "ann_recall": recall,
        "sf": _sf_of(sf_dir),
        "extraction": {
            "docs": docs_n,
            "spans": spans_n,
            # headline throughput is the FUSED mode's (a single named
            # mode, not best-of); per-mode figures alongside
            "docs_per_sec": round(docs_n / t_fused, 3),
            "spans_per_sec": round(spans_n / t_fused, 3),
            "docs_per_sec_by_mode": {
                "fused": round(docs_n / t_fused, 3),
                "hybrid": round(docs_n / t_hy, 3),
                "staged": round(docs_n / queries["extract_staged"], 3),
            },
            # all interleaved iterations (round-robin order), so the
            # recorded artifact itself shows the run distribution — a
            # mode ranking is a plan property only if it holds across
            # these, not just in the minima (VERDICT r2 #3)
            "mode_runs_interleaved": runs,
            "skip_count": int(agg["skips"] or 0),
            "avg_ocr_confidence": round(float(agg["avg_conf"] or 0.0), 4),
            "min_ocr_confidence": round(float(agg["min_conf"] or 0.0), 4),
        },
    }


def _spin(n: int) -> int:
    h = 0
    for i in range(n):
        h = (h * 1103515245 + i) & 0xFFFFFFFF
    return h


def _pool_rate(n: int, iters: int = 6_000_000) -> float:
    """Per-core Mops/s of a pure-CPU spin with n busy cores (tiny
    working set, no Spark, no shared state) — the embarrassingly-
    parallel machine calibration. On this VM the host throttles
    per-core throughput as more vCPUs go busy (measured per-core rates
    of ~7.5 at 1 busy, ~5-7 at 8, ~3.5-4.9 at 32 — AND those numbers
    drift minute-to-minute with neighbor load), so even a PERFECTLY
    scaling job cannot exceed eff = rate(4N)/rate(N), and the ceiling
    itself must be measured in the same time window as the runs it
    normalizes."""
    import multiprocessing as mp

    # spawn, not fork: the caller (_scale_worker) hosts a live
    # SparkSession — forking a multithreaded JVM-attached process can
    # deadlock the calibration children (ADVICE r3)
    with mp.get_context("spawn").Pool(n) as p:
        p.map(_spin, [10_000] * n)  # warm the pool
        t0 = time.time()
        p.map(_spin, [iters] * (n * 2))
        dt = time.time() - t0
    return round(iters * 2 / dt / 1e6, 2)


def _tree_cpu_seconds() -> float:
    """utime+stime of this process and every LIVE descendant (the py4j
    JVM, pyspark.daemon, its forked python workers) via /proc — the
    cores-busy numerator for the scaling artifact's utilization figure.
    Workers that die and are reaped between the two samples lose their
    time (bias toward UNDER-counting utilization, never over)."""
    clk = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, int, int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            procs[int(pid)] = (int(parts[1]), int(parts[11]), int(parts[12]))
        except (OSError, IndexError, ValueError):
            continue
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    total = 0.0
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        if p in procs:
            total += (procs[p][1] + procs[p][2]) / clk
            stack.extend(kids.get(p, []))
    return total


def _scale_worker(n: int, corpus: str, conn) -> None:
    """Child process owning one live SparkSession at local[n]: warms
    once, then per parent request executes the n-core machine
    calibration (_pool_rate), the timed run, and the calibration AGAIN
    — a SYMMETRIC pair of host-speed probes bracketing the run's own
    time window (VERDICT r3 #2: a single one-sided probe mis-attributes
    neighbor bursts that start or end mid-run). Keeping both levels
    alive and ALTERNATING runs bounds host-speed drift between the
    levels (this VM's speed varies minute-to-minute with neighbor load
    — sequential per-level blocks measured the same job anywhere from
    60.8 s to 94.0 s at local[8] across one hour)."""
    from ocr_spark.spark.session import get_spark

    spark = get_spark(
        f"local[{n}]", app_name=f"ocr-spark-scale-{n}", shuffle_partitions=n
    )
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    _run_extraction(spark, corpus, SCALE_MODE)  # corpus-scale warm pass
    conn.send("ready")
    while True:
        if conn.recv() == "stop":
            break
        rate_before = _pool_rate(n)
        cpu0 = _tree_cpu_seconds()
        wall = _run_extraction(spark, corpus, SCALE_MODE)
        util = (_tree_cpu_seconds() - cpu0) / (wall * n)
        rate_after = _pool_rate(n)
        conn.send((wall, rate_before, rate_after, util))
    spark.stop()
    conn.close()


def run_scaling(sf_dir: str, cpus: int, reps: int = 5) -> dict:
    """Same extraction job at local[N] and local[4N] (N = cpus // 4),
    one live session per level, timed runs interleaved round-robin
    (min per level), each run BRACKETED by before+after host-speed
    probes so every rep carries its own embarrassingly-parallel
    machine-ceiling calibration (symmetric windows, VERDICT r3 #2)."""
    import multiprocessing as mp

    n_small = max(1, cpus // 4)
    n_docs = SCALE_DOCS.get(os.path.basename(sf_dir.rstrip("/")), 120)
    corpus = _corpus(n_docs)
    docs_n, spans_n = _extraction_stats(corpus)
    ctx = mp.get_context("spawn")
    workers = {}
    for n in (n_small, cpus):
        parent, child = ctx.Pipe()
        proc = ctx.Process(target=_scale_worker, args=(n, corpus, child))
        proc.start()
        assert parent.recv() == "ready"
        workers[n] = (proc, parent)
    walls: dict[int, list] = {n_small: [], cpus: []}
    rates: dict[int, list] = {n_small: [], cpus: []}  # (before, after) pairs
    utils: dict[int, list] = {n_small: [], cpus: []}
    for _ in range(reps):
        for n in (n_small, cpus):
            _, conn = workers[n]
            conn.send("run")
            wall, rb, ra, util = conn.recv()
            walls[n].append(round(wall, 3))
            rates[n].append((rb, ra))
            utils[n].append(round(util, 3))
    for proc, conn in workers.values():
        conn.send("stop")
        proc.join()
    t_small, t_big = min(walls[n_small]), min(walls[cpus])
    ratio = cpus // n_small
    eff = (t_small / t_big) / ratio
    # per-rep pairing: rep i's raw efficiency normalized by rep i's
    # measured machine ceiling (mean of the bracketing probes per level,
    # big-per-core over small-per-core) — a perfectly scaling job scores
    # 1.0 regardless of how hard the host throttles or how neighbors
    # drift between reps. `drift` is the worse of the two levels'
    # |before-after|/mean — the rep's own evidence of how unstable its
    # window was (quiet reps have drift near 0).
    per_rep = []
    for i in range(reps):
        raw_i = (walls[n_small][i] / walls[cpus][i]) / ratio
        mean_small = (rates[n_small][i][0] + rates[n_small][i][1]) / 2
        mean_big = (rates[cpus][i][0] + rates[cpus][i][1]) / 2
        ceil_i = mean_big / mean_small
        drift_i = max(
            abs(rates[n][i][0] - rates[n][i][1])
            / ((rates[n][i][0] + rates[n][i][1]) / 2)
            for n in (n_small, cpus)
        )
        per_rep.append(
            {
                "raw": round(raw_i, 3),
                "machine_ceiling": round(ceil_i, 3),
                "vs_machine": round(raw_i / ceil_i, 3),
                "calib_drift": round(drift_i, 3),
                "cpu_util_small": utils[n_small][i],
                "cpu_util_big": utils[cpus][i],
            }
        )
    vs_sorted = sorted(r["vs_machine"] for r in per_rep)
    vs_machine = vs_sorted[reps // 2]
    # the quietest rep (lowest bracketing-probe drift at both levels) is
    # the closest thing to an uncontended measurement this host offers —
    # its RAW efficiency is reported as the quiet-window spot check
    quiet = min(per_rep, key=lambda r: r["calib_drift"])
    return {
        "mode": SCALE_MODE,
        "cores_small": n_small,
        "cores_big": cpus,
        "docs": docs_n,
        "spans": spans_n,
        "sec_small": round(t_small, 3),
        "sec_big": round(t_big, 3),
        "runs_small": walls[n_small],
        "runs_big": walls[cpus],
        "per_core_mops_small": rates[n_small],
        "per_core_mops_big": rates[cpus],
        "docs_per_sec_small": round(docs_n / t_small, 3),
        "docs_per_sec_big": round(docs_n / t_big, 3),
        "spans_per_sec_small": round(spans_n / t_small, 3),
        "spans_per_sec_big": round(spans_n / t_big, 3),
        "scaling_efficiency": round(eff, 3),
        "scaling_reps": per_rep,
        # median of the per-rep normalized values — the plan-level signal
        "scaling_efficiency_vs_machine": vs_machine,
        "quiet_rep": quiet,
        # whole-process-tree CPU-seconds / (wall * cores) per level: a
        # utilization near 1 at the BIG level is direct evidence the
        # plan keeps 4N cores busy — independent of host throttling
        "cpu_util_small": utils[n_small],
        "cpu_util_big": utils[cpus],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        out = run_scaling(sf_dir, cpus)
        out["metric"] = "extraction scaling N->4N"
        out["unit"] = "sec"
        out["value"] = out["sec_big"]
        out["sf"] = _sf_of(sf_dir)
    else:
        out = run_suite(sf_dir, cpus)
        if "--with-scaling" in sys.argv:
            out["scaling"] = run_scaling(sf_dir, cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
