#!/usr/bin/env python
"""Volume soak: the FULL extraction job (salted shuffle + partitioned
parquet write + manifest/metrics + resume no-op) on Zipf-skewed fixture
pages at local[32]. Complements run_scaling.py (which isolates the compute
stage): this one proves the end-to-end job plan — one shuffle, dynamic
partition overwrite, broadcast anti-join resume — holds at volume, and
that adaptive salting bounds task-time skew when one host carries ~30%
of all rows.

Usage: python BENCH/run_soak.py [--pages 125000] [--replicate 16]
       [--salting uniform|adaptive|both]
Prints one JSON line per salting mode; appends ONE combined table to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _task_skew(spark, n_parts: int):
    """max/median executorRunTime over the extract stage's tasks, via the
    REST status API (the stage with the largest total task time is the
    post-shuffle extract+write stage). Returns (median_ms, max_ms) or None."""
    import urllib.request

    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
            stages = json.load(r)
        # the extract+write stage is the one with ~n_parts tasks; stages with
        # fewer tasks (input synthesis, count, manifest) must not be picked
        # even when their total runtime is larger
        big = max(
            (s for s in stages if s.get("numCompleteTasks", 0) >= 0.9 * n_parts),
            key=lambda s: s.get("executorRunTime", 0),
        )
        url = (
            f"{ui}/api/v1/applications/{app}/stages/{big['stageId']}/"
            f"{big['attemptId']}/taskSummary?quantiles=0.5,0.95,1.0"
        )
        with urllib.request.urlopen(url) as r:
            summ = json.load(r)
        med, p95, mx = summ["executorRunTime"]
        return {
            "median_ms": float(med),
            "p95_ms": float(p95),
            "max_ms": float(mx),
            "stage_name": big.get("name", "?")[:80],
            "stage_id": big["stageId"],
            "n_tasks": big.get("numCompleteTasks"),
        }
    except Exception:
        return None


def soak_one(pages_path: str, replicate: int, cpus: int, salting: str) -> dict:
    """Run the full job once in a FRESH session (so the REST skew probe sees
    only this mode's stages), plus a resume no-op; return the metrics row."""
    from pyspark.sql import functions as F

    from greenocr_spark.plans.job import run_extract_job
    from greenocr_spark.session import build_session

    spark = build_session(app_name=f"soak-{salting}", master=f"local[{cpus}]",
                          shuffle_partitions=64,
                          extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    pages = (
        spark.read.parquet(pages_path)
        # spread the input synthesis (explode ×replicate) over the executors:
        # the base parquet is one file → 1-2 scan tasks, and without this the
        # soak bottlenecks on the generator, not the job (a real Iceberg
        # table arrives in many files)
        .repartition(4 * cpus)
        .select("url", "warc_ts", "html", "text", "lang",
                F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("v"))
        .select(F.concat("url", F.lit("#v"), F.col("v").cast("string")).alias("url"),
                "warc_ts", "html", "text", "lang")
    )
    n_in = pages.count()
    out = f"/tmp/greenocr_soak_out_{salting}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_extract_job(spark, pages, out, n_parts=256, n_salts=16,
                          salting=salting)
    n_out = res.count()
    secs = time.perf_counter() - t0
    skew = _task_skew(spark, 256)
    t1 = time.perf_counter()
    run_extract_job(spark, pages, out, n_parts=256, n_salts=16,
                    salting=salting)
    resume_secs = time.perf_counter() - t1
    du = sum(os.path.getsize(os.path.join(dp, f)) for dp, _, fs in os.walk(out) for f in fs)
    rec = {
        "metric": "end-to-end job soak (shuffle+extract+write+manifest)",
        "n_pages": n_in, "rows_out": n_out, "secs": round(secs, 1),
        "docs_per_sec": round(n_in / secs, 1),
        "resume_noop_secs": round(resume_secs, 1),
        "output_gb": round(du / 1e9, 2), "cpus": cpus,
        "salting": salting,
    }
    if skew:
        rec["task_ms_median"] = round(skew["median_ms"], 1)
        rec["task_ms_p95"] = round(skew["p95_ms"], 1)
        rec["task_ms_max"] = round(skew["max_ms"], 1)
        rec["task_max_over_median"] = round(
            skew["max_ms"] / max(skew["median_ms"], 1e-9), 2
        )
        rec["task_stage"] = f"{skew['stage_id']}:{skew['stage_name']} ({skew['n_tasks']} tasks)"
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return rec


def _md_row(r: dict) -> str:
    skew = (
        f"{r['task_ms_median']:.0f} / {r['task_ms_p95']:.0f} / {r['task_ms_max']:.0f}"
        if "task_ms_median" in r else "n/a"
    )
    return (f"| {r['n_pages']:,} | {r['salting']} | {r['secs']:.1f} s "
            f"| {r['docs_per_sec']:,.0f} | {r['resume_noop_secs']:.1f} s "
            f"| {skew} | {r['output_gb']:.2f} GB |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=125000)
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--salting", choices=["uniform", "adaptive", "both"], default="both")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    pages_path = f"/tmp/greenocr_scaling_pages_{args.pages}.parquet"
    if not os.path.exists(pages_path):
        from greenocr_spark.fixtures import write_pages_parquet

        write_pages_parquet(pages_path, args.pages)

    modes = ["uniform", "adaptive"] if args.salting == "both" else [args.salting]
    rows = []
    for mode in modes:
        rec = soak_one(pages_path, args.replicate, args.cpus, mode)
        print(json.dumps(rec))
        rows.append(rec)

    # append ONE combined section to BENCH/BASELINE.md (run_scaling.py
    # rewrites that file, so rerun soak after scaling to restore this section)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(md):
        n_in = rows[0]["n_pages"]
        with open(md, "a") as f:
            f.write(f"""
## Volume soak (end-to-end job, not just the compute stage)

`python BENCH/run_soak.py` — the FULL job (salted repartition shuffle ->
extract -> partitioned parquet write -> manifest metrics -> read-back) on
{n_in:,} fixture pages at local[{args.cpus}], cold start included, one fresh
Spark session per salting mode:

| pages | salting | wall | docs/s end-to-end | resume no-op | task ms med/p95/max | output |
|---|---|---|---|---|---|---|
{chr(10).join(_md_row(r) for r in rows)}

Input hosts are Zipf-skewed (one host ~30% of rows); the task column is the
extract stage's executorRunTime spread. Uniform salting (fixed n_salts per
host) leaves the hot host in n_salts oversized buckets — hence its large
max/median straggler. Adaptive salting spreads every host that exceeds the
partition budget (total/n_parts) over ceil(count/budget) salts laid out
round-robin (one per-host count aggregate, functions/sqlfns.py), so no
partition carries much more than one budget of rows no matter how skewed
the hosts; residual spread is two-bucket partitions, python-worker
contention at the stage tail, and shared-VM noise.

Resume no-op cost is pure manifest anti-join + read-back — no partition
re-extracted. At 10^12 rows the same plan holds: the anti-join side stays
<= n_parts rows, the shuffle is the single all-data exchange, and writes
are per-partition idempotent.
""")


if __name__ == "__main__":
    main()
