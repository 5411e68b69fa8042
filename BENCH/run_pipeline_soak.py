#!/usr/bin/env python
"""Composed-pipeline volume soak: extract → curate → export as ONE job
(plans/pipeline.py) over millions of Zipf-skewed fixture pages at local[N].

Each stage is individually soaked (run_soak.py / run_curation_soak.py /
run_export_soak.py); this one proves the HANDOFFS at volume — the
extracted table feeding curation, the curated table feeding export — and
that resume no-ops across stage boundaries (VERDICT r04 task 3). Volume
correctness gates, not just a stopwatch:
  - extracted rows == input pages (no page dropped in the salted shuffle)
  - curation funnel is monotone non-increasing and its tail equals the
    curated row count
  - export permutation completeness over the WRITTEN shards
    (count distinct pos == n_chunks, max pos == n_chunks-1)
  - a second run resumes every stage: export reports resumed, the extract
    manifest gains no rows, the funnel gains no rows

Usage: python BENCH/run_pipeline_soak.py [--pages 125000] [--replicate 16]
       [--cpus 32]
Prints one JSON line; appends ONE table to BENCH/BASELINE.md at
>= 1M pages (run_scaling.py REWRITES that file — always run scaling first).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=125_000)
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--seq-len", type=int, default=16)
    ap.add_argument("--rows-per-shard", type=int, default=500_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.plans.pipeline import export_dir, extract_dir, run_pipeline_job
    from greenocr_spark.session import build_session

    pages_path = f"/tmp/greenocr_scaling_pages_{args.pages}.parquet"
    if not os.path.exists(pages_path):
        write_pages_parquet(pages_path, args.pages)

    spark = build_session(
        app_name="pipeline-soak",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 4, 64),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # replicate the base fixture executor-side (the run_soak.py shape): the
    # input synthesis must not bottleneck the soak
    pages = (
        spark.read.parquet(pages_path)
        .repartition(4 * args.cpus)
        .select("url", "warc_ts", "html", "text", "lang",
                F.explode(F.sequence(F.lit(0), F.lit(args.replicate - 1))).alias("v"))
        .select(F.concat("url", F.lit("#v"), F.col("v").cast("string")).alias("url"),
                "warc_ts", "html", "text", "lang")
    )
    n_in = pages.count()

    work = tempfile.mkdtemp(prefix="pipeline_soak_")
    out = os.path.join(work, "pipe")
    kw = dict(
        n_parts=256,
        n_salts=16,
        salting="adaptive",
        seq_len=args.seq_len,
        rows_per_shard=args.rows_per_shard,
    )
    try:
        t0 = time.perf_counter()
        stats = run_pipeline_job(spark, pages, out, **kw)
        job_wall = time.perf_counter() - t0

        assert stats["extracted_rows"] == n_in, (
            f"pages dropped: {stats['extracted_rows']} != {n_in}"
        )
        funnel = stats["funnel"]
        assert all(f["rows_out"] <= f["rows_in"] for f in funnel)
        assert funnel[-1]["rows_out"] == stats["curated_rows"] > 0

        # permutation completeness over the written shards
        shards = spark.read.parquet(os.path.join(export_dir(out), "shards"))
        agg = shards.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("pos").alias("d"),
            F.max("pos").alias("mx"),
        ).collect()[0]
        n_chunks = stats["export"]["n_chunks"]
        complete = agg["n"] == agg["d"] == n_chunks and agg["mx"] == agg["n"] - 1

        n_extract_manifest = spark.read.parquet(
            os.path.join(extract_dir(out), "manifest")
        ).count()

        t0 = time.perf_counter()
        again = run_pipeline_job(spark, pages, out, **kw)
        resume_wall = time.perf_counter() - t0
        assert again["export"]["resumed"], "rerun must resume through export"
        assert len(again["funnel"]) == len(funnel), "funnel grew on resume"
        assert (
            spark.read.parquet(os.path.join(extract_dir(out), "manifest")).count()
            == n_extract_manifest
        ), "extract manifest grew on resume"

        rec = {
            "metric": "composed-pipeline soak (extract -> curate -> export)",
            "n_pages": n_in,
            "cpus": args.cpus,
            "job_wall_s": round(job_wall, 1),
            "pages_per_sec": round(n_in / max(job_wall, 1e-6), 1),
            "extracted_rows": stats["extracted_rows"],
            "curated_rows": stats["curated_rows"],
            "funnel": [(f["stage"], f["rows_in"], f["rows_out"]) for f in funnel],
            "n_chunks": n_chunks,
            "n_shards": stats["export"]["n_shards"],
            "n_tokens": stats["export"]["n_tokens"],
            "permutation_complete": bool(complete),
            "resume_noop_s": round(resume_wall, 1),
        }
        print(json.dumps(rec))
        assert complete, "permutation incomplete at volume — pipeline broken"

        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        if os.path.exists(md) and n_in >= 1_000_000:
            funnel_str = " → ".join(
                [f"{funnel[0]['rows_in']:,}"] + [f"{f['rows_out']:,} ({f['stage']})" for f in funnel]
            )
            with open(md, "a") as f:
                f.write(f"""
## Composed-pipeline soak (plans/pipeline.py at volume)

`python BENCH/run_pipeline_soak.py` — the FULL production path
extract → curate → export chained over {n_in:,} Zipf-skewed fixture
pages at local[{args.cpus}] (adaptive salting, seq_len {args.seq_len},
{args.rows_per_shard:,} rows/shard), cross-stage handoffs + resume
exercised at volume:

| pages | pipeline wall | pages/s | curated | chunks | shards | resume no-op | permutation complete |
|---|---|---|---|---|---|---|---|
| {n_in:,} | {rec['job_wall_s']}s | {rec['pages_per_sec']:,} | {rec['curated_rows']:,} | {rec['n_chunks']:,} | {rec['n_shards']} | {rec['resume_noop_s']}s | {rec['permutation_complete']} |

Curation funnel: {funnel_str}. The resume no-op re-runs the WHOLE chain:
extract finds nothing pending (manifest anti-join), curate returns the
committed table without a corpus rescan (all survivor sets + final
table committed), export verifies manifest shard_ids against on-disk
dirs — no stage recomputes, no manifest grows.
""")
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
