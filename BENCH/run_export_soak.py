#!/usr/bin/env python
"""Export-job volume soak: chunk → seeded shuffle → deterministic shards
(plans/export.py) over millions of synthetic documents at local[N].

Complements run_curation_soak.py (curation chain) and run_soak.py
(extraction job): this one proves the dataset-builder shapes — the
narrow one-to-many chunker, the two-phase block-ranked permutation, the
exact-arithmetic shard assignment, and the one-file-per-shard sorted
write — hold at volume, and verifies the permutation is COMPLETE
(count distinct pos == n_chunks, max pos == n_chunks-1 — cheap
aggregates over the written shards), so the soak is a correctness check
at volume, not just a stopwatch. Also times the manifest-read resume
no-op.

Usage: python BENCH/run_export_soak.py [--docs 2000000] [--cpus 32]
Prints one JSON line; appends ONE table to BENCH/BASELINE.md
(run_scaling.py REWRITES that file — always run scaling first).
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
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--seq-len", type=int, default=16)
    ap.add_argument("--rows-per-shard", type=int, default=500_000)
    ap.add_argument("--keep", action="store_true", help="keep the temp dirs")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from BENCH.run_curation_soak import synth_documents
    from greenocr_spark.plans.export import run_export_job
    from greenocr_spark.session import build_session

    spark = build_session(
        app_name="export-soak",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 4, 64),
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="export_soak_")
    sf_dir = os.path.join(work, "sf")
    out = os.path.join(work, "out")
    try:
        t0 = time.perf_counter()
        synth_documents(spark, args.docs, sf_dir)
        t_synth = time.perf_counter() - t0

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        t0 = time.perf_counter()
        stats = run_export_job(
            spark,
            docs,
            out,
            seq_len=args.seq_len,
            rows_per_shard=args.rows_per_shard,
            seed=42,
        )
        job_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        again = run_export_job(
            spark,
            docs,
            out,
            seq_len=args.seq_len,
            rows_per_shard=args.rows_per_shard,
            seed=42,
        )
        resume_wall = time.perf_counter() - t0
        assert again["resumed"], "second run must resume from the manifest"

        # permutation completeness over the WRITTEN shards (volume gate)
        shards = spark.read.parquet(os.path.join(out, "shards"))
        agg = shards.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("pos").alias("d"),
            F.max("pos").alias("mx"),
        ).collect()[0]
        complete = agg["n"] == agg["d"] == stats["n_chunks"] and agg["mx"] == agg["n"] - 1

        rec = {
            "metric": "export-job soak",
            "n_docs": args.docs,
            "cpus": args.cpus,
            "seq_len": args.seq_len,
            "rows_per_shard": args.rows_per_shard,
            "synth_s": round(t_synth, 1),
            "job_wall_s": round(job_wall, 1),
            "resume_noop_s": round(resume_wall, 1),
            "n_chunks": stats["n_chunks"],
            "n_shards": stats["n_shards"],
            "n_tokens": stats["n_tokens"],
            "permutation_complete": bool(complete),
            "docs_per_sec": round(args.docs / max(job_wall, 1e-6), 1),
            "chunks_per_sec": round(stats["n_chunks"] / max(job_wall, 1e-6), 1),
        }
        print(json.dumps(rec))
        assert complete, "permutation incomplete at volume — export is broken"

        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        # smoke runs (--docs 20000) must not pollute the evidence file
        if os.path.exists(md) and args.docs >= 1_000_000:
            with open(md, "a") as f:
                f.write(f"""
## Export-JOB soak (plans/export.py at volume)

`python BENCH/run_export_soak.py` — chunk → seeded shuffle →
deterministic shards over {args.docs:,} synthetic docs at
local[{args.cpus}] (seq_len {args.seq_len}, {args.rows_per_shard:,}
rows/shard):

| docs | chunks | shards | job wall | docs/s | chunks/s | resume no-op | permutation complete |
|---|---|---|---|---|---|---|---|
| {args.docs:,} | {rec['n_chunks']:,} | {rec['n_shards']} | {rec['job_wall_s']}s | {rec['docs_per_sec']:,} | {rec['chunks_per_sec']:,} | {rec['resume_noop_s']}s | {rec['permutation_complete']} |

Completeness (count distinct pos == n_chunks, max pos == n_chunks−1
over the WRITTEN shards) makes the soak a correctness gate at volume:
a dropped or duplicated chunk anywhere in the two-shuffle pipeline
would fail it.
""")
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
