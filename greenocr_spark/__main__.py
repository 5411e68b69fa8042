"""CLI: python -m greenocr_spark <command>

Commands:
    extract   --input PATH|TABLE --output DIR [--n-parts N] [--n-salts S]
              [--no-resume] [--limit N]   (or --fixture-pages N)
    bench     [bench.py args]             headline suite, one JSON line
    calibrate --input PATH --sample N     grid-fit scorer config on labeled pages
    compact   --output DIR [--target-mb N] [--min-files K]
              merge small files in DIR/extracted (rewrite_data_files analog)
    curate    --input PATH --output DIR [--min-tokens N] [--max-dup-frac F]
              [--eval-input PATH]  decontaminate against a benchmark table
              [--langs en,de,...] [--no-neardup] [--no-resample] [--no-resume]
              quality gates -> dedup -> near-dup removal -> mixture resample,
              stage-level checkpoint/resume; prints the funnel as JSON
    export    --input PATH --output DIR [--seq-len N] [--rows-per-shard N]
              [--seed S] [--no-resume]
              chunk -> seeded shuffle -> deterministic training shards with
              per-shard manifest; prints summary stats as JSON
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = sys.argv[1], sys.argv[2:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if cmd == "extract":
        sys.argv = ["extract_job", *rest]
        path = os.path.join(repo, "jobs", "extract_job.py")
        import importlib.util

        spec = importlib.util.spec_from_file_location("extract_job", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0
    if cmd == "bench":
        sys.argv = ["bench", *rest]
        path = os.path.join(repo, "bench.py")
        import importlib.util

        spec = importlib.util.spec_from_file_location("bench", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0
    if cmd == "calibrate":
        import argparse
        import json

        ap = argparse.ArgumentParser(prog="greenocr_spark calibrate")
        ap.add_argument("--input", required=True)
        ap.add_argument("--sample", type=int, default=0)
        a = ap.parse_args(rest)
        from pyspark.sql import functions as F

        from greenocr_spark.plans.calibrate import calibrate
        from greenocr_spark.session import build_session

        spark = build_session(app_name="calibrate")
        spark.sparkContext.setLogLevel("WARN")
        labeled = spark.read.parquet(a.input).filter(F.col("text").isNotNull())
        if a.sample:
            labeled = labeled.limit(a.sample)
        cfg, acc, _ = calibrate(labeled)
        print(json.dumps({"threshold": cfg.threshold, "neargood_chars": cfg.neargood_chars,
                          "accuracy": round(acc, 4)}))
        spark.stop()
        return 0
    if cmd == "compact":
        import argparse
        import json

        ap = argparse.ArgumentParser(prog="greenocr_spark compact")
        ap.add_argument("--output", required=True)
        ap.add_argument("--target-mb", type=int, default=128)
        ap.add_argument("--min-files", type=int, default=2)
        a = ap.parse_args(rest)
        from greenocr_spark.plans.compact import compact_extracted
        from greenocr_spark.session import build_session

        spark = build_session(app_name="compact")
        spark.sparkContext.setLogLevel("WARN")
        stats = compact_extracted(
            spark, a.output, target_bytes=a.target_mb * 1024 * 1024,
            min_files=a.min_files,
        )
        print(json.dumps(stats))
        spark.stop()
        return 0
    if cmd == "curate":
        import argparse
        import json

        ap = argparse.ArgumentParser(prog="greenocr_spark curate")
        ap.add_argument("--input", required=True)
        ap.add_argument("--output", required=True)
        ap.add_argument("--min-tokens", type=int, default=5)
        ap.add_argument("--max-dup-frac", type=float, default=0.6)
        ap.add_argument("--langs", default=None)
        ap.add_argument("--no-neardup", action="store_true")
        ap.add_argument("--no-resample", action="store_true")
        ap.add_argument("--eval-input", default=None,
                        help="benchmark table (parquet with a text column) "
                             "to decontaminate against")
        ap.add_argument("--decon-min-overlap", type=int, default=2)
        ap.add_argument("--no-resume", action="store_true")
        a = ap.parse_args(rest)
        from greenocr_spark.plans.curate import read_curate_manifest, run_curate_job
        from greenocr_spark.session import build_session

        spark = build_session(app_name="curate")
        spark.sparkContext.setLogLevel("WARN")
        curated = run_curate_job(
            spark,
            spark.read.parquet(a.input),
            a.output,
            min_tokens=a.min_tokens,
            max_dup_bigram_frac=a.max_dup_frac,
            langs=tuple(a.langs.split(",")) if a.langs else None,
            neardup=not a.no_neardup,
            resample=not a.no_resample,
            eval_docs=(spark.read.parquet(a.eval_input)
                       if a.eval_input else None),
            decon_min_overlap=a.decon_min_overlap,
            resume=not a.no_resume,
        )
        funnel = [
            r.asDict()
            for r in read_curate_manifest(spark, a.output)
            .orderBy("idx")
            .collect()
        ]
        print(json.dumps({"curated_rows": curated.count(), "funnel": funnel}))
        spark.stop()
        return 0
    if cmd == "export":
        import argparse
        import json

        ap = argparse.ArgumentParser(prog="greenocr_spark export")
        ap.add_argument("--input", required=True)
        ap.add_argument("--output", required=True)
        ap.add_argument("--seq-len", type=int, default=256)
        ap.add_argument("--rows-per-shard", type=int, default=100_000)
        ap.add_argument("--seed", type=int, default=42)
        ap.add_argument("--no-resume", action="store_true")
        a = ap.parse_args(rest)
        from greenocr_spark.plans.export import run_export_job
        from greenocr_spark.session import build_session

        spark = build_session(app_name="export")
        spark.sparkContext.setLogLevel("WARN")
        stats = run_export_job(
            spark,
            spark.read.parquet(a.input),
            a.output,
            seq_len=a.seq_len,
            rows_per_shard=a.rows_per_shard,
            seed=a.seed,
            resume=not a.no_resume,
        )
        print(json.dumps(stats))
        spark.stop()
        return 0
    print(f"unknown command: {cmd}\n{__doc__}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
