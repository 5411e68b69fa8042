"""Small-file compaction of the extracted table — routine maintenance at
10^12-row scale, where incremental refreshes and per-partition resume
writes accumulate many sub-target-size parquet files and every downstream
scan pays the per-file open/footers cost.

Plain-Spark expression of Iceberg's `rewrite_data_files` action:

  1. driver-side listing of the hive-layout partition dirs (≤ n_parts
     entries — never a data scan) picks partitions whose file count
     exceeds the threshold;
  2. each picked partition is read back (partition-pruned scan), coalesced
     to ceil(bytes/target) files, and STAGED to a scratch directory;
  3. the final dynamic-partition overwrite reads from staging, never from
     the directory it is replacing (same crash-safety argument as
     plans/incremental.py's stitch);
  4. row content is untouched — compaction commutes with every query and
     with the manifest (which tracks partitions, not files).

Only affected partitions are rewritten; untouched partitions keep their
files byte-identical.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from greenocr_spark.plans.job import _extracted_dir

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _partition_files(ext_dir: str) -> dict[int, list[str]]:
    """part_id -> data files, from the hive directory layout."""
    out: dict[int, list[str]] = {}
    if not os.path.isdir(ext_dir):
        return out
    for entry in os.listdir(ext_dir):
        if not entry.startswith("part_id="):
            continue
        try:
            pid = int(entry.split("=", 1)[1])
        except ValueError:
            continue
        pdir = os.path.join(ext_dir, entry)
        out[pid] = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
    return out


def compact_extracted(
    spark: SparkSession,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Compact fragmented partitions of `out_dir`/extracted. Returns stats
    {n_parts_compacted, files_before, files_after}. Idempotent: a second
    call is a no-op. Safe to run any time — rows are preserved exactly and
    the manifest is partition-grained, so it needs no update."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    ext_dir = _extracted_dir(out_dir)
    parts = _partition_files(ext_dir)
    picked = {
        pid: files for pid, files in parts.items() if len(files) >= min_files
    }
    files_before = sum(len(f) for f in parts.values())
    if not picked:
        return {
            "n_parts_compacted": 0,
            "files_before": files_before,
            "files_after": files_before,
        }

    staging = os.path.join(out_dir, f"_staging_compact_{uuid.uuid4().hex[:8]}")
    try:
        # partition-pruned scan: the IN-list is ≤ n_parts literals
        df = spark.read.parquet(ext_dir).filter(
            f"part_id in ({','.join(str(p) for p in sorted(picked))})"
        )
        # one output file per target_bytes of input, per partition: write
        # repartitioned by part_id with per-partition file count driven by
        # maxRecordsPerFile-style sizing. Coalescing ACROSS partitions is
        # wrong (a task would hold rows of several part_ids and dynamic
        # overwrite would still split them), so repartition on part_id and
        # let each task stream one partition into few files.
        sizes = {
            pid: sum(os.path.getsize(f) for f in files)
            for pid, files in picked.items()
        }
        n_out = max(
            1,
            sum(max(1, math.ceil(s / target_bytes)) for s in sizes.values()),
        )
        (
            df.repartition(n_out, "part_id")
            .sortWithinPartitions("url")
            .write.mode("overwrite")
            .parquet(staging)
        )
        (
            spark.read.parquet(staging)
            .write.mode("overwrite")
            .partitionBy("part_id")
            .parquet(ext_dir)
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    after = _partition_files(ext_dir)
    return {
        "n_parts_compacted": len(picked),
        "files_before": files_before,
        "files_after": sum(len(f) for f in after.values()),
    }
