"""Incremental re-extraction (recrawl refresh) — extract only what changed.

Between crawl snapshots of a 10^12-row pages table, almost every url is
unchanged; re-running the full extraction job wastes the cluster. This job
keeps a lightweight url index (url, content signature, part_id — ~1% of
the page bytes) next to the output and, given the CURRENT snapshot:

  1. diffs it against the index: new urls, changed content (md5 of html),
     deleted urls;
  2. re-extracts ONLY the new/changed rows (the expensive stage runs on
     the delta, not the corpus);
  3. stitches affected partitions: freshly extracted rows ∪ previously
     extracted rows of untouched urls in those partitions. The stitched
     rows are STAGED to a scratch directory first and the final
     dynamic-partition overwrite reads from the staging copy — a job that
     reads the directory it is overwriting would otherwise depend on
     cached blocks surviving the write (an executor loss mid-commit
     recomputes `keep` from half-replaced partition files);
  4. commits the rebuilt url index via a versioned directory plus an
     atomically-replaced pointer file, so a crash at any instant leaves a
     complete, readable index (never a half-deleted one).

This is the plain-Spark expression of an Iceberg MERGE INTO keyed on url:
the same delta-join shape, with staged partition-overwrite standing in for
row-level commit. The first refresh (no index yet) degrades to the full
job semantics — and if extracted data exists without an index (e.g. the
index was lost), every existing partition is treated as affected so stale
urls are purged rather than becoming permanent phantoms.

Scale notes: the diff join shuffles (current ∪ index) on url once; the
stitch reads back only affected partitions (partition-pruned scan on
part_id); the affected-partition list is ≤ n_parts values collected to the
driver. Nothing else touches the full corpus (`n_pages` in the stats comes
from the index parquet's row-count metadata, not a second scan).

Sandbox caveat: the pointer file and staging moves use posix-visible
paths — the parquet-directory fallback this container runs on. On a real
deployment both are Iceberg commits (REPLACE TABLE for the index,
row-level MERGE/DELETE for the data) with the same delta-join plan.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenocr_spark.functions.sqlfns import salted_part_id
from greenocr_spark.operators.extract import extract_pages
from greenocr_spark.plans.job import _extracted_dir

_INDEX_POINTER = "INDEX_CURRENT"


def _index_root(out_dir: str) -> str:
    return os.path.join(out_dir, "url_index")


def _read_index(spark: SparkSession, out_dir: str):
    """Resolve the pointer file to the current committed index version.
    Returns (index DataFrame | None, layout meta dict | None). The pointer
    carries the partition-layout parameters the index was built with
    (n_parts/n_salts) so a later refresh can't silently mix layouts."""
    root = _index_root(out_dir)
    ptr = os.path.join(root, _INDEX_POINTER)
    if not os.path.exists(ptr):
        return None, None
    with open(ptr) as f:
        lines = f.read().strip().splitlines()
    version = lines[0]
    meta = None
    if len(lines) > 1:
        meta = dict(kv.split("=", 1) for kv in lines[1:] if "=" in kv)
        meta = {k: int(v) for k, v in meta.items()}
    return spark.read.parquet(os.path.join(root, version)), meta


def _commit_index(out_dir: str, version: str, n_parts: int, n_salts: int) -> None:
    """Atomically repoint the index to `version` (os.replace of a one-line
    file is atomic on posix) and best-effort clean older versions. The
    layout params ride in the same atomic pointer write — meta and version
    can never disagree."""
    root = _index_root(out_dir)
    ptr = os.path.join(root, _INDEX_POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{version}\nn_parts={n_parts}\nn_salts={n_salts}")
    os.replace(tmp, ptr)
    for entry in os.listdir(root):
        if entry.startswith("v_") and entry != version:
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)


def _existing_part_ids(out_dir: str) -> set:
    """Partition ids already present in the extracted table (directory
    listing of the hive-style layout)."""
    ext = _extracted_dir(out_dir)
    if not os.path.isdir(ext):
        return set()
    out = set()
    for entry in os.listdir(ext):
        if entry.startswith("part_id="):
            try:
                out.add(int(entry.split("=", 1)[1]))
            except ValueError:
                pass
    return out


def refresh_extract(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_parts: int = 64,
    n_salts: int = 8,
) -> dict:
    """Refresh the extracted table to match the given pages snapshot.
    Returns stats {n_pages, n_new_or_changed, n_deleted, n_parts_rewritten,
    n_kept}.

    url is the table key (input_hint: per-url byte identity) — the snapshot
    must not repeat it; with duplicate urls the per-url diff is undefined."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    cur = pages.withColumn(
        "part_id", salted_part_id(F.col("url"), n_parts, n_salts)
    ).withColumn("sig", F.coalesce(F.md5("html"), F.lit("")))

    index, idx_meta = _read_index(spark, out_dir)
    if index is not None:
        # A refresh with different layout params would write changed urls
        # into new-layout partitions while their stale rows sit in
        # old-layout partitions that never enter `affected` — permanent
        # duplicate urls (ADVICE r02). The committed layout wins; reject
        # mismatches loudly.
        if idx_meta is None:
            raise ValueError(
                f"url index at {_index_root(out_dir)} has no layout metadata "
                "(written by an older version); its part_id assignment cannot "
                "be validated against this refresh — rebuild the output fresh"
            )
        if idx_meta.get("n_parts") != n_parts or idx_meta.get("n_salts") != n_salts:
            raise ValueError(
                f"layout mismatch: index committed with n_parts="
                f"{idx_meta.get('n_parts')}, n_salts={idx_meta.get('n_salts')} "
                f"but refresh called with n_parts={n_parts}, n_salts={n_salts}; "
                "changing the partition layout requires a fresh rebuild"
            )

    if index is None:
        changed = cur
        deleted = cur.limit(0).select("url", "part_id")
    else:
        old = index.select("url", F.col("sig").alias("old_sig"))
        joined = cur.join(old, "url", "left")
        changed = joined.filter(
            F.col("old_sig").isNull() | (F.col("old_sig") != F.col("sig"))
        ).drop("old_sig")
        deleted = index.join(cur.select("url"), "url", "left_anti").select(
            "url", "part_id"
        )

    changed = changed.persist()
    keep = None
    staging = os.path.join(out_dir, f"_staging_refresh_{uuid.uuid4().hex[:8]}")
    try:
        n_changed = changed.count()
        changed_parts = {
            r["part_id"] for r in changed.select("part_id").distinct().collect()
        }
        deleted_parts = {
            r["part_id"] for r in deleted.select("part_id").distinct().collect()
        }
        affected = changed_parts | deleted_parts
        if index is None:
            # extracted data without an index (lost/never committed): every
            # existing partition is suspect — include them all so urls no
            # longer in any snapshot are purged, not fossilized
            affected |= _existing_part_ids(out_dir)
        n_deleted = deleted.count()
        n_kept = 0

        if affected:
            new_rows = extract_pages(
                changed.select("url", "html", "part_id"), passthrough=("part_id",)
            )
            parts_with_rows = set(changed_parts)
            if index is not None:
                prev = spark.read.parquet(_extracted_dir(out_dir)).filter(
                    F.col("part_id").isin(list(affected))
                )
                # untouched urls co-located in affected partitions keep
                # their previously extracted rows — no re-extraction
                touched_urls = changed.select("url").union(deleted.select("url"))
                keep = prev.join(touched_urls, "url", "left_anti").persist()
                n_kept = keep.count()
                parts_with_rows |= {
                    r["part_id"] for r in keep.select("part_id").distinct().collect()
                }
                out_rows = new_rows.unionByName(keep)
            else:
                out_rows = new_rows

            # stage → read staging → overwrite: the final write never reads
            # from the directory it replaces
            (
                out_rows.repartition(max(len(affected), 1), "part_id")
                .sortWithinPartitions("url")
                .write.mode("overwrite")
                .parquet(staging)
            )
            (
                spark.read.parquet(staging)
                .write.mode("overwrite")
                .partitionBy("part_id")
                .parquet(_extracted_dir(out_dir))
            )
            # a partition whose urls were ALL deleted contributes no rows, so
            # dynamic overwrite never touches it — clear its files explicitly.
            # (Iceberg's overwritePartitions has the same blind spot; there
            # the fix is a DELETE WHERE part_id = p commit.)
            for p in affected - parts_with_rows:
                shutil.rmtree(
                    os.path.join(_extracted_dir(out_dir), f"part_id={p}"),
                    ignore_errors=True,
                )

        # rebuild the index to mirror the current snapshot exactly, then
        # commit by atomic pointer replace (crash-safe at every instant)
        version = f"v_{uuid.uuid4().hex[:12]}"
        idx_df = cur.select("url", "sig", "part_id")
        idx_df.write.mode("overwrite").parquet(
            os.path.join(_index_root(out_dir), version)
        )
        _commit_index(out_dir, version, n_parts, n_salts)
        n_pages = spark.read.parquet(
            os.path.join(_index_root(out_dir), version)
        ).count()  # parquet metadata count — no rescan of the snapshot

        return {
            "n_pages": n_pages,
            "n_new_or_changed": n_changed,
            "n_deleted": n_deleted,
            "n_parts_rewritten": len(affected),
            "n_kept": n_kept,
        }
    finally:
        changed.unpersist()
        if keep is not None:
            keep.unpersist()
        shutil.rmtree(staging, ignore_errors=True)
