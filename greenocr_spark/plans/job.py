"""The flagship extraction job: salted partitioning, manifest lineage,
checkpoint-resume by anti-join (north rule; SURVEY.md §3.1, §4 X7).

Physical plan (one shuffle total):
    scan pages → [anti-join done manifests: broadcast, no extra shuffle]
    → repartition(n_parts, part_id)            ← THE shuffle
    → sortWithinPartitions(url)                ← deterministic output order
    → mapInPandas extract (narrow, Arrow-batched)
    → dynamic-partition-overwrite write (idempotent per partition)
    → metrics agg (partial map-side, tiny) → manifest append

Scale notes (100 TB / 10^12 rows): the only all-data shuffle is the
repartition on the salted key; the manifest side of the anti-join is
n_parts rows (≤ 10^5) → always broadcast; metrics aggregation reduces to
n_parts rows map-side before the exchange. Re-running a partition is
idempotent via dynamic partition overwrite, so a crash between the data
write and the manifest append self-heals on resume.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from greenocr_spark.functions.sqlfns import salted_part_id
from greenocr_spark.operators.extract import extract_pages, extract_schema

MANIFEST_COLS = [
    "part_id",
    "status",
    "n_docs",
    "n_content_blocks",
    "n_boilerplate_blocks",
    "bytes_in",
    "bytes_out",
    "run_id",
]


def _extracted_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "extracted")


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """None ONLY when the manifest doesn't exist yet (first run). Any other
    failure propagates: treating a transient FS error as 'first run' would
    silently restart the whole job (and, for adaptive salting, re-derive a
    different hot map — breaking part_id stability)."""
    path = _manifest_dir(out_dir)
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def pending_pages(
    spark: SparkSession, pages: DataFrame, out_dir: str, n_parts: int, n_salts: int
) -> DataFrame:
    """Attach part_id and anti-join away partitions already marked done
    (J5 — the reference's commented-out skip-if-exists, ENHANCMENT24.py:86-87,
    done properly)."""
    df = pages.withColumn("part_id", salted_part_id(F.col("url"), n_parts, n_salts))
    manifest = read_manifest(spark, out_dir)
    if manifest is None:
        return df
    done = manifest.filter(F.col("status") == "done").select("part_id").distinct()
    # done is ≤ n_parts rows → broadcast hash anti-join, no shuffle of df
    return df.join(F.broadcast(done), "part_id", "left_anti")


def run_extract_job(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_parts: int = 64,
    n_salts: int = 8,
    run_id: str | None = None,
    resume: bool = True,
    salting: str = "uniform",
    with_links: bool = False,
    with_anchors: bool = False,
) -> DataFrame:
    """Run (or resume) the extraction job. Returns the final extracted table
    (read back from storage, all partitions).

    salting: 'uniform' salts every url (robust default for unknown host
    distributions); 'adaptive' salts only hosts carrying >5% of rows and
    keeps the long tail host-local (Scarlett-style skew handling — one
    extra cheap host-count aggregation). NOTE: resume requires the SAME
    salting mode across runs; in adaptive mode the hot-host list is
    persisted next to the manifest on the first run and REUSED on resume,
    so part_id assignment stays stable even if the input dataset drifted
    between runs (ADVICE r01)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if resume:
        # like the salting mode, the fused-face flags must be stable across
        # resume: mixing runs would leave partition dirs with two different
        # schemas under one table (and a fully-done resume would silently
        # hand back a table of the other shape). Fail loudly up front.
        try:
            existing = spark.read.parquet(_extracted_dir(out_dir)).schema.fieldNames()
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                existing = None
            else:
                raise
        if existing is not None:
            for flag_name, flag, col in (
                ("with_links", with_links, "outlinks"),
                ("with_anchors", with_anchors, "anchors"),
            ):
                has = col in existing
                if has != flag:
                    raise ValueError(
                        f"extracted table at {_extracted_dir(out_dir)} was "
                        f"written {flag_name}={has}; resuming "
                        f"{flag_name}={flag} would mix schemas under one "
                        "table — rerun with the same flag or extract into "
                        "a fresh out_dir"
                    )

    if salting == "adaptive":
        from greenocr_spark.functions.sqlfns import (
            adaptive_salted_part_id,
            hot_salted_part_id,
        )

        # hot-host map (host -> salt count) lives next to the manifest (same
        # FS as the data, via Spark, so s3a/hdfs out_dirs work) and is
        # REUSED on resume
        hot_dir = os.path.join(out_dir, "hot_hosts")
        hot = None
        if resume:
            try:
                hot_df = spark.read.parquet(hot_dir)
                if not {"h", "s"} <= set(hot_df.columns):
                    # Pre-upgrade layouts persisted only 'h' (and used a
                    # hashed (host,salt) part_id formula); their manifests'
                    # part_ids no longer match what this version assigns, so
                    # resuming would mis-route rows. Fail explicitly instead
                    # of KeyError-ing mid-resume (ADVICE r02).
                    raise ValueError(
                        f"incompatible hot_hosts layout at {hot_dir} "
                        f"(columns {sorted(hot_df.columns)}, expected h/s): "
                        "this out_dir was written by an older version whose "
                        "part_id assignment differs — rerun fresh into a new "
                        "out_dir (or delete this one) instead of resuming"
                    )
                hot = {r["h"]: r["s"] for r in hot_df.collect()}
            except AnalysisException as e:
                # ONLY a missing path means first run; a transient read
                # failure must propagate, not silently re-derive a different
                # hot map (which would shift part_ids under the manifest)
                if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                    hot = None
                else:
                    raise
        if hot is not None:
            pages = pages.withColumn(
                "part_id", hot_salted_part_id("url", hot, n_parts, n_salts)
            )
        else:
            pages, hot = adaptive_salted_part_id(pages, "url", n_parts, n_salts)
            spark.createDataFrame(
                [(h, int(s)) for h, s in hot.items()], "h string, s int"
            ).coalesce(1).write.mode("overwrite").parquet(hot_dir)
        if resume:
            manifest = read_manifest(spark, out_dir)
            if manifest is not None:
                done = manifest.filter(F.col("status") == "done").select("part_id").distinct()
                pages = pages.join(F.broadcast(done), "part_id", "left_anti")
        df = pages
    elif resume:
        df = pending_pages(spark, pages, out_dir, n_parts, n_salts)
    else:
        df = pages.withColumn("part_id", salted_part_id(F.col("url"), n_parts, n_salts))

    if df.isEmpty():
        # nothing pending: empty input, or a resume where every partition is
        # already done. Return what storage has (possibly nothing) — the
        # parquet reader cannot infer schema from an empty directory.
        ext_path = _extracted_dir(out_dir)
        try:
            return spark.read.parquet(ext_path)
        except Exception:
            # forward the fused-face flags so the empty path's schema
            # matches the non-empty path's (ADVICE r04)
            return spark.createDataFrame(
                [],
                extract_schema(
                    ["part_id"],
                    df.schema,
                    with_links=with_links,
                    with_anchors=with_anchors,
                ),
            )

    ext_path = _extracted_dir(out_dir)
    df = df.repartition(n_parts, "part_id").sortWithinPartitions("url")
    extracted = extract_pages(
        df,
        passthrough=("part_id",),
        with_links=with_links,
        with_anchors=with_anchors,
    )
    from greenocr_spark.sources.pages import write_extracted

    write_extracted(extracted, ext_path, partition_col="part_id")

    # Metrics/lineage rows (A4/A6 analog: per-partition running stats merged
    # by a final agg — reference train.py:1193-1207). Read back the committed
    # output so extraction runs exactly once.
    written = spark.read.parquet(ext_path)
    manifest_existing = read_manifest(spark, out_dir)
    if manifest_existing is not None:
        done = (
            manifest_existing.filter(F.col("status") == "done").select("part_id").distinct()
        )
        new_rows = written.join(F.broadcast(done), "part_id", "left_anti")
    else:
        new_rows = written
    metrics = (
        new_rows.groupBy("part_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_content").cast("long").alias("n_content_blocks"),
            F.sum("n_boilerplate").cast("long").alias("n_boilerplate_blocks"),
            F.sum("bytes_in").cast("long").alias("bytes_in"),
            F.sum("bytes_out").cast("long").alias("bytes_out"),
        )
        .withColumn("status", F.lit("done"))
        .withColumn("run_id", F.lit(run_id))
        .select(*MANIFEST_COLS)
    )
    metrics.write.mode("append").parquet(_manifest_dir(out_dir))
    return spark.read.parquet(ext_path)
