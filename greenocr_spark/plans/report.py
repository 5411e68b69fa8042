"""Job report: roll the per-partition manifest/metrics rows up into the
operator's health view (A4/A6/A11 consumers — the reference's epoch-loss
printout, train.py:1193-1198, as a queryable DataFrame).

Everything here reads ONLY the manifest (n_parts rows), never the data —
at 10^12 documents the report costs the same as at 10^3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenocr_spark.plans.job import read_manifest


def job_report(spark: SparkSession, out_dir: str) -> DataFrame:
    """One-row summary: totals, content ratio, compression, skew stats."""
    m = read_manifest(spark, out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    done = m.filter(F.col("status") == "done")
    return done.agg(
        F.countDistinct("part_id").alias("n_partitions"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
        F.round(F.sum("bytes_out") / F.sum("bytes_in"), 4).alias("keep_ratio"),
        F.round(
            F.sum("n_content_blocks")
            / (F.sum("n_content_blocks") + F.sum("n_boilerplate_blocks")),
            4,
        ).alias("content_block_ratio"),
        # skew: max/mean partition load — the balance the salted key buys
        F.round(F.max("n_docs") / F.avg("n_docs"), 3).alias("max_over_mean_docs"),
        F.round(F.max("bytes_in") / F.avg("bytes_in"), 3).alias("max_over_mean_bytes"),
        F.countDistinct("run_id").alias("n_runs"),
    )


def partition_report(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-partition rows ordered by load — feed for skew inspection."""
    m = read_manifest(spark, out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    return (
        m.filter(F.col("status") == "done")
        .select("part_id", "n_docs", "bytes_in", "bytes_out", "run_id")
        .orderBy(F.desc("bytes_in"))
    )
