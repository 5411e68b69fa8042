"""Structured Streaming ingestion face (SURVEY.md §2.10).

The extraction stages are pure DataFrame→DataFrame, so the batch pipeline
IS the streaming pipeline: wire `readStream` in front of `extract_pages`
and pick a trigger. Used by the st3_stream_extract battery query; on a
real cluster the file source below swaps for Kafka/WARC-drop sources with
no change to the stage functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from greenocr_spark.operators.extract import extract_pages

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_pages(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-drop source over the pages schema (append-only directory)."""
    return spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(source_dir)


def extract_stream(pages: DataFrame) -> DataFrame:
    """Streaming extraction: same stage function as batch."""
    return extract_pages(pages)


def hourly_ingest_metrics(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window ingest metrics over warc_ts — the
    late-data-tolerant monitoring face."""
    return (
        pages.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("lang"))
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("html")).alias("bytes_in"))
        .select(F.col("w.start").alias("hour"), "lang", "n_pages", "bytes_in")
    )


def run_available_now(stream: DataFrame, query_name: str, checkpoint: str,
                      output_mode: str = "append"):
    """Drain everything currently in the source, checkpointed — the
    batch-with-resume execution discipline expressed as a stream trigger."""
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
