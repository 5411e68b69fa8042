"""Training-shard export job: chunk → shuffle → shard over a curated
(doc_id, text) corpus — the dataset-builder step that follows curation
(plans/curate.py) and precedes training.

Pipeline (fully deterministic, seed-parameterized):

1. **chunk** — fixed seq_len token chunks with stable (doc_id, chunk_idx)
   addresses (the chk1 kernel shape): narrow one-to-many projection, the
   word array materialized once per row, zero shuffles.
2. **shuffle** — every chunk gets a reproducible global position in a
   seeded pseudorandom permutation (the shuf1 two-phase block-ranking
   shape, keyed by md5(doc_id:chunk_idx:seed)): the key's 2-hex-char
   prefix buckets rows into 256 uniform blocks, per-block counts get
   block-start offsets from a window over the 256-row block table only,
   and blocks rank locally in parallel — no global-order window ever
   sees the corpus.
3. **shard** — shard_id = floor(pos / rows_per_shard): EXACT integer
   arithmetic, deliberately not a sampling-based range partitioner, so
   shard membership is identical run-over-run; one repartition on
   shard_id + sortWithinPartitions(pos) + partitionBy(shard_id) write
   gives exactly one file per shard, each internally in training order.
4. **manifest** — per-shard (n_rows, min_pos, max_pos, n_tokens) rows
   plus a params fingerprint (seq_len/rows_per_shard/seed) committed
   with the shards; a rerun against an existing out_dir with different
   params fails loudly instead of silently mixing layouts (the
   plans/incremental.py layout-guard lesson, ADVICE r02).

Resume: with resume=True (default) a committed manifest whose params
match is returned as-is — the export is a no-op. The job is end-to-end
deterministic, so a forced rerun reproduces identical shard contents
(pinned by tests/test_export.py).

Scale shape at 10^12 docs: two key-partitioned shuffles total (the
256-block ranking exchange and the shard_id exchange); rows_per_shard
sizes output files independently of executor count, and no stage ever
funnels the corpus through one partition.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# the chunking kernel is shared with the oracle-checked chk1_token_chunks
# battery entry (battery_ml.chunk_corpus) so query and job cannot diverge
from greenocr_spark.battery_ml import chunk_corpus  # noqa: F401  (re-export)

EXPORT_MANIFEST_COLS = ["shard_id", "n_rows", "min_pos", "max_pos", "n_tokens"]


def shuffle_positions(chunks: DataFrame, seed: int) -> DataFrame:
    """Seeded deterministic global permutation over chunks (shuf1 shape)."""
    key = F.md5(
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("chunk_idx").cast("string"),
            F.lit(str(seed)),
        )
    )
    c = chunks.withColumn("skey", key).withColumn(
        "blk", F.substring("skey", 1, 2)
    )
    blk_n = c.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
    w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = blk_n.select(
        "blk", F.coalesce(F.sum("n").over(w_blk), F.lit(0)).alias("off")
    )
    w_loc = Window.partitionBy("blk").orderBy("skey", "doc_id", "chunk_idx")
    return (
        c.join(F.broadcast(offsets), "blk")
        .withColumn(
            "pos",
            (F.col("off") + F.row_number().over(w_loc) - 1).cast("long"),
        )
        .drop("skey", "blk", "off")
    )


def _params_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_export_params.json")


def _check_or_commit_params(out_dir: str, params: dict) -> None:
    path = _params_path(out_dir)
    if os.path.exists(path):
        with open(path) as f:
            committed = json.load(f)
        if committed == params:
            return
        # the manifest's _SUCCESS is the durable commit marker: if it never
        # landed, the prior run crashed before producing anything a resume
        # could consume, so adopting new params is safe (the shard write is
        # a static overwrite); with a committed manifest, params drift would
        # silently mix layouts — fail loudly instead
        if os.path.exists(os.path.join(out_dir, "manifest", "_SUCCESS")):
            raise ValueError(
                f"export params drift at {out_dir}: committed={committed} "
                f"requested={params} — shards on disk were built under a "
                "different layout; export to a fresh out_dir or delete it"
            )
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f, sort_keys=True)
    os.replace(tmp, path)


def _shards_match_manifest(
    spark: SparkSession, out_dir: str, manifest_dir: str
) -> bool:
    """True iff every shard_id the manifest describes has its partition dir
    under out_dir/shards (partial deletions → False → recompute)."""
    shards_dir = os.path.join(out_dir, "shards")
    if not os.path.isdir(shards_dir):
        return False
    # skip unparsable partition dirs (shard_id=__HIVE_DEFAULT_PARTITION__,
    # stray temp dirs) instead of crashing resume on ValueError (ADVICE r04)
    on_disk = {
        int(name.split("=", 1)[1])
        for name in os.listdir(shards_dir)
        if name.startswith("shard_id=") and name.split("=", 1)[1].isdigit()
    }
    manifest_ids = {
        r["shard_id"]
        for r in spark.read.parquet(manifest_dir).select("shard_id").collect()
    }
    return manifest_ids <= on_disk


def read_export_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "manifest"))


def run_export_job(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    seq_len: int = 256,
    rows_per_shard: int = 100_000,
    seed: int = 42,
    resume: bool = True,
) -> dict:
    """Export docs as shuffled training shards; returns summary stats."""
    params = {
        "seq_len": int(seq_len),
        "rows_per_shard": int(rows_per_shard),
        "seed": int(seed),
    }
    _check_or_commit_params(out_dir, params)
    manifest_dir = os.path.join(out_dir, "manifest")
    if resume and os.path.exists(os.path.join(manifest_dir, "_SUCCESS")):
        # the manifest alone isn't proof the shards survived: verify every
        # manifest shard_id still has its partition dir on disk before
        # blessing the export as a no-op resume (ADVICE r03). The listing is
        # n_shards-bounded — no shard data is read. On mismatch fall through
        # to a full recompute (which invalidates this manifest first).
        if _shards_match_manifest(spark, out_dir, manifest_dir):
            return _stats_from_manifest(spark, manifest_dir, params, resumed=True)

    chunks = chunk_corpus(docs, seq_len)
    # guard on CHUNKS, not docs: a corpus of only whitespace docs would pass
    # a docs-level check, write zero shard files, and crash unreadably at
    # manifest build — after the static overwrite already wiped prior shards
    if chunks.isEmpty():
        raise ValueError(
            "export input yields no chunks — nothing to shard (wrong "
            "--input path, empty corpus, or every document is whitespace)"
        )
    # close the stale-manifest window BEFORE touching shards: if this run
    # dies between the shard overwrite and the manifest write, a resume
    # must see "no committed manifest" rather than the previous run's
    # manifest blessing shards it no longer describes
    shutil.rmtree(manifest_dir, ignore_errors=True)
    shuffled = shuffle_positions(chunks, seed)
    sharded = shuffled.withColumn(
        "shard_id", F.floor(F.col("pos") / F.lit(rows_per_shard)).cast("long")
    )
    # one task per shard → exactly one file per shard, sorted by pos inside.
    # STATIC overwrite: a forced rerun over a smaller input must remove the
    # old run's higher-numbered shard partitions — dynamic mode would leave
    # them on disk and the read-back manifest would silently bless a mix of
    # two corpora.
    (
        sharded.repartition("shard_id")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .option("partitionOverwriteMode", "static")
        .parquet(os.path.join(out_dir, "shards"))
    )
    shards = spark.read.parquet(os.path.join(out_dir, "shards"))
    manifest = shards.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(manifest_dir)
    # stats come from the 1-file manifest just written, not a second full
    # scan of every shard file
    return _stats_from_manifest(spark, manifest_dir, params, resumed=False)


def _stats_from_manifest(
    spark: SparkSession, manifest_dir: str, params: dict, resumed: bool
) -> dict:
    agg = (
        spark.read.parquet(manifest_dir)
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_rows").alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()[0]
    )
    return {
        "resumed": resumed,
        "n_shards": agg["n_shards"],
        "n_chunks": int(agg["n_chunks"]),
        "n_tokens": int(agg["n_tokens"]),
        **params,
    }
