"""Incremental refresh (recrawl) semantics: only the delta is re-extracted,
untouched partitions are never rewritten, and the final table always equals
a from-scratch extraction of the current snapshot."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from greenocr_spark.fixtures import make_page, make_pages
from greenocr_spark.functions.sqlfns import salted_part_id
from greenocr_spark.operators.extract import extract_pages
from greenocr_spark.plans.incremental import refresh_extract

N = 600
N_PARTS = 16


def _write_rows(path: str, rows: list) -> None:
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    cols = {k: [r[k] for r in rows] for k in ("url", "warc_ts", "html", "text", "lang")}
    pq.write_table(pa.Table.from_pydict(cols, schema=schema), path)


def _full_reference(spark, pages):
    df = pages.withColumn("part_id", salted_part_id(F.col("url"), N_PARTS, 8))
    out = extract_pages(df.select("url", "html", "part_id"), passthrough=("part_id",))
    return sorted(
        (r["url"], r["text"], r["n_blocks"], r["kind"]) for r in out.collect()
    )


def _refreshed(spark, out_dir):
    got = spark.read.parquet(f"{out_dir}/extracted")
    return sorted(
        (r["url"], r["text"], r["n_blocks"], r["kind"]) for r in got.collect()
    )


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory):
    d = tmp_path_factory.mktemp("incr")
    rows1 = make_pages(N)
    _write_rows(str(d / "snap1.parquet"), rows1)

    # snapshot 2: delete 10 urls, modify 30 pages' content, add 20 new pages
    deleted = {rows1[i]["url"] for i in range(0, 100, 10)}
    modified_idx = set(range(5, 305, 10))
    rows2 = []
    for i, r in enumerate(rows1):
        if r["url"] in deleted:
            continue
        if i in modified_idx:
            r = dict(r)
            r["html"] = (r["html"] or b"") + b"<p>freshly recrawled paragraph with new words</p>"
        rows2.append(r)
    # new urls: index offset guarantees distinct page-N path segments (url
    # is the table key per input_hint — a snapshot never repeats it)
    rows2.extend(make_page(100000 + i, seed=777) for i in range(20))
    _write_rows(str(d / "snap2.parquet"), rows2)
    return d, len(rows2), len(deleted)


def test_incremental_refresh(spark, snapshots, tmp_path):
    d, n2, n_deleted = snapshots
    out = str(tmp_path / "out")

    snap1 = spark.read.parquet(str(d / "snap1.parquet"))
    stats1 = refresh_extract(spark, snap1, out, n_parts=N_PARTS)
    assert stats1["n_new_or_changed"] == N  # first refresh = full extraction
    assert _refreshed(spark, out) == _full_reference(spark, snap1)

    snap2 = spark.read.parquet(str(d / "snap2.parquet"))
    stats2 = refresh_extract(spark, snap2, out, n_parts=N_PARTS)
    # only the delta was extracted: 30 modified + 20 new
    assert stats2["n_new_or_changed"] == 50
    assert stats2["n_deleted"] == n_deleted
    # untouched co-partitioned rows were stitched, not re-extracted
    assert stats2["n_kept"] > 0
    assert stats2["n_kept"] + 50 < n2 + n_deleted  # strictly less work than full
    # and the result is exactly the from-scratch extraction of snapshot 2
    assert _refreshed(spark, out) == _full_reference(spark, snap2)


def test_incremental_delete_empties_partition(spark, tmp_path):
    """Deleting every url of a partition must clear its files too — dynamic
    partition overwrite alone never touches a partition that contributes no
    rows, so refresh removes it explicitly."""
    out = str(tmp_path / "out3")
    rows1 = make_pages(80)
    p1 = str(tmp_path / "s1.parquet")
    _write_rows(p1, rows1)
    snap1 = spark.read.parquet(p1)
    refresh_extract(spark, snap1, out, n_parts=N_PARTS)

    # delete every url that landed in one chosen partition
    keyed = snap1.withColumn("part_id", salted_part_id(F.col("url"), N_PARTS, 8))
    some_part = keyed.select("part_id").first()["part_id"]
    doomed = {r["url"] for r in keyed.filter(F.col("part_id") == some_part).collect()}
    rows2 = [r for r in rows1 if r["url"] not in doomed]
    p2 = str(tmp_path / "s2.parquet")
    _write_rows(p2, rows2)
    snap2 = spark.read.parquet(p2)
    stats = refresh_extract(spark, snap2, out, n_parts=N_PARTS)

    assert stats["n_deleted"] == len(doomed)
    got_urls = {r["url"] for r in spark.read.parquet(f"{out}/extracted").collect()}
    assert got_urls == {r["url"] for r in rows2}


def test_incremental_index_loss_recovery(spark, tmp_path):
    """If the url index is lost (crash before the pointer commit, manual
    deletion), the next refresh must fall back to full extraction AND purge
    urls that are no longer in any snapshot — they must not become
    permanent phantom rows just because the diff state vanished."""
    import shutil

    out = str(tmp_path / "out4")
    rows1 = make_pages(80)
    p1 = str(tmp_path / "s1.parquet")
    _write_rows(p1, rows1)
    refresh_extract(spark, spark.read.parquet(p1), out, n_parts=N_PARTS)

    shutil.rmtree(f"{out}/url_index")  # simulate index loss

    rows2 = rows1[20:]  # 20 urls disappear from the snapshot
    p2 = str(tmp_path / "s2.parquet")
    _write_rows(p2, rows2)
    snap2 = spark.read.parquet(p2)
    stats = refresh_extract(spark, snap2, out, n_parts=N_PARTS)

    assert stats["n_new_or_changed"] == len(rows2)  # full re-extract
    got_urls = {r["url"] for r in spark.read.parquet(f"{out}/extracted").collect()}
    assert got_urls == {r["url"] for r in rows2}  # phantoms purged
    # and the index is back: the next refresh is incremental again
    stats2 = refresh_extract(spark, snap2, out, n_parts=N_PARTS)
    assert stats2["n_new_or_changed"] == 0


def test_incremental_noop_refresh(spark, snapshots, tmp_path):
    d, _, _ = snapshots
    out = str(tmp_path / "out2")
    snap1 = spark.read.parquet(str(d / "snap1.parquet"))
    refresh_extract(spark, snap1, out, n_parts=N_PARTS)
    stats = refresh_extract(spark, snap1, out, n_parts=N_PARTS)
    # identical snapshot → nothing extracted, nothing rewritten
    assert stats["n_new_or_changed"] == 0
    assert stats["n_deleted"] == 0
    assert stats["n_parts_rewritten"] == 0
    assert _refreshed(spark, out) == _full_reference(spark, snap1)


def test_refresh_rejects_layout_change(spark, snapshots, tmp_path):
    """A refresh with different n_parts/n_salts than the committed index
    must fail loudly — a silent mix of layouts strands stale rows in
    partitions the diff never visits (permanent duplicate urls)."""
    d, _, _ = snapshots
    out = str(tmp_path / "out")
    snap1 = spark.read.parquet(str(d / "snap1.parquet"))
    refresh_extract(spark, snap1, out, n_parts=N_PARTS)
    with pytest.raises(ValueError, match="layout mismatch"):
        refresh_extract(spark, snap1, out, n_parts=N_PARTS * 2)
    with pytest.raises(ValueError, match="layout mismatch"):
        refresh_extract(spark, snap1, out, n_parts=N_PARTS, n_salts=3)
    # same layout still fine (no-op refresh)
    stats = refresh_extract(spark, snap1, out, n_parts=N_PARTS)
    assert stats["n_new_or_changed"] == 0


def test_refresh_rejects_legacy_index_pointer(spark, snapshots, tmp_path):
    """A pointer file without layout metadata (older writer) cannot be
    validated — refuse to refresh over it instead of guessing."""
    import os

    d, _, _ = snapshots
    out = str(tmp_path / "out")
    snap1 = spark.read.parquet(str(d / "snap1.parquet"))
    refresh_extract(spark, snap1, out, n_parts=N_PARTS)
    ptr = os.path.join(out, "url_index", "INDEX_CURRENT")
    with open(ptr) as f:
        version = f.read().splitlines()[0]
    with open(ptr, "w") as f:
        f.write(version)  # strip the metadata lines, as an old writer would
    with pytest.raises(ValueError, match="no layout metadata"):
        refresh_extract(spark, snap1, out, n_parts=N_PARTS)


def test_compaction_reduces_files_preserves_rows(spark, snapshots, tmp_path):
    """Compaction merges fragmented partition files, preserves every row
    byte-for-byte, is idempotent, and leaves the refresh/resume machinery
    consistent (a follow-up no-op refresh still sees zero changes)."""
    from greenocr_spark.plans.compact import _partition_files, compact_extracted

    d, _, _ = snapshots
    out = str(tmp_path / "out")
    snap1 = spark.read.parquet(str(d / "snap1.parquet"))
    refresh_extract(spark, snap1, out, n_parts=N_PARTS)

    # fragment the table: rewrite with many tasks per hive partition
    ext = f"{out}/extracted"
    frag = spark.read.parquet(ext).repartition(24)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    frag.write.mode("overwrite").partitionBy("part_id").parquet(ext)
    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(ext).drop("part_id").collect()
    )
    files0 = sum(len(f) for f in _partition_files(ext).values())
    assert files0 > N_PARTS  # genuinely fragmented

    stats = compact_extracted(spark, out, min_files=2)
    assert stats["n_parts_compacted"] > 0
    assert stats["files_after"] < files0
    after = _partition_files(ext)
    assert all(len(f) == 1 for f in after.values())  # small partitions: 1 file
    after_rows = sorted(
        tuple(r) for r in spark.read.parquet(ext).drop("part_id").collect()
    )
    assert after_rows == before_rows

    # idempotent second run
    stats2 = compact_extracted(spark, out, min_files=2)
    assert stats2["n_parts_compacted"] == 0
    # partitions made of files already at/above target size are never
    # picked, however many there are (the large-partition idempotence rule)
    stats_big = compact_extracted(spark, out, target_bytes=1, min_files=1)
    assert stats_big["n_parts_compacted"] == 0
    # refresh still consistent (index untouched by compaction)
    stats3 = refresh_extract(spark, snap1, out, n_parts=N_PARTS)
    assert stats3["n_new_or_changed"] == 0
