"""Composed pipeline job (plans/pipeline.py): extract → curate → export
chained over one corpus — handoff correctness, cross-stage resume no-op,
determinism, and crash-at-a-stage-boundary recovery (VERDICT r04 task 3)."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import pytest

from pyspark.sql import functions as F

from greenocr_spark.fixtures import write_pages_parquet
from greenocr_spark.plans.pipeline import (
    curate_dir,
    curation_input,
    export_dir,
    extract_dir,
    run_pipeline_job,
)

N_PAGES = 400

PIPE_KW = dict(
    n_parts=8,
    n_salts=2,
    seq_len=16,
    rows_per_shard=300,
    seed=7,
    min_tokens=3,
)


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pipe_pages") / "pages.parquet")
    write_pages_parquet(p, N_PAGES)
    return p


def _shard_layout_hash(spark, out: str) -> str:
    rows = (
        spark.read.parquet(os.path.join(export_dir(out), "shards"))
        .select("pos", "doc_id", "chunk_idx", "shard_id")
        .orderBy("pos")
        .collect()
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(f"{r['pos']}|{r['doc_id']}|{r['chunk_idx']}|{r['shard_id']}\n".encode())
    return h.hexdigest()


def test_pipeline_end_to_end(spark, pages_path, tmp_path):
    out = str(tmp_path / "pipe")
    pages = spark.read.parquet(pages_path)
    stats = run_pipeline_job(spark, pages, out, **PIPE_KW)

    # extract stage: every page extracted and committed
    assert stats["extracted_rows"] == N_PAGES
    extracted = spark.read.parquet(os.path.join(extract_dir(out), "extracted"))
    assert extracted.count() == N_PAGES

    # handoff 1: curation input is a pure projection of the extracted table
    ci = curation_input(extracted)
    assert set(ci.columns) == {"doc_id", "text", "lang", "source"}
    assert ci.filter(F.col("source").isNull()).count() == 0

    # curate stage: funnel is ordered, monotone non-increasing, and its tail
    # equals the curated row count
    funnel = stats["funnel"]
    assert [f["stage"] for f in funnel] == ["quality", "exact", "neardup", "resample"]
    for f in funnel:
        assert f["rows_out"] <= f["rows_in"]
    assert funnel[-1]["rows_out"] == stats["curated_rows"] > 0
    curated = spark.read.parquet(os.path.join(curate_dir(out), "curated"))
    assert curated.count() == stats["curated_rows"]
    # curated docs are a subset of the extracted corpus (doc_id == url)
    assert (
        curated.join(
            extracted.select(F.col("url").alias("doc_id")), "doc_id", "left_anti"
        ).count()
        == 0
    )

    # export stage: chunks reassemble exactly to the curated corpus order
    assert stats["export"]["resumed"] is False
    shards = spark.read.parquet(os.path.join(export_dir(out), "shards"))
    assert shards.count() == stats["export"]["n_chunks"]
    rebuilt = shards.groupBy("doc_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))).transform(
                lambda s: s["chunk_text"]
            ),
            " ",
        ).alias("rebuilt")
    )
    canon = curated.select(
        "doc_id",
        F.array_join(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != ""), " "
        ).alias("canon"),
    )
    mism = (
        rebuilt.join(canon, "doc_id")
        .filter(F.col("rebuilt") != F.col("canon"))
        .count()
    )
    assert mism == 0


def test_pipeline_resume_noop_across_stage_boundaries(spark, pages_path, tmp_path):
    out = str(tmp_path / "pipe_resume")
    pages = spark.read.parquet(pages_path)
    s1 = run_pipeline_job(spark, pages, out, **PIPE_KW)
    h1 = _shard_layout_hash(spark, out)
    n_extract_manifest = spark.read.parquet(
        os.path.join(extract_dir(out), "manifest")
    ).count()
    n_funnel = len(s1["funnel"])

    s2 = run_pipeline_job(spark, pages, out, **PIPE_KW)
    # every stage no-ops: extract manifest unchanged, no new funnel rows,
    # export reports resumed, shard layout byte-identical
    assert s2["export"]["resumed"] is True
    assert s2["extracted_rows"] == s1["extracted_rows"]
    assert s2["curated_rows"] == s1["curated_rows"]
    assert len(s2["funnel"]) == n_funnel
    assert (
        spark.read.parquet(os.path.join(extract_dir(out), "manifest")).count()
        == n_extract_manifest
    )
    assert _shard_layout_hash(spark, out) == h1


def test_pipeline_deterministic_across_out_dirs(spark, pages_path, tmp_path):
    pages = spark.read.parquet(pages_path)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sa = run_pipeline_job(spark, pages, a, **PIPE_KW)
    sb = run_pipeline_job(spark, pages, b, **PIPE_KW)
    assert sa["curated_rows"] == sb["curated_rows"]
    assert _shard_layout_hash(spark, a) == _shard_layout_hash(spark, b)


def test_pipeline_recovers_from_stage_boundary_crash(spark, pages_path, tmp_path):
    """Simulate a crash between curate and export: the curated table's
    _SUCCESS is gone and export never ran. A resume must rebuild only the
    curated table (survivor sets stay committed) and land on the identical
    shard layout."""
    out = str(tmp_path / "pipe_crash")
    pages = spark.read.parquet(pages_path)
    run_pipeline_job(spark, pages, out, **PIPE_KW)
    h1 = _shard_layout_hash(spark, out)

    # forge the crash: curated table unfinished, export wiped entirely
    os.remove(os.path.join(curate_dir(out), "curated", "_SUCCESS"))
    shutil.rmtree(export_dir(out))
    n_stage_files = len(glob.glob(os.path.join(curate_dir(out), "stages", "*")))

    s = run_pipeline_job(spark, pages, out, **PIPE_KW)
    assert s["export"]["resumed"] is False  # export genuinely recomputed
    assert _shard_layout_hash(spark, out) == h1
    # survivor-set checkpoints were reused, not recomputed
    assert len(glob.glob(os.path.join(curate_dir(out), "stages", "*"))) == n_stage_files
    assert len(s["funnel"]) == 4  # no duplicate funnel rows appended
