"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship extraction over sf0.001 documents wrapped as
                 Common-Crawl-style pages (SURVEY.md §7.1 slice).
queries()      — the SURVEY.md §2 operator battery + training-data-pipeline
                 operators (dedup / similarity / text analysis / multimodal)
                 + flagship extraction queries.
oracle_sql()   — matching DuckDB ANSI SQL for every SQL-expressible entry.

Implementation lives in greenocr_spark.battery / battery_ml (registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make greenocr_spark importable regardless of the driver's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _registry() -> dict:
    import greenocr_spark.battery as b
    import greenocr_spark.battery_ml  # noqa: F401  (registers into b.REGISTRY)

    return b.REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    fn, _ = reg["ex1_extract_wrapped"]
    return fn(spark, "/root/testdata/sf0.001")


# The driver's correctness pass checks roughly the first 50 queries() entries
# per round.  Round 1 checked registry order [0..49]; this priority list leads
# with the entries that had no driver row in CORRECTNESS_r01.json so round 2
# converts their pytest-only evidence into driver evidence (VERDICT.md item 1).
_ROUND2_PRIORITY = [
    "ex1_extract_wrapped",
    "ex2_extract_fixture_pages",
    "ex3_extract_pdf_branch",
    "dd4_word_jaccard_pairs",
    "dd5_simhash",
    "dd6_embedding_neardup",
    "dd7_lsh_neardup",
    "dd8_dup_clusters",
    "dd9_editdist_verify",
    "ann1_cosine_topk",
    "ann2_lsh_buckets",
    "ann3_ivf_topk",
    "tx1_token_count",
    "tx2_quality_score",
    "tx3_lang_id",
    "tx4_fingerprint",
    "tx5_rolling_hash",
    "tx6_punct_ratio",
    "pipe1_curation",
    "samp1_stratified_sample",
    "arr1_array_ops",
    "arr2_set_ops",
    "w9_sessionize",
    "w10_range_frame",
    "a14_cube",
    "f13_pad_tokens",
    "p9_rlike_filter",
    "ud8_grouped_zscore",
    "udtf1_token_positions",
    "mm1_binary_meta",
    "mm2_frame_sample",
    "st1_stream_hourly",
    "st2_stateful_per_user",
    "st3_stream_extract",
    "st4_stream_dedup",
    "st5_session_window",
    "st6_stream_static_join",
    "st7_stream_stream_join",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    reg = _registry()
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _ROUND2_PRIORITY:
        if name in reg:
            ordered[name] = reg[name][0]
    for name, (fn, _) in reg.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries get the driver's rows-only check."""
    return {name: sql for name, (_, sql) in _registry().items() if sql is not None}
