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
# per round.  Round-3 window (VERDICT r02 items 1-3), in evidence-need order:
# (1) the 4 rows red in r02 (now fixed: w9 oracle CAST, arr2/f13/mm2 array
# serialization), (2) every round-3 addition needing FIRST driver evidence
# (ex4/ex5/st8 byte-identity, pipe2, tx7-tx9, w11, pg1, url2/url3, dec1,
# scrub1, mix1, ng1, chk1/chk2, samp2) plus the flagship re-confirm, then
# (3) the entries whose newest driver evidence is r01.  With ~24 entries in
# (1)+(2), roughly the first 26 of block (3) fit the window; the remainder
# (all r01-green AND covered by the local sf0.001+sf0.01 oracle gates every
# session) roll to the next round's rotation.
_ROUND3_PRIORITY = [
    # fixed-red + new + flagship re-confirm
    "w9_sessionize",
    "arr2_set_ops",
    "f13_pad_tokens",
    "mm2_frame_sample",
    "ex4_corpus_hash",
    "ex1_extract_wrapped",
    # new round-3 operators (first driver evidence)
    "ex5_warc_corpus_hash",
    "ex6_host_report",
    "st8_stream_warc_hash",
    "pipe2_neardup_removal",
    "tx8_bigram_lm_score",
    "tx7_repetition_ratio",
    "w11_islands",
    "pg1_paragraph_dedup",
    "url2_canonicalize",
    "dec1_decontaminate",
    "scrub1_pii_redact",
    "mix1_source_mix_weights",
    "ng1_dup_spans",
    "chk1_token_chunks",
    "chk2_pack_offsets",
    "samp2_mixture_resample",
    "tx9_rare_terms",
    "url3_blocklist_filter",
    "hh1_hot_hosts",
    "quant1_int8_topk",
    "shuf1_train_order",
    "cdc1_snapshot_diff",
    "idx1_inverted_index",
    "tok1_pretokenize",
    "st9_stream_dedup",
    "ann4_ivf_sq8",
    "pr1_host_rank",
    "gr1_doc_triangles",
    "z1_zorder_key",
    # r01-only entries, stale by one round
    "j6_anti_join",
    "j7_range_join",
    "j8_asof_join",
    "j9_shipping_priority",
    "j10_local_supplier_volume",
    "a1_pricing_summary",
    "a5_argmin_per_group",
    "a6_weighted_avg",
    "a7_percentile",
    "a2_distinct_chars",
    "a3_minmax",
    "a11_rollup",
    "a13_count_distinct",
    "a12_approx_distinct",
    "a15_pivot",
    "a16_unpivot",
    "w1_ctc_collapse",
    "w7_topk_per_group",
    "w3_moving_avg",
    "w5_second_diff",
    "w4_contrast_rescore",
    "ts1_resample_ffill",
    "w8_first_last",
    "o1_topk_orders",
    "u1_union_tagged",
    "u2_intersect",
    "u3_except",
    "f25_histogram",
    "f24_scalar_subquery",
    "a18_stats_suite",
    "f1_canon_ws",
    "f2_string_suite",
    "f18_date_trunc",
    "f19_json_extract",
    "f20_url_host",
    "dd1_dedup_exact",
    "dd2_minhash_signature",
    "dd3_minhash_band_pairs",
    # rows-only binary/sketch surfaces (no SQL oracle by design)
    "ex2_extract_fixture_pages",
    "ex3_extract_pdf_branch",
    "st3_stream_extract",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    reg = _registry()
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _ROUND3_PRIORITY:
        if name in reg:
            ordered[name] = reg[name][0]
    for name, (fn, _) in reg.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries get the driver's rows-only check."""
    return {name: sql for name, (_, sql) in _registry().items() if sql is not None}
