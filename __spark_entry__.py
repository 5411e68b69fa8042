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
# per round.  Round-4 window (VERDICT r03 tasks 1, 2, 4, 5, 7), in
# evidence-need order: (1) every entry whose CODE changed this round (shuf1/
# chk2 block sizing, a12's new oracle, single-scan dec1, degree-ordered gr1)
# plus the flagship byte-identity re-confirm, (2) the 23 entries whose newest
# driver evidence is r01 (VERDICT r03 "What's missing" 1), then (3) the
# oldest r02 entries, in their r02 order, as far as the window reaches.  The
# ~24 r02 entries past the cutoff (all green r02 AND re-checked by the local
# sf0.001+sf0.01 oracle gates every session) rotate in round 5.
_ROUND4_PRIORITY = [
    # (1) code changed this round + flagship re-confirm
    "shuf1_train_order",
    "chk2_pack_offsets",
    "a12_approx_distinct",
    "dec1_decontaminate",
    "gr1_doc_triangles",
    "dd7_lsh_neardup",
    "ex4_corpus_hash",
    "ex1_extract_wrapped",
    # round-4 additions (first driver evidence)
    "voc1_vocab_topk",
    "km1_kmeans_estep",
    "ex7_outlink_hash",
    "lnk1_host_graph",
    "ex8_meta_hash",
    "st10_stream_link_hash",
    "ann5_truncated_refine",
    "samp3_stratum_topk",
    # (2) r01-stale entries
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
    # (3) oldest r02 entries, as far as the 50-entry window reaches
    "s1_scan_project",
    "p1_null_filter",
    "p6_regex_strip",
    "p7_clamp_math",
    "f12_ctc_width_law",
    "p3_feasibility_filter",
    "a8_minmax_normalize",
    "w2_argmax_per_group",
    "j3_dict_decode_join",
    "j1_broadcast_join_agg",
    "j2_brand_quantity",
    "j5_semi_join",
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
    # rows-only binary surfaces (no SQL oracle by design; byte-identity is
    # separately driver-proven by ex4/ex5/st8)
    "ex2_extract_fixture_pages",
    "ex3_extract_pdf_branch",
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    reg = _registry()
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _ROUND4_PRIORITY:
        if name in reg:
            ordered[name] = reg[name][0]
    for name, (fn, _) in reg.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries get the driver's rows-only check."""
    return {name: sql for name, (_, sql) in _registry().items() if sql is not None}
