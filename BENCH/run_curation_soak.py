#!/usr/bin/env python
"""Curation-chain volume soak: the full near-dup removal chain (MinHash
signatures -> LSH banded pairs -> distributed connected components ->
survivor anti-join) plus the heaviest round-3 text operators (cross-doc
span dedup, decontamination) on millions of SYNTHETIC documents with
PLANTED near-duplicates, at local[N].

Complements run_soak.py (extraction job volume): this one proves the
curation operators' shapes — bucketed self-join, iterative CC,
broadcast survivor anti-join, exchange-reusing span counts — hold at
volume, and measures planted-pair RECALL (LSH theory predicts ~0.98 at
the planted similarity), so the soak is a correctness check too, not
just a stopwatch.

Every 10th doc pair (doc_id = 10g+1, 10g+7) shares a generator seed;
the second member has ONE of its 30 words replaced by a unique token
(word-3-shingle Jaccard ~ 0.78, above the b=4/r=2 S-curve threshold
~0.5, below exact-dup). All other docs are seed-unique word soup.

Usage: python BENCH/run_curation_soak.py [--docs 2000000] [--cpus 32]
Prints one JSON line; appends ONE table to BENCH/BASELINE.md
(run_scaling.py REWRITES that file — always run scaling first).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_VOCAB = (
    "the cat sat mat dog run fast slow big small table scan join merge sort "
    "key value row column batch stream filter group query data part order "
    "line spark hash window agg customer vector page host text span "
    "word count token score rank tier node edge graph path tree leaf root "
    "list map set bag heap queue stack ring disk core wire lane fuse"
).split()  # 64 distinct words
assert len(_VOCAB) == 64 and len(set(_VOCAB)) == 64


def synth_documents(spark, n_docs: int, out_dir: str, n_words: int = 30):
    """Deterministic word-soup docs with planted near-dup pairs, generated
    entirely JVM-side (no per-row Python) and written as documents.parquet
    so the registry operators read it like any other sf_dir."""
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # shared seed for planted pairs (doc_id%10 in {1,7}), unique otherwise;
    # parity separates the two seed families so they can never collide
    seed = (
        F.when(
            F.col("doc_id") % 10 == 1, (F.col("doc_id") / 10).cast("long") * 2
        )
        .when(F.col("doc_id") % 10 == 7, (F.col("doc_id") / 10).cast("long") * 2)
        .otherwise(F.col("doc_id") * 2 + 1)
    )
    d = d.select("doc_id", seed.alias("seed"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(n_words)),
        lambda i: F.element_at(
            vocab, F.pmod(F.hash(F.col("seed"), i), F.lit(64)) + 1
        ),
    )
    # the second pair member mutates ONE deterministic position to a
    # doc-unique token
    mut_pos = F.pmod(F.hash(F.col("seed")), F.lit(n_words)) + 1
    words = F.when(
        F.col("doc_id") % 10 == 7,
        F.transform(
            words,
            lambda x, i: F.when(
                i + 1 == mut_pos, F.concat(F.lit("mut"), F.col("doc_id"))
            ).otherwise(x),
        ),
    ).otherwise(words)
    d = d.select(
        "doc_id",
        F.array_join(words, " ").alias("text"),
        F.lit("en").alias("lang"),
        (F.concat(F.lit("src"), (F.col("doc_id") % 8).cast("string"))).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))
    d.repartition(128).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _run_job_mode(spark, args, sf_dir: str, t_synth: float) -> None:
    """Run the COMPOSED plans/curate.py job (stage persistence, funnel
    manifest) on the synthetic corpus, then a resume no-op — the job-level
    counterpart of the per-operator chain timings."""
    from greenocr_spark.plans.curate import read_curate_manifest, run_curate_job

    out = os.path.join(sf_dir, "curate_out")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(min_tokens=5, max_dup_bigram_frac=0.9, neardup=True, resample=True)

    t0 = time.perf_counter()
    curated = run_curate_job(spark, docs, out, **kw)
    job_wall = time.perf_counter() - t0
    curated_rows = curated.count()

    t0 = time.perf_counter()
    run_curate_job(spark, docs, out, **kw)  # all stages committed -> reuse
    resume_wall = time.perf_counter() - t0

    funnel = [
        (r["stage"], r["rows_in"], r["rows_out"])
        for r in read_curate_manifest(spark, out).orderBy("idx").collect()
    ]
    rec = {
        "metric": "curation-job soak",
        "n_docs": args.docs,
        "cpus": args.cpus,
        "synth_s": round(t_synth, 1),
        "job_wall_s": round(job_wall, 1),
        "resume_noop_s": round(resume_wall, 1),
        "curated_rows": curated_rows,
        "docs_per_sec": round(args.docs / max(job_wall, 1e-6), 1),
        "funnel": funnel,
    }
    print(json.dumps(rec))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(md):
        fw = " → ".join(f"{s} {o:,}" for s, _, o in funnel)
        with open(md, "a") as f:
            f.write(f"""
## Curation-JOB soak (composed plans/curate.py at volume)

`python BENCH/run_curation_soak.py --mode job` — the stage-checkpointed
curation job (quality → exact dedup → near-dup removal → mixture resample)
over the same {args.docs:,}-doc planted corpus at local[{args.cpus}]:

| docs | job wall | docs/s | resume no-op | funnel (rows out per stage) |
|---|---|---|---|---|
| {args.docs:,} | {rec['job_wall_s']}s | {rec['docs_per_sec']:,} | {rec['resume_noop_s']}s | {fw} |

The resume no-op re-invokes the job with every stage already committed:
its cost is reading back the tiny survivor-id sets plus rewriting the
final curated table — no stage recomputes, which is the stage-level
checkpoint model doing its job (see plans/curate.py docstring).
""")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--mode",
        choices=("chain", "job"),
        default="chain",
        help="chain: time each registry operator standalone (recomputes "
        "upstream); job: run the composed plans/curate.py job with stage "
        "persistence, then a resume no-op",
    )
    args = ap.parse_args()

    from greenocr_spark.session import build_session

    spark = build_session(
        app_name="curation-soak",
        master=f"local[{args.cpus}]",
        shuffle_partitions=4 * args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import greenocr_spark.battery as b
    import greenocr_spark.battery_ml as ml  # noqa: F401

    sf_dir = tempfile.mkdtemp(prefix="curation_soak_")
    try:
        t0 = time.perf_counter()
        synth_documents(spark, args.docs, sf_dir)
        t_synth = time.perf_counter() - t0

        timings: dict[str, float] = {}
        counts: dict[str, int] = {}

        reg = b.REGISTRY

        if args.mode == "job":
            _run_job_mode(spark, args, sf_dir, t_synth)
            return

        def stage(name, qname, count=False):
            # time CONSTRUCTION + execution: dd8/pipe2 run their iterative
            # connected-components rounds eagerly (localCheckpoint) while
            # the DataFrame is being built, so the fn call must sit inside
            # the timer, not be evaluated as an argument before it
            t0 = time.perf_counter()
            df = reg[qname][0](spark, sf_dir)
            if count:
                counts[name] = df.count()
            else:
                _noop(df)
            timings[name] = time.perf_counter() - t0
            return df

        # each stage recomputes its upstream (the registry fns compose by
        # recomputation) — walls are INCLUSIVE of upstream, by design
        stage("tx2_quality", "tx2_quality_score")
        stage("dd2_signatures", "dd2_minhash_signature")
        stage("dd3_lsh_pairs", "dd3_minhash_band_pairs", count=True)
        clusters = stage("dd8_clusters", "dd8_dup_clusters", count=True)
        stage("pipe2_survivors", "pipe2_neardup_removal", count=True)
        stage("ng1_dup_spans", "ng1_dup_spans")
        stage("dec1_decontaminate", "dec1_decontaminate")

        # planted-pair recall: both members of a planted pair must share a
        # cluster. LSH theory at one-word-of-30 mutation: shingle Jaccard
        # ~0.78 -> per-band hit (r=2) ~0.61 -> >=1 of b=4 bands ~0.977.
        # `clusters` is reused from the dd8 stage (already materialized via
        # its localCheckpoint rounds) — the chain is not recomputed here.
        m1 = clusters.filter(F.col("doc_id") % 10 == 1).select(
            (F.col("doc_id") / 10).cast("long").alias("g"),
            F.col("cluster_id").alias("c1"),
        )
        m7 = clusters.filter(F.col("doc_id") % 10 == 7).select(
            (F.col("doc_id") / 10).cast("long").alias("g"),
            F.col("cluster_id").alias("c7"),
        )
        # complete pairs (10g+1, 10g+7) within doc_id < docs: g ranges over
        # 0..floor((docs-8)/10), not docs//10 (off by one when docs%10 >= 8)
        n_groups = (args.docs - 8) // 10 + 1 if args.docs >= 8 else 0
        n_found = m1.join(m7, "g").filter(F.col("c1") == F.col("c7")).count()
        recall = round(n_found / n_groups, 4) if n_groups else None

        total = round(sum(timings.values()), 1)
        rec = {
            "metric": "curation-chain soak",
            "n_docs": args.docs,
            "cpus": args.cpus,
            "synth_s": round(t_synth, 1),
            "stage_wall_s": {k: round(v, 1) for k, v in timings.items()},
            "lsh_pairs": counts["dd3_lsh_pairs"],
            "clusters_rows": counts["dd8_clusters"],
            "survivors": counts["pipe2_survivors"],
            "planted_pairs": n_groups,
            "planted_recall": recall,
            "pipe2_docs_per_sec": round(
                args.docs / max(timings["pipe2_survivors"], 1e-6), 1
            ),
            "total_wall_s": total,
        }
        print(json.dumps(rec))

        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        if os.path.exists(md):
            tw = " · ".join(f"{k} {v:.1f}s" for k, v in timings.items())
            with open(md, "a") as f:
                f.write(f"""
## Curation-chain soak (near-dup removal + span/decontamination ops at volume)

`python BENCH/run_curation_soak.py` — {args.docs:,} synthetic docs (30-word
soup, 64-word vocab), every 10th doc pair a PLANTED near-dup (one word of 30
mutated, shingle Jaccard ~0.78), at local[{args.cpus}]:

| docs | stage walls (inclusive of upstream recompute) | LSH pairs | survivors | planted recall | pipe2 docs/s |
|---|---|---|---|---|---|
| {args.docs:,} | {tw} | {counts['dd3_lsh_pairs']:,} | {counts['pipe2_survivors']:,} | **{recall}** (theory ~0.977) | {rec['pipe2_docs_per_sec']:,} |

Planted recall is the fraction of planted pairs landing in one cluster —
the b=4/r=2 S-curve predicts ~0.977 at this similarity, so a materially
lower number would flag a broken chain, not just a slow one. Survivor
count ≈ docs − planted pairs found − LSH false-positive collateral. The
chain is the exact shape argued in SURVEY §10: bucketed band self-join
(never all-pairs), O(log d) pointer-jumping rounds, broadcast survivor
anti-join; span/decontamination ops are one exchange-reusing
count-join and one broadcast join + partial-distinct groupBy.
""")
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
