"""Training-data-pipeline operator battery: deduplication, similarity
search, text analysis, multimodal plumbing, and the flagship extraction
queries (task brief: first-class components beyond the reference's ops).

Same registry contract as greenocr_spark.battery. All hash arithmetic is
md5-based (identical in Spark and DuckDB) so even MinHash/SimHash have
exact SQL oracles; float paths are cast to double *before* arithmetic so
both engines run the same IEEE ops in the same order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greenocr_spark.battery import _dec, q, t, table_rowcount

# ---- shared hash/shingle expression builders (Spark SQL + DuckDB SQL) -----

P_MOD = 2147483647  # 2^31-1
# 8 permutations → 4 bands × 2 rows (b=4, r=2): the S-curve threshold
# (1/b)^(1/r) ≈ 0.5 Jaccard — a realistic near-dup operating point
MINHASH_AB = [
    (2971, 1013), (4111, 2707), (5737, 331), (7001, 977),
    (8191, 57), (9973, 1409), (11003, 2113), (12577, 761),
]


def _spark_words(col="text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def _duck_words(col="text"):
    return f"regexp_split_to_array(trim({col}), '\\s+')"


def _bigram_array(ws):
    """Word-bigram array ("w1 w2") from a words-array expression, with each
    side of the zip evaluated ONCE per row.

    Never build bigrams as transform(slice(ws,...), lambda x, i:
    concat_ws(' ', x, element_at(ws, i+2))): higher-order-function lambdas
    are interpreted (no whole-stage codegen, no common-subexpression
    elimination), so an `ws` expression embedded in the lambda body — e.g.
    the split() behind it — re-evaluates per ELEMENT, turning the bigram
    build into O(tokens²) string work per document.  On multi-thousand-token
    documents that is a throughput cliff (measured ~50x on the pipeline
    quality gate).  zip_with evaluates each input array expression once and
    only iterates element-wise."""
    n = F.greatest(F.size(ws) - 1, F.lit(0))
    return F.zip_with(
        F.slice(ws, 1, n), F.slice(ws, 2, n), lambda a, b: F.concat_ws(" ", a, b)
    )


def _spark_gram3_hashes(ws_col="ws"):
    """md5 hashes of word 3-gram windows over an ALREADY-MATERIALIZED word
    array column (select _spark_words() into a column first — referencing
    the split expression inside the lambda would re-tokenize the text for
    every window)."""
    ws = F.col(ws_col)
    return F.transform(
        F.sequence(F.lit(1), F.size(ws) - 2),
        lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i, 3))),
    )


# ---- distributed prefix-sum block sizing (chk2 / shuf1 scale knobs) ------

# Ceiling on rows any single in-block window task must sort: ~1M rows of
# (key, long) state per task is tens of MB — comfortably in-executor.
PREFIX_SUM_MAX_BLOCK_ROWS = 1 << 20

# Preferred block count while block rows stay under the ceiling: enough
# parallelism for thousands of cores, and a block table that is trivially
# window-able/broadcast-able.
PREFIX_SUM_TARGET_BLOCKS = 4096

# Broadcast the block-offsets table back onto the corpus only while it is
# dim-table sized (4M rows ≈ ~100 MB of (key, long)); beyond that the join
# is left unhinted and AQE picks broadcast vs shuffle from measured size.
PREFIX_SUM_MAX_BROADCAST_BLOCKS = 1 << 22


def _prefix_sum_target_rows(n_rows: int) -> int:
    """Target rows per block: n/4096 (≈4096 blocks — parallelism first),
    floored at 256 so tiny corpora keep non-trivial blocks and capped at
    ~1M so no single task ever sorts more than that — past the cap the
    BLOCK COUNT grows instead (10^12 rows → 10^6 blocks × ~1M rows).
    Two-level validity bound: the block table itself must stay window-able
    in one task (~10^7 rows ≈ 10^13-10^14 corpus rows); beyond that the
    same two-phase shape recurses one more level — out of scope for the
    10^12-doc target."""
    return min(
        PREFIX_SUM_MAX_BLOCK_ROWS,
        max(256, n_rows // PREFIX_SUM_TARGET_BLOCKS),
    )


def prefix_sum_hex_len(n_rows: int) -> int:
    """Hex-prefix length k (→ 16^k blocks) for a hash-keyed two-phase
    prefix sum: the smallest k with expected block rows n/16^k within the
    target. Grows with corpus size — 5×10^3 rows → k=2, 10^9 → k=4,
    10^12 → k=5 (1M blocks × ~1M rows) — so neither the per-block sort
    nor the block table is ever corpus-proportional. (The fixed k=2 of
    r03 funneled 4×10^9 rows through one task at the 10^12-doc target and
    capped parallelism at 256 — VERDICT r03 'What's wrong' #1.)"""
    target = _prefix_sum_target_rows(n_rows)
    k = 1
    while k < 8 and n_rows > target * (16**k):
        k += 1
    return k


def prefix_sum_block_size(n_rows: int) -> int:
    """Docs-per-block for an id-range-keyed two-phase prefix sum: same
    sizing law as the hex form — ~4096 blocks until the ~1M block-row cap,
    then block count grows with the corpus. 10^12 docs → 10^6-doc blocks
    and a 10^6-row block table. (The fixed 1000-doc blocks of r03 made
    the block table corpus/1000 rows: a 10^9-row broadcast through an
    unpartitioned window at target scale — VERDICT r03 'What's wrong'
    #2.)"""
    return _prefix_sum_target_rows(n_rows)


def _maybe_broadcast(df: DataFrame, n_blocks: int) -> DataFrame:
    return F.broadcast(df) if n_blocks <= PREFIX_SUM_MAX_BROADCAST_BLOCKS else df


# A single-task window over the block table is fine while the table is at
# most this many rows (~4M rows of (long, long) ≈ 100 MB); past it the
# offsets computation recurses into super-blocks.
PREFIX_SUM_MAX_WINDOW_ROWS = 1 << 22

# Super-block fanout for the recursion: each level shrinks the table by
# this factor, so even 10^15-row corpora terminate in 2 levels.
PREFIX_SUM_FANOUT = 4096


def _exclusive_offsets(
    tot: DataFrame,
    key: str,
    val: str,
    n_rows_est: float,
    out: str = "off",
    _depth: int = 0,
) -> DataFrame:
    """(key, off) where off = sum of `val` over all rows with smaller
    `key` — the exclusive prefix sum of a NUMERIC-keyed totals table.

    While the table fits one window task, this is a plain unpartitioned
    running sum (bounded: ≤ PREFIX_SUM_MAX_WINDOW_ROWS rows). Beyond
    that it recurses: key // FANOUT super-blocks get their own exclusive
    offsets (one level smaller by 4096×), each super-block's rows then
    rank locally in parallel — so no task at ANY level ever windows more
    than max(FANOUT-sized local runs, the top table) rows. Depth is
    log_4096(blocks): 2 levels cover 10^15-row corpora."""
    if n_rows_est <= PREFIX_SUM_MAX_WINDOW_ROWS:
        w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
        return tot.select(
            key, F.coalesce(F.sum(val).over(w), F.lit(0)).alias(out)
        )
    # depth-suffixed names: at depth d the key IS the previous level's
    # super-block column, so unsuffixed names would overwrite it
    sk, sv, so = f"_sblk{_depth}", f"_stot{_depth}", f"_soff{_depth}"
    s = tot.withColumn(sk, (F.col(key) / PREFIX_SUM_FANOUT).cast("long"))
    stot = s.groupBy(sk).agg(F.sum(val).alias(sv))
    soff = _exclusive_offsets(
        stot, sk, sv, n_rows_est / PREFIX_SUM_FANOUT, out=so, _depth=_depth + 1
    )
    w_loc = Window.partitionBy(sk).orderBy(key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        s.join(
            _maybe_broadcast(soff, int(n_rows_est / PREFIX_SUM_FANOUT) + 1),
            sk,
        )
        .select(
            key,
            (
                F.col(so) + F.coalesce(F.sum(val).over(w_loc), F.lit(0))
            ).alias(out),
        )
    )


# =========================================================================
# Deduplication
# =========================================================================


@q(
    "dd1_dedup_exact",
    """SELECT sig, count(*) AS n_dups, min(doc_id) AS keep_doc
       FROM (SELECT doc_id, md5(substring(text, 1, 20)) AS sig FROM documents)
       GROUP BY sig HAVING count(*) > 1""",
)
def dd1_dedup_exact(spark, sf_dir):
    # Exact dedup: hash-groupBy on a canonical signature; at 10^12 rows this
    # is one shuffle on the md5 key with map-side partial counts.
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.substring("text", 1, 20)).alias("sig"))
        .groupBy("sig")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_dups") > 1)
    )


def _minhash_signature(docs):
    """doc_id + minhash values over word-3-shingles (md5-int based), for
    any (doc_id, text) DataFrame — shared by the battery queries and the
    curation job (plans/curate.py)."""
    d = docs.select("doc_id", _spark_words().alias("w"))
    sh = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("w", i + 1),
                    F.element_at("w", i + 2),
                    F.element_at("w", i + 3),
                ),
            )
        ).alias("sh"),
    ).distinct()
    x = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long") % P_MOD
    sh = sh.select("doc_id", x.alias("x"))
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % P_MOD).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_signature_df(spark, sf_dir):
    return _minhash_signature(t(spark, sf_dir, "documents"))


_MINHASH_ORACLE_SIG = f"""
    WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
           FROM w, unnest(range(1, len(ws) - 1)) AS r(i)),
    xs AS (SELECT doc_id,
                  CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) % {P_MOD} AS x
           FROM sh)
    SELECT doc_id,
           {", ".join(f"min(({a} * x + {b}) % {P_MOD}) AS mh{i}" for i, (a, b) in enumerate(MINHASH_AB))}
    FROM xs GROUP BY doc_id
"""


@q("dd2_minhash_signature", _MINHASH_ORACLE_SIG)
def dd2_minhash_signature(spark, sf_dir):
    # MinHash: shingle → md5-int → k permutations → min. Exactly mirrored in
    # SQL because min over a deterministic set is order-independent.
    return _minhash_signature_df(spark, sf_dir)


_N_BANDS, _ROWS_PER_BAND = 4, 2


def _band_case_sql() -> str:
    whens = " ".join(
        f"WHEN {b} THEN md5(CAST(mh{b * _ROWS_PER_BAND} AS VARCHAR) || '-' || "
        f"CAST(mh{b * _ROWS_PER_BAND + 1} AS VARCHAR))"
        for b in range(_N_BANDS)
    )
    return f"CASE i {whens} END"


@q(
    "dd3_minhash_band_pairs",
    f"""WITH sig AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
        SELECT doc_id, i AS band, {_band_case_sql()} AS bkey
        FROM sig, unnest([{", ".join(str(b) for b in range(_N_BANDS))}]) AS u(i))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                             AND a.doc_id < b.doc_id""",
)
def dd3_minhash_band_pairs(spark, sf_dir):
    # LSH banding (b=4 bands, r=2 rows): band key = hash of the band's r
    # minhash values; candidate pairs = same composite key in any band.
    # S-curve threshold (1/b)^(1/r) ≈ 0.5 Jaccard. The scale path: the
    # self-join is per (band, bkey) bucket, never all-pairs.
    return _band_pairs(_minhash_signature_df(spark, sf_dir))


def _band_pairs(sig):
    """LSH banded candidate pairs from a minhash-signature DataFrame —
    shared by dd3 and the curation job (plans/curate.py)."""
    band_keys = [
        F.md5(
            F.concat_ws(
                "-",
                *[F.col(f"mh{b * _ROWS_PER_BAND + r}").cast("string") for r in range(_ROWS_PER_BAND)],
            )
        )
        for b in range(_N_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.posexplode(F.array(*band_keys))
    ).withColumnsRenamed({"pos": "band", "col": "bkey"})
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _connected_components(pairs, max_iter: int = 20):
    """Connected components over an undirected pair list (doc_a, doc_b) →
    (doc_id, cluster_id) with cluster_id = min member id.

    Hash-to-min with pointer jumping: each round a node takes the min label
    among itself and its neighbors, then follows its label's label (path
    halving), so convergence is O(log diameter) rounds — not O(diameter)
    like plain label propagation. Each round is two key-partitioned
    joins + one groupBy; no driver-side graph, so it runs at any scale.
    localCheckpoint truncates the lineage each round (an iterative plan
    otherwise grows a plan tree Catalyst re-analyzes every action)."""
    e = pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")).union(
        pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    )
    e = e.localCheckpoint(eager=True)
    # init: label(x) = min(x, min neighbor)
    lab = e.groupBy("s").agg(F.least(F.min("d"), F.col("s")).alias("lab")).select(
        F.col("s").alias("node"), "lab"
    )
    converged = False
    for _ in range(max_iter):
        # neighbor-min: for each edge (s,d), s sees label(d)
        nb = (
            e.join(lab.withColumnRenamed("node", "d"), "d")
            .groupBy("s")
            .agg(F.min("lab").alias("nlab"))
            .withColumnRenamed("s", "node")
        )
        stepped = (
            lab.join(nb, "node", "left")
            .select("node", F.least("lab", F.coalesce("nlab", "lab")).alias("lab"))
        )
        # pointer jump: label(x) := min(label(x), label(label(x)))
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(F.col("node").alias("lab"), F.col("lab").alias("ll")).alias("y"),
                "lab",
                "left",
            )
            .select("node", F.least("lab", F.coalesce("ll", "lab")).alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(lab.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        lab = jumped
        if changed == 0:
            converged = True
            break
    if not converged:
        # A silently-truncated result would hand back WRONG cluster ids with
        # no signal (ADVICE r02). Pointer jumping converges in O(log
        # diameter), so hitting this bound means the input graph (or
        # max_iter) is pathological — fail loudly instead.
        raise RuntimeError(
            f"connected components did not converge within {max_iter} "
            "pointer-jumping rounds; raise max_iter (graph diameter > "
            f"2^{max_iter}) or check the pair input for corruption"
        )
    return lab.select(F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id"))


@q(
    "dd8_dup_clusters",
    f"""WITH RECURSIVE
    sig AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
        SELECT doc_id, i AS band, {_band_case_sql()} AS bkey
        FROM sig, unnest([{", ".join(str(b) for b in range(_N_BANDS))}]) AS u(i)),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                                       AND a.doc_id < b.doc_id),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT s, d FROM edges
              UNION
              SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
    SELECT s AS doc_id, least(s, min(d)) AS cluster_id
    FROM reach GROUP BY s""",
)
def dd8_dup_clusters(spark, sf_dir):
    # Near-dup CLUSTERING: dd3's LSH candidate pairs → connected components
    # → (doc_id, cluster_id = min member). This is the step a real pipeline
    # runs after pair generation (keep cluster_id == doc_id, drop the rest).
    # Spark side is distributed hash-to-min + pointer jumping (O(log d)
    # rounds of key-partitioned joins); the oracle is exact transitive
    # closure via DuckDB's recursive CTE — different algorithm, same
    # fixpoint, which is the strongest kind of cross-check.
    return _connected_components(dd3_minhash_band_pairs(spark, sf_dir))


@q(
    "pipe2_neardup_removal",
    f"""WITH RECURSIVE
    sig AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
        SELECT doc_id, i AS band, {_band_case_sql()} AS bkey
        FROM sig, unnest([{", ".join(str(b) for b in range(_N_BANDS))}]) AS u(i)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                                      AND a.doc_id < b.doc_id),
    pairs AS (SELECT c.doc_a, c.doc_b
              FROM cand c
              JOIN documents da ON da.doc_id = c.doc_a
              JOIN documents db ON db.doc_id = c.doc_b
              WHERE levenshtein(substring(da.text, 1, 200),
                                substring(db.text, 1, 200)) <= 40),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT s, d FROM edges
              UNION
              SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
    cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id
           FROM reach GROUP BY s)
    SELECT d.doc_id FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
    WHERE cl.cluster_id IS NULL OR cl.cluster_id = d.doc_id""",
)
def pipe2_neardup_removal(spark, sf_dir):
    # The COMPOSED near-dup removal pipeline a curation run actually
    # executes: MinHash signatures → LSH banded candidate pairs (dd3) →
    # bounded-prefix edit-distance verification (dd9 — see _verified_pairs
    # for why clustering unverified candidates is wrong at scale) →
    # distributed connected components (dd8's kernel) → keep each
    # cluster's min doc_id plus every unclustered doc. The survivor set is
    # the corpus fed to training. The broadcast hint on the loser side is
    # valid while clustered docs ≪ corpus (this battery surface); on a
    # HIGH-duplication corpus the loser set is corpus-proportional, so the
    # production job (plans/curate.py) omits the hint and lets AQE choose
    # broadcast vs key-shuffle from the measured size at runtime.
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id")
        .join(F.broadcast(_neardup_losers(docs)), "doc_id", "left_anti")
    )


# Candidate verification bound (the dd9 shape): LSH candidates are checked
# with edit distance over a bounded text prefix before any doc is dropped.
# 200 chars / distance <= 40 separates cleanly: true near-dups differ by a
# few edits in the prefix (or not at all), random false-positive collisions
# differ by ~the whole prefix.
_NEARDUP_VERIFY_PREFIX = 200
_NEARDUP_MAX_EDITDIST = 40


def _verified_pairs(pairs, docs):
    """Drop LSH candidate pairs that fail the bounded-prefix edit-distance
    check (levenshtein over the first _NEARDUP_VERIFY_PREFIX chars >
    _NEARDUP_MAX_EDITDIST).

    Clustering UNVERIFIED candidates is wrong at scale: band-collision false
    positives arrive at a roughly corpus-quadratic rate, so past ~10^5 docs
    the candidate graph percolates into giant random components — measured
    on the 2M-page pipeline soak: 145k candidate pairs over 109k docs formed
    a 13,933-doc component, i.e. ~14k NON-duplicate docs would be dropped as
    "losers", and connected components needed 25 rounds to cross it.
    Verification breaks the random edges (a false pair's prefixes disagree
    almost everywhere), leaving tight true-dup clusters that converge in a
    few rounds. The joins ship only (doc_id, 200-char prefix); Spark's
    thresholded levenshtein early-exits above the bound."""
    pre = docs.select(
        "doc_id", F.substring("text", 1, _NEARDUP_VERIFY_PREFIX).alias("pre")
    )
    return (
        pairs.join(
            pre.select(F.col("doc_id").alias("doc_a"), F.col("pre").alias("pre_a")),
            "doc_a",
        )
        .join(
            pre.select(F.col("doc_id").alias("doc_b"), F.col("pre").alias("pre_b")),
            "doc_b",
        )
        .filter(
            F.levenshtein("pre_a", "pre_b", _NEARDUP_MAX_EDITDIST) != F.lit(-1)
        )
        .select("doc_a", "doc_b")
    )


def _neardup_losers(docs):
    """doc_ids to DROP under near-dup removal (every clustered doc except
    its cluster's min member) for any (doc_id, text) DataFrame — shared by
    pipe2 and the curation job (plans/curate.py). Composes all three dedup
    primitives: signatures (dd2) → banded candidates (dd3) → edit-distance
    verification (dd9) → connected components (dd8)."""
    sig = _minhash_signature(docs)
    pairs = _verified_pairs(_band_pairs(sig), docs)
    clusters = _connected_components(pairs)
    return clusters.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")


@q(
    "dd9_editdist_verify",
    f"""WITH sig AS ({_MINHASH_ORACLE_SIG}),
    bands AS (
        SELECT doc_id, i AS band, {_band_case_sql()} AS bkey
        FROM sig, unnest([{", ".join(str(b) for b in range(_N_BANDS))}]) AS u(i)),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                                       AND a.doc_id < b.doc_id)
    SELECT p.doc_a, p.doc_b,
           levenshtein(substring(da.text, 1, 200), substring(db.text, 1, 200))
               AS editdist
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b""",
)
def dd9_editdist_verify(spark, sf_dir):
    # Candidate VERIFICATION: LSH gives probabilistic candidates (dd3);
    # a real dedup pipeline verifies them with an exact similarity before
    # dropping documents. Edit distance over a bounded prefix (200 chars —
    # levenshtein is O(n²), the cap is what makes verification affordable;
    # near-dups disagree within the first 200 bytes or they're the same
    # page) joined back to the texts: two broadcast-able joins of the tiny
    # pair list against the corpus, cost ∝ candidates, never ∝ corpus².
    d = t(spark, sf_dir, "documents").select("doc_id", F.substring("text", 1, 200).alias("t"))
    pairs = dd3_minhash_band_pairs(spark, sf_dir)
    da, db = d.alias("da"), d.alias("db")
    return (
        pairs.join(da, F.col("da.doc_id") == F.col("doc_a"))
        .join(db, F.col("db.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("da.t"), F.col("db.t")).alias("editdist"),
        )
    )


_DD4_MAX_DF = 0.5  # drop tokens present in more than this fraction of docs


@q(
    "dd4_word_jaccard_pairs",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
    uw AS (SELECT DISTINCT doc_id, unnest(ws) AS word FROM w),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM uw),
    dft AS (SELECT word, count(*) AS df FROM uw GROUP BY word),
    okw AS (SELECT word FROM dft, nd WHERE df <= {_DD4_MAX_DF} * n),
    uwf AS (SELECT uw.doc_id, uw.word FROM uw JOIN okw USING (word)),
    cnt AS (SELECT doc_id, count(*) AS n FROM uwf GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
               FROM uwf a JOIN uwf b ON a.word = b.word AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(c / (ca.n + cb.n - c), 4) AS jaccard
    FROM common JOIN cnt ca ON ca.doc_id = doc_a
                JOIN cnt cb ON cb.doc_id = doc_b
    WHERE c / (ca.n + cb.n - c) >= 0.5""",
)
def dd4_word_jaccard_pairs(spark, sf_dir):
    # n-gram (n=1) Jaccard near-dup over the document-frequency-filtered
    # vocabulary: tokens present in more than _DD4_MAX_DF of all docs are
    # dropped BEFORE the token self-join (the CCNet/idf trick). That is what
    # makes this scale: the join key's max multiplicity is bounded by
    # max_df × n_docs, so a web-scale stopword ("the", df≈1) can never make
    # the self-join quadratic. Jaccard = |A∩B|/(|A|+|B|−|A∩B|) over the
    # surviving vocabulary, mirrored exactly in the oracle.
    uw = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_spark_words()).alias("word"))
        .distinct()
    )
    nd = uw.agg(F.countDistinct("doc_id").alias("nd"))
    ok = (
        uw.groupBy("word")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") <= _DD4_MAX_DF * F.col("nd"))
        .select("word")
    )
    uwf = uw.join(ok, "word").select("doc_id", "word")
    cnt = uwf.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = uwf.alias("a"), uwf.alias("b")
    common = (
        a.join(b, (F.col("a.word") == F.col("b.word")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    jac = F.col("c") / (F.col("ca.n") + F.col("cb.n") - F.col("c"))
    return (
        common.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(cb, F.col("cb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


_SIMHASH_BITS = 16


def _simhash_oracle() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(_SIMHASH_BITS)
    )
    recombine = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS))
    return f"""
    WITH uw AS (SELECT DISTINCT doc_id, unnest({_duck_words()}) AS word
                FROM documents),
    vs AS (SELECT doc_id,
                  CAST(('0x' || substring(md5(word), 1, 8)) AS BIGINT) AS v
           FROM uw),
    bits AS (SELECT doc_id, {bit_sums} FROM vs GROUP BY doc_id)
    SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM bits
    """


@q("dd5_simhash", _simhash_oracle())
def dd5_simhash(spark, sf_dir):
    # SimHash: per distinct token a 32-bit md5 value; each of 16 bits votes
    # ±1; the sign vector is the fingerprint. Near-dups differ in few bits.
    uw = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_spark_words()).alias("word"))
        .distinct()
    )
    v = F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
    vs = uw.select("doc_id", v.alias("v"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("v"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(_SIMHASH_BITS)
    ]
    bits = vs.groupBy("doc_id").agg(*bit_aggs)
    sim = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bits.select("doc_id", sim.cast("long").alias("simhash"))


# =========================================================================
# Similarity search (embeddings)
# =========================================================================

_DOT = "list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))"
_NORM_E = "sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
_NORM_Q = "sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))"


@q(
    "ann1_cosine_topk",
    f"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, round({_DOT} / ({_NORM_E} * {_NORM_Q}), 4) AS cos
    FROM embeddings e, q WHERE e.vec_id <> 0
    ORDER BY {_DOT} / ({_NORM_E} * {_NORM_Q}) DESC, e.vec_id LIMIT 10""",
)
def ann1_cosine_topk(spark, sf_dir):
    # Brute-force cosine top-k: the correctness baseline for ANN. All math
    # in float64 after exact float32→float64 widening; JVM-side zip_with +
    # aggregate (no Python). At scale: broadcast the query vector(s), one
    # narrow pass + TakeOrdered — no shuffle of the corpus.
    e = t(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(dbl(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    # the query norm is loop-invariant: computed once in the 1-row
    # broadcast side, not re-aggregated per corpus row (same hoist as
    # quant1/ann4; the per-row float expression tree is unchanged)
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), norm(F.col("embedding")).alias("qn")
    )
    dot = F.aggregate(
        F.zip_with(dbl(F.col("embedding")), dbl(F.col("qe")), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (norm(F.col("embedding")) * F.col("qn"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("_cos", 4).alias("cos"))
    )


def _lsh_bucket_sql_expr(col: str = "embedding") -> str:
    # 8 deterministic ±1 hyperplanes: sign pattern of plane b at dim i is
    # +1 iff (i*(b+3)) % 7 < 4  (i is 0-based dim index)
    terms = []
    for b in range(8):
        dot = (
            f"list_sum(list_transform(range(1, 65), i -> "
            f"CASE WHEN ((i - 1) * {b + 3}) % 7 < 4 THEN CAST({col}[i] AS DOUBLE) "
            f"ELSE -CAST({col}[i] AS DOUBLE) END))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
    return f"CAST({' + '.join(terms)} AS BIGINT)"


def _lsh_bucket_col(emb=None):
    """Spark twin of _lsh_bucket_sql_expr: 8-bit sign-LSH bucket id."""
    dbl = F.transform(emb if emb is not None else F.col("embedding"), lambda x: x.cast("double"))
    bucket = None
    for b in range(8):
        signed = F.zip_with(
            dbl,
            F.sequence(F.lit(0), F.lit(63)),
            lambda x, i: F.when((i * (b + 3)) % 7 < 4, x).otherwise(-x),
        )
        dot = F.aggregate(signed, F.lit(0.0), lambda a, x: a + x)
        term = F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


@q(
    "ann2_lsh_buckets",
    f"""SELECT bucket, count(*) AS n FROM (SELECT {_lsh_bucket_sql_expr()}
        AS bucket FROM embeddings) GROUP BY bucket""",
)
def ann2_lsh_buckets(spark, sf_dir):
    # Sign-LSH bucketing: the ANN scale path — candidate generation becomes
    # an equi-join on an 8-bit bucket instead of an all-pairs scan.
    e = t(spark, sf_dir, "embeddings")
    return (
        e.select(_lsh_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@q(
    "arr1_array_ops",
    """SELECT vec_id, len(embedding) AS dim,
              round(CAST(embedding[1] AS DOUBLE), 4) AS first_dim,
              round(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2,
              round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                    / len(embedding), 4) AS mean_dim
       FROM embeddings WHERE vec_id < 100""",
)
def arr1_array_ops(spark, sf_dir):
    # F17/A9/J4: array slice/size/aggregate — the mean-collapse analog
    # (adaptive_avg_pool, exe_t.py:405) as array aggregation
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.aggregate(F.transform(dbl, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    sm = F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(dbl, 1), 4).alias("first_dim"),
        F.round(F.sqrt(sq), 4).alias("l2"),
        F.round(sm / F.size("embedding"), 4).alias("mean_dim"),
    )


_DOT_AB = "list_sum(list_transform(range(1, 65), i -> a.emb[i] * b.emb[i]))"


@q(
    "dd6_embedding_neardup",
    f"""WITH n AS (SELECT vec_id,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)
                        / sqrt(list_sum(list_transform(embedding,
                              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS emb
             FROM embeddings WHERE vec_id < 80)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DOT_AB}, 4) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_DOT_AB} >= 0.25""",
)
def dd6_embedding_neardup(spark, sf_dir):
    # Embedding-cosine near-dup: normalize once (narrow pass), then pair
    # search. The brute-force pair join here is the correctness baseline on a
    # bounded subset; the scale path replaces the a×b join with the LSH
    # bucket join of ann2/dd3 (same refine expression).
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x,
    )
    n = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / F.sqrt(sq)).alias("emb"),
    )
    a, b = n.alias("a"), n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            dot.alias("_cos"),
        )
        .filter(F.col("_cos") >= 0.25)
        .select("vec_a", "vec_b", F.round("_cos", 4).alias("cos"))
    )


# Multi-table sign-LSH for near-dup candidate generation: _DD7_TABLES
# tables × k hyperplanes each (OR-amplification, the banded-LSH trick dd3
# uses for MinHash). One table of k bits has collision prob p^k per pair
# (p = 1 - angle/π); the union over L tables lifts recall to 1-(1-p^k)^L
# while each table's equi-join stays bounded.
_DD7_TABLES, _DD7_BITS = 4, 4


def dd7_lsh_bits(n_rows: int, target_bucket_rows: int = 512) -> int:
    """Hyperplanes per LSH table, derived from corpus size: k ≈
    log2(N/target) so the EXPECTED bucket holds ~target rows and the
    per-table candidate join stays bounded as the corpus grows — a fixed
    k makes bucket size corpus-proportional (the shuf1/chk2 constant-
    ceiling class: at 10^12 vectors, 4 bits = 16 buckets of 6×10^10 rows
    each). Floor at the oracle's 4 bits (every shipped test scale, ≤8192
    vectors, derives exactly 4 — the static DuckDB oracle is built for
    k=4 and stays valid there); cap at 24 (16M buckets — more selective
    than that trades recall for nothing at any plausible N; recall at
    high k is recovered by adding TABLES, the orthogonal knob)."""
    import math

    return max(
        _DD7_BITS, min(24, math.ceil(math.log2(max(2, n_rows / target_bucket_rows))))
    )


def _plane_dot_sql(col: str, plane: int) -> str:
    return (
        f"list_sum(list_transform(range(1, 65), i -> "
        f"CASE WHEN ((i - 1) * {plane + 3}) % 7 < 4 THEN CAST({col}[i] AS DOUBLE) "
        f"ELSE -CAST({col}[i] AS DOUBLE) END))"
    )


def _table_bucket_sql(col: str, table: int) -> str:
    terms = [
        f"(CASE WHEN {_plane_dot_sql(col, table * _DD7_BITS + b)} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_DD7_BITS)
    ]
    return f"CAST({' + '.join(terms)} AS BIGINT)"


def _table_bucket_col(table: int, emb=None, bits: int = _DD7_BITS):
    dbl = F.transform(emb if emb is not None else F.col("embedding"), lambda x: x.cast("double"))
    bucket = None
    for b in range(bits):
        plane = table * bits + b
        signed = F.zip_with(
            dbl,
            F.sequence(F.lit(0), F.lit(63)),
            lambda x, i: F.when((i * (plane + 3)) % 7 < 4, x).otherwise(-x),
        )
        dot = F.aggregate(signed, F.lit(0.0), lambda a, x: a + x)
        term = F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


@q(
    "dd7_lsh_neardup",
    f"""WITH n AS (SELECT vec_id,
                    {", ".join(f"{_table_bucket_sql('embedding', tb)} AS b{tb}" for tb in range(_DD7_TABLES))},
                    list_transform(embedding, x -> CAST(x AS DOUBLE)
                        / sqrt(list_sum(list_transform(embedding,
                              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS emb
             FROM embeddings),
    e AS (SELECT vec_id, emb, tb,
                 CASE tb {" ".join(f"WHEN {tb} THEN b{tb}" for tb in range(_DD7_TABLES))} END AS bk
          FROM n, unnest([{", ".join(str(tb) for tb in range(_DD7_TABLES))}]) AS u(tb))
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DOT_AB}, 4) AS cos
    FROM e a JOIN e b ON a.tb = b.tb AND a.bk = b.bk AND a.vec_id < b.vec_id
    WHERE {_DOT_AB} >= 0.25""",
)
def dd7_lsh_neardup(spark, sf_dir, _n_override: int | None = None):
    # The SCALE path for embedding near-dup (VERDICT r01 item 3): candidate
    # generation = equi-join on (table, bucket) over 4 sign-LSH tables,
    # then exact-cosine refine (dd6's expression) inside the buckets only,
    # DISTINCT to merge multi-table hits. No nested-loop pair join anywhere
    # (pinned by tests/test_ml_battery.py): bits per table are DERIVED from
    # the corpus size (dd7_lsh_bits: k ≈ log2(N/512), so expected bucket
    # rows stay ~constant as the corpus grows — at every shipped test
    # scale k=4, keeping the static oracle exact), and the whole pipeline
    # is one shuffle on the (table, bucket) key. dd6 stays as the bounded
    # brute-force correctness baseline; this runs at 10^12 rows.
    # _n_override is a test-only hook pinning the large-N bit derivation.
    e = t(spark, sf_dir, "embeddings")
    n_rows = (
        _n_override
        if _n_override is not None
        else table_rowcount(spark, sf_dir, "embeddings")
    )
    bits = dd7_lsh_bits(n_rows)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x,
    )
    n = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / F.sqrt(sq)).alias("emb"),
        *[
            _table_bucket_col(tb, bits=bits).alias(f"b{tb}")
            for tb in range(_DD7_TABLES)
        ],
    )
    ex = n.select(
        "vec_id",
        "emb",
        F.posexplode(F.array(*[F.col(f"b{tb}") for tb in range(_DD7_TABLES)])).alias(
            "tb", "bk"
        ),
    )
    a, b = ex.alias("a"), ex.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.tb") == F.col("b.tb"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            dot.alias("_cos"),
        )
        .filter(F.col("_cos") >= 0.25)
        .select("vec_a", "vec_b", F.round("_cos", 4).alias("cos"))
        .distinct()
    )


_IVF_CENTROID = """
centroids AS (
    SELECT label,
           list_transform(range(1, 65),
               i -> list_sum(list_transform(vecs, v -> v[i])) / len(vecs)) AS cent
    FROM (SELECT label,
                 list(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vecs
          FROM embeddings GROUP BY label))
"""


@q(
    "ann3_ivf_topk",
    f"""WITH {_IVF_CENTROID},
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
          FROM embeddings WHERE vec_id = 0),
    probe AS (
        SELECT c.label FROM centroids c, q
        ORDER BY list_sum(list_transform(range(1, 65), i -> c.cent[i] * q.qe[i]))
                 / (sqrt(list_sum(list_transform(c.cent, x -> x * x)))
                    * sqrt(list_sum(list_transform(q.qe, x -> x * x)))) DESC, c.label
        LIMIT 2)
    SELECT e.vec_id, e.label,
           round(list_sum(list_transform(range(1, 65),
                     i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))
                 / (sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe, x -> x * x)))), 4) AS cos
    FROM embeddings e JOIN probe p ON e.label = p.label, q
    WHERE e.vec_id <> 0
    ORDER BY list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))
             / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qe, x -> x * x)))) DESC, e.vec_id
    LIMIT 5""",
)
def ann3_ivf_topk(spark, sf_dir):
    # IVF ANN: (1) train coarse quantizer = per-partition centroid via one
    # groupBy (here the label column is the inverted-list id); (2) probe the
    # nprobe=2 nearest centroids; (3) exact cosine refine inside those lists
    # only. At 10^12 scale the centroid table is tiny → broadcast, and the
    # candidate scan reads ~nprobe/nlists of the corpus instead of all of it.
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)

    def norm(a):
        return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))

    # (1) train: average vector per list — array_agg-free, one shuffle
    cent = (
        e.select("label", F.posexplode(dbl).alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("s"))
        .select("label", F.transform("s", lambda st: st["m"]).alias("cent"))
    )
    # query norm hoisted into the 1-row broadcast side (quant1/ann4 hoist)
    qv = e.filter(F.col("vec_id") == 0).select(
        dbl.alias("qe"), norm(dbl).alias("qn")
    )
    # (2) probe: nearest 2 centroids (centroid table is tiny → broadcast)
    probe = (
        cent.crossJoin(F.broadcast(qv))
        .select("label", (dot(F.col("cent"), F.col("qe")) / (norm(F.col("cent")) * F.col("qn"))).alias("c"))
        .orderBy(F.desc("c"), "label")
        .limit(2)
        .select("label")
    )
    # (3) refine: exact cosine within probed lists only
    cos = dot(dbl, F.col("qe")) / (norm(dbl) * F.col("qn"))
    return (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe), "label", "left_semi")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), "vec_id")
        .limit(5)
        .select("vec_id", "label", F.round("_cos", 4).alias("cos"))
    )


# =========================================================================
# Sessionization / grouping sets / array padding
# =========================================================================


@q(
    "w9_sessionize",
    """WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, event_id, ts,
                 -- CAST: DuckDB window sum() yields HUGEINT, which pandas
                 -- materializes as float64 ("5.0") and breaks the driver's
                 -- string-canonicalized value hash vs Spark's int64 ("5").
                 CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM g)
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM s GROUP BY user_id, session_id""",
)
def w9_sessionize(spark, sf_dir):
    # Gap-based sessionization (30-min inactivity): lag → boundary flag →
    # running sum = session id → per-session agg. One shuffle on user_id;
    # all three windows share the same partitioning so Spark keeps one sort.
    # Gap + duration compare at MICROSECOND precision on both sides (ADVICE
    # r01: second-truncated epochs could mis-sessionize a gap in (1800,1801]s).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet stores TIMESTAMP_NTZ — route through timestamp for epoch micros
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        t(spark, sf_dir, "events")
        .withColumn("new_s", new_s)
        .withColumn("us", us)
        .withColumn("session_id", F.sum("new_s").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
    )


@q(
    "w10_range_frame",
    """SELECT event_id, user_id,
              count(*) OVER w AS n_trailing_1h,
              round(sum(value) OVER w, 4) AS sum_trailing_1h
       FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
       WINDOW w AS (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
)
def w10_range_frame(spark, sf_dir):
    # VALUE-based window frame (RANGE, not ROWS): trailing 1-hour count/sum
    # per user — the time-windowed running aggregate rows-frames cannot
    # express (peers at unequal spacing). Ordered by epoch micros so the
    # frame bound is an exact interval on both engines. Same single shuffle
    # on user_id as any window; the frame only changes the in-partition
    # scan, so the plan is scale-identical to w3/w9.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "events")
        .withColumn("us", us)
        .select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_trailing_1h"),
            F.round(F.sum("value").over(w), 4).alias("sum_trailing_1h"),
        )
    )


@q(
    "a14_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def a14_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), _dec(F.col("o_totalprice")).alias("total"))
    )


@q(
    "f13_pad_tokens",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents
                   WHERE doc_id < 50)
    SELECT doc_id,
           array_to_string(
               CASE WHEN len(ws) >= 32 THEN ws[1:32]
                    ELSE list_concat(ws, list_transform(range(32 - len(ws)),
                                                        x -> '<pad>')) END,
               ' ') AS padded,
           least(len(ws), 32) AS real_len
    FROM w""",
)
def f13_pad_tokens(spark, sf_dir):
    # F13 pad-right-to-width (reference exe_t.py:144-152): truncate/pad the
    # token array to a fixed 32 — the collate_fn analog done columnar.
    # The padded array is serialized with array_join so the driver's pandas
    # canonicalizer can hash it (lists are unhashable in sort_values); the
    # array-typed form stays covered by tests/test_ml_battery.py.
    ws = _spark_words()
    padded = F.when(F.size(ws) >= 32, F.slice(ws, 1, 32)).otherwise(
        F.concat(ws, F.array_repeat(F.lit("<pad>"), 32 - F.size(ws)))
    )
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.array_join(padded, " ").alias("padded"),
            F.least(F.size(ws), F.lit(32)).cast("long").alias("real_len"),
        )
    )


# =========================================================================
# Text analysis
# =========================================================================


@q(
    "tx1_token_count",
    f"""SELECT doc_id,
               len({_duck_words()}) AS n_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_ish
        FROM documents""",
)
def tx1_token_count(spark, sf_dir):
    # whitespace tokens + BPE-ish regex tokens
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_spark_words()).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)))
        .cast("long")
        .alias("n_bpe_ish"),
    )


_STOPWORDS = ("the", "a", "of", "to", "in", "and", "value", "table")


@q(
    "tx2_quality_score",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents)
    SELECT doc_id,
           round(len(list_filter(ws, x -> x IN {str(tuple(_STOPWORDS))}))
                 / len(ws), 4) AS stop_ratio,
           round(list_sum(list_transform(ws, x -> length(x)))
                 / CAST(len(ws) AS DOUBLE), 4) AS mean_wlen
    FROM w""",
)
def tx2_quality_score(spark, sf_dir):
    # quality scoring: stopword ratio + mean token length (length/punct
    # ratio family) — all JVM-side array lambdas
    ws = _spark_words()
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda x: F.array_contains(stop_arr, x)))
    sum_len = F.aggregate(
        F.transform(ws, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(n_stop / F.size(ws), 4).alias("stop_ratio"),
        F.round(sum_len / F.size(ws).cast("double"), 4).alias("mean_wlen"),
    )


# Frozen char-trigram profiles (top discriminative trigrams per language,
# ASCII-only so Java/DuckDB literal semantics coincide byte-for-byte).
# Score(doc, lang) = #profile trigrams present in " "+lower(canon(text))+" ";
# pred = argmax with fixed tie-break order; 'und' when every score is 0.
_LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "nd ", "ing", " of", "ion"),
    "de": ("der", "ein", "sch", "ich", "die", "und", "ung", "cht"),
    "fr": (" le", "les", "ent", "que", "ait", "our", "ais", "eur"),
    "es": (" el", "los", " la", "ado", "nte", "cio", "ar ", "una"),
    "it": (" di", "che", "ell", "zio", "gli", "ita", "ono", "lla"),
}
_LANG_ORDER = tuple(_LANG_TRIGRAMS)  # tie-break priority: en,de,fr,es,it


def _tx3_oracle() -> str:
    scores = ", ".join(
        " + ".join(f"(CASE WHEN contains(pt, '{g}') THEN 1 ELSE 0 END)" for g in grams)
        + f" AS s_{lang}"
        for lang, grams in _LANG_TRIGRAMS.items()
    )
    best = f"greatest({', '.join('s_' + lo for lo in _LANG_ORDER)})"
    whens = " ".join(f"WHEN s_{lo} = {best} THEN '{lo}'" for lo in _LANG_ORDER)
    return f"""
    WITH p AS (SELECT doc_id,
                      ' ' || lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) || ' ' AS pt
               FROM documents),
    s AS (SELECT doc_id, {scores} FROM p)
    SELECT doc_id, CASE WHEN {best} = 0 THEN 'und' {whens} END AS pred_lang
    FROM s"""


def lang_id_col(text_col="text"):
    """Predicted-language Column for any string column (used by tx3 and by
    tests over real multilingual sentences)."""
    padded = F.concat(
        F.lit(" "),
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")),
        F.lit(" "),
    )
    # Single-instance argmax: each trigram `contains` appears exactly ONCE in
    # the expression tree.  The naive greatest(...) + when-cascade form
    # duplicates the 40 score terms ~7x; fused into a larger whole-stage-
    # codegen region (e.g. the pipeline handoff projection + quality filter)
    # that blows janino's 64 KB method cap and silently drops the stage to
    # interpreted mode — a real throughput cliff at corpus scale.
    # array_max over struct(score, priority) compares field-by-field, so ties
    # resolve to the highest priority = FIRST lang in _LANG_ORDER (identical
    # to the old first-wins when-cascade); an (s=0, highest-priority) sentinel
    # yields 'und' exactly when every score is 0.
    n = len(_LANG_ORDER)
    entries = [
        F.struct(
            sum(
                F.when(F.contains(padded, F.lit(g)), 1).otherwise(0)
                for g in _LANG_TRIGRAMS[lo]
            ).alias("s"),
            F.lit(n - 1 - i).alias("p"),
        )
        for i, lo in enumerate(_LANG_ORDER)
    ]
    sentinel = F.struct(F.lit(0).alias("s"), F.lit(n).alias("p"))
    # lang_by_priority[p] = lang with priority p (p = n-1-i), plus 'und' at p=n
    lang_by_priority = F.array(
        *[F.lit(_LANG_ORDER[n - 1 - p]) for p in range(n)], F.lit("und")
    )
    best = F.array_max(F.array(*entries, sentinel))
    return F.element_at(lang_by_priority, best["p"] + 1)


@q("tx3_lang_id", _tx3_oracle())
def tx3_lang_id(spark, sf_dir):
    # Language ID via char-trigram profiles (the n-gram-profile method of
    # Cavnar & Trenkle 1994, presence-count variant): the profile table is a
    # frozen constant folded into the plan (broadcast-by-construction), the
    # scoring is one narrow JVM pass — no shuffle, no Python. The same
    # _LANG_TRIGRAMS constant generates the DuckDB oracle, so both engines
    # score identically by construction. Multilingual discrimination is
    # pinned by tests/test_ml_battery.py over real DE/FR/ES/IT sentences.
    return t(spark, sf_dir, "documents").select(
        "doc_id", lang_id_col().alias("pred_lang")
    )


@q(
    "tx4_fingerprint",
    """SELECT doc_id, md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp
       FROM documents""",
)
def tx4_fingerprint(spark, sf_dir):
    # document fingerprint: md5 of canonical text (the rolling-hash variant
    # is tx5, oracle-less)
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).alias("fp"),
    )


@q(
    "tx5_rolling_hash",
    """SELECT doc_id,
              list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                          string_split_regex(
                              regexp_replace(trim(text), '\\s+', ' ', 'g'), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                  (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
       FROM documents""",
)
def tx5_rolling_hash(spark, sf_dir):
    # Karp-Rabin-style rolling hash over characters, JVM-side aggregate.
    # Exact-folded twin: DuckDB list_reduce runs the identical left fold with
    # the identical per-step mod, so even this is value-checked.
    chars = F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), "")
    rolled = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % 1000000007,
    )
    return t(spark, sf_dir, "documents").select("doc_id", rolled.alias("rhash"))


_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"  # ASCII punctuation (identical in Java + DuckDB)


@q(
    "tx6_punct_ratio",
    f"""SELECT doc_id,
               len(regexp_extract_all(text, '{_PUNCT_CLASS}')) AS n_punct,
               round(len(regexp_extract_all(text, '{_PUNCT_CLASS}'))
                     / CAST(length(text) AS DOUBLE), 6) AS punct_ratio
        FROM documents WHERE length(text) > 0""",
)
def tx6_punct_ratio(spark, sf_dir):
    # F7 unicode-category punctuation classify (train.py:125-126), pinned to
    # the ASCII class so Java and DuckDB regex semantics coincide exactly
    n_punct = F.size(F.regexp_extract_all("text", F.lit(_PUNCT_CLASS), F.lit(0)))
    return (
        t(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            n_punct.cast("long").alias("n_punct"),
            F.round(n_punct / F.length("text").cast("double"), 6).alias("punct_ratio"),
        )
    )


@q(
    "tx7_repetition_ratio",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
    b AS (SELECT doc_id,
                 list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) AS big
          FROM w WHERE len(ws) >= 2)
    SELECT doc_id,
           len(big) AS n_bigrams,
           round(1 - len(list_distinct(big)) / CAST(len(big) AS DOUBLE), 4)
               AS dup_bigram_frac
    FROM b""",
)
def tx7_repetition_ratio(spark, sf_dir):
    # Gopher-style repetition quality rule: the fraction of duplicate word
    # bigrams within a document (high -> boilerplate/spam/templated text).
    # Entirely array-lambda JVM-side, no explode and no shuffle — one narrow
    # pass at any corpus size.
    ws = _spark_words()
    big = _bigram_array(ws)
    big_col = big.alias("big")
    return (
        t(spark, sf_dir, "documents")
        .filter(F.size(ws) >= 2)
        .select("doc_id", big_col)
        .select(
            "doc_id",
            F.size("big").cast("long").alias("n_bigrams"),
            F.round(
                1 - F.size(F.array_distinct("big")) / F.size("big").cast("double"), 4
            ).alias("dup_bigram_frac"),
        )
    )


@q(
    "w11_islands",
    """WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS boundary
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (SELECT user_id, event_type, ts,
                 CAST(sum(boundary) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
          FROM g)
    SELECT user_id, grp, event_type,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
           count(*) AS run_len
    FROM r GROUP BY user_id, grp, event_type""",
)
def w11_islands(spark, sf_dir):
    # Gaps-and-islands: maximal runs of consecutive same-type events per
    # user (lag boundary flag -> running sum -> group). The W-family
    # companion to w9's gap-based sessionization; same one-shuffle shape
    # (window partitioned on user_id, then groupBy the same key — AQE
    # reuses the partitioning, no second exchange of the full data).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    grp = F.sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # parquet stores TIMESTAMP_NTZ — route through timestamp for epoch micros
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("grp", grp)
        .withColumn("us", us)
        .groupBy("user_id", "grp", "event_type")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count("*").alias("run_len"),
        )
        .select("user_id", "grp", "event_type", "start_us", "end_us", "run_len")
    )


@q(
    "tx8_bigram_lm_score",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
    b AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS big,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1
          FROM w WHERE len(ws) >= 2),
    c2 AS (SELECT big, count(*) AS n2 FROM b GROUP BY big),
    c1 AS (SELECT w1, count(*) AS n1 FROM b GROUP BY w1),
    s AS (SELECT doc_id, (least(n2 - 1, 920000000000000) * 10000) // n1 AS sc
          FROM b JOIN c2 USING (big) JOIN c1 USING (w1))
    SELECT doc_id, CAST(sum(sc) // count(*) AS BIGINT) AS lm_score,
           count(*) AS n_bigrams
    FROM s GROUP BY doc_id""",
)
def tx8_bigram_lm_score(spark, sf_dir):
    # CCNet-style LM quality filter, self-trained on the corpus itself:
    # score(doc) = mean over its word bigrams of the LEAVE-ONE-OUT
    # conditional probability (c(w1w2)-1)/c(w1·) — each occurrence is
    # scored by the evidence from the REST of the corpus, so a gibberish
    # doc of corpus-unique bigrams scores 0 rather than trivially certain.
    # Low scores flag unnatural word sequences (spam, gibberish, mangled
    # extraction). All arithmetic is
    # INTEGER (P scaled by 1e4, integral division) so both engines agree
    # bit-for-bit regardless of summation order — no transcendental or
    # float-accumulation divergence. Scale shape: the "train" pass is two
    # map-side-combined counts over exploded bigrams (vocab ≪ corpus);
    # "apply" is two equi-joins of occurrences against those counts, then
    # one groupBy(doc). The count tables are vocabulary-sized — at 10^12
    # docs, still joinable (and cappable to top-K with unigram backoff).
    ws = _spark_words()
    big = _bigram_array(ws)
    b = (
        t(spark, sf_dir, "documents")
        .filter(F.size(ws) >= 2)
        .select("doc_id", F.explode(big).alias("big"))
        .withColumn("w1", F.split("big", " ").getItem(0))
        # collapse repeated within-doc occurrences BEFORE the joins: the
        # join input shrinks from one row per occurrence to one per
        # (doc, bigram type); the weighted form below gives the identical
        # integer score, so the (unweighted-looking) oracle still matches
        .groupBy("doc_id", "big", "w1")
        .agg(F.count("*").alias("c"))
    )
    c2 = b.groupBy("big").agg(F.sum("c").alias("n2"))
    c1 = b.groupBy("w1").agg(F.sum("c").alias("n1"))
    s = (
        b.join(c2, "big")
        .join(c1, "w1")
        # the 9.2e14 cap keeps (n2-1)*1e4 inside int64 even for a stopword
        # bigram at 10^15-occurrence scale (Spark would wrap silently,
        # DuckDB would error — capped, both stay exact and identical; a
        # score saturating at the cap is indistinguishable from certainty
        # anyway at that frequency)
        .select(
            "doc_id",
            "c",
            F.expr("(least(n2 - 1, 920000000000000) * 10000) div n1").alias("sc"),
        )
    )
    return s.groupBy("doc_id").agg(
        F.expr("sum(sc * c) div sum(c)").alias("lm_score"),
        F.sum("c").alias("n_bigrams"),
    )


@q(
    "pg1_paragraph_dedup",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
    c0 AS (SELECT doc_id,
                  list_transform(range(CAST(ceil(len(ws) / 3.0) AS BIGINT)),
                                 i -> array_to_string(ws[i * 3 + 1 : i * 3 + 3], ' '))
                      AS chunks
           FROM w),
    c AS (SELECT doc_id, unnest(chunks) AS chunk,
                 unnest(range(len(chunks))) AS pos
          FROM c0),
    keyed AS (SELECT doc_id, pos, chunk, md5(chunk) AS h FROM c),
    win AS (SELECT h, struct_extract(w, 'd') AS doc_id,
                   struct_extract(w, 'p') AS pos
            FROM (SELECT h, min(struct_pack(d := doc_id, p := pos)) AS w
                  FROM keyed GROUP BY h)),
    kept AS (SELECT keyed.doc_id, keyed.pos, keyed.chunk
             FROM keyed JOIN win USING (h, doc_id, pos))
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
           count(*) AS n_kept
    FROM kept GROUP BY doc_id""",
)
def pg1_paragraph_dedup(spark, sf_dir):
    # CCNet/RefinedWeb-style sub-document dedup: split every document into
    # fixed token chunks (3 tokens here so the tiny fixture vocabulary
    # actually collides; the paragraph-hash shape is chunk-size-agnostic),
    # keep only the FIRST occurrence of each chunk corpus-wide — the winner
    # is min(struct(doc_id, pos)), lexicographic in BOTH engines, so no
    # integer encoding (and no encoding-collision bound on doc size or
    # corpus size) — and reassemble each document's surviving chunks in
    # order. Scale shape: one narrow explode, one shuffle on the chunk md5
    # (never the raw string), a semi-join back on (hash, winner doc, pos),
    # one groupBy(doc_id) reassembly — no step is ever all-pairs, and
    # map-side partial min cuts the first shuffle.
    ws = _spark_words()
    n_chunks = F.ceil(F.size(ws) / F.lit(3.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i * 3 + 1, 3)),
    )
    c = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(chunks).alias("pos", "chunk"))
        .withColumn("h", F.md5("chunk"))
    )
    win = (
        c.groupBy("h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
        .select("h", F.col("w.doc_id").alias("doc_id"), F.col("w.pos").alias("pos"))
    )
    kept = c.join(win, ["h", "doc_id", "pos"], "left_semi")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )


_URL2_DUCK_RAW = """CASE CAST(doc_id % 5 AS INT)
        WHEN 0 THEN 'HTTPS://WWW.Example-' || source || '.COM:443/Docs/' || CAST(doc_id AS VARCHAR) || '/'
        WHEN 1 THEN 'http://example-' || source || '.com:80/docs/' || CAST(doc_id AS VARCHAR) || '?q=1#frag'
        WHEN 2 THEN 'https://Example-' || source || '.com/docs/' || CAST(doc_id AS VARCHAR) || '#section-2'
        WHEN 3 THEN 'https://www.example-' || source || '.com/docs/' || CAST(doc_id AS VARCHAR) || '///'
        ELSE 'HTTP://EXAMPLE-' || source || '.COM/Docs/' || CAST(doc_id AS VARCHAR)
    END"""


@q(
    "url2_canonicalize",
    f"""WITH raw AS (SELECT doc_id, {_URL2_DUCK_RAW} AS url_raw FROM documents),
    p AS (SELECT doc_id, url_raw,
                 lower(regexp_extract(url_raw, '^([A-Za-z]+)://', 1)) AS scheme,
                 lower(regexp_extract(url_raw, '^[A-Za-z]+://([^/?#]*)', 1)) AS hostport,
                 regexp_replace(regexp_extract(url_raw, '^[A-Za-z]+://[^/?#]*(.*)$', 1),
                                '#.*$', '') AS rest
          FROM raw),
    h AS (SELECT doc_id, url_raw, scheme,
                 regexp_replace(
                     CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                          WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
                          ELSE hostport END,
                     '^www\\.', '') AS host,
                 regexp_replace(rest, '/+$', '') AS path
          FROM p)
    SELECT doc_id, url_raw, scheme || '://' || host || path AS url_canon
    FROM h""",
)
def url2_canonicalize(spark, sf_dir):
    # Crawl-frontier URL canonicalization — the dedup key a web-scale
    # pipeline computes before ANY content hashing: lowercase scheme+host,
    # strip fragment, drop default ports (:443/:80), drop the www. prefix,
    # strip trailing slashes; path case and query string are preserved
    # (RFC 3986: path is case-sensitive). Raw urls are synthesized
    # deterministically from doc_id in both engines (the test tables carry
    # no url column). Pure regexp projection — narrow, codegen'd, no
    # shuffle; patterns are RE2-safe (no lookaround) so Java and DuckDB
    # semantics coincide.
    raw = F.when(
        (F.col("doc_id") % 5) == 0,
        F.concat(F.lit("HTTPS://WWW.Example-"), F.col("source"), F.lit(".COM:443/Docs/"),
                 F.col("doc_id").cast("string"), F.lit("/")),
    ).when(
        (F.col("doc_id") % 5) == 1,
        F.concat(F.lit("http://example-"), F.col("source"), F.lit(".com:80/docs/"),
                 F.col("doc_id").cast("string"), F.lit("?q=1#frag")),
    ).when(
        (F.col("doc_id") % 5) == 2,
        F.concat(F.lit("https://Example-"), F.col("source"), F.lit(".com/docs/"),
                 F.col("doc_id").cast("string"), F.lit("#section-2")),
    ).when(
        (F.col("doc_id") % 5) == 3,
        F.concat(F.lit("https://www.example-"), F.col("source"), F.lit(".com/docs/"),
                 F.col("doc_id").cast("string"), F.lit("///")),
    ).otherwise(
        F.concat(F.lit("HTTP://EXAMPLE-"), F.col("source"), F.lit(".COM/Docs/"),
                 F.col("doc_id").cast("string"))
    )
    scheme = F.lower(F.regexp_extract("url_raw", r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract("url_raw", r"^[A-Za-z]+://([^/?#]*)", 1))
    rest = F.regexp_replace(
        F.regexp_extract("url_raw", r"^[A-Za-z]+://[^/?#]*(.*)$", 1), r"#.*$", ""
    )
    host = F.regexp_replace(
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport),
        r"^www\.", "",
    )
    path = F.regexp_replace(rest, r"/+$", "")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", raw.alias("url_raw"))
        .select(
            "doc_id",
            "url_raw",
            F.concat(scheme, F.lit("://"), host, path).alias("url_canon"),
        )
    )


@q(
    "pipe1_curation",
    f"""WITH w AS (SELECT doc_id, lang, text, {_duck_words()} AS ws FROM documents),
    q AS (SELECT doc_id, lang, text, len(ws) AS n_tokens,
                 list_sum(list_transform(ws, x -> length(x)))
                     / CAST(len(ws) AS DOUBLE) AS mwl
          FROM w),
    g AS (SELECT * FROM q
          WHERE n_tokens >= 20 AND mwl BETWEEN 2.0 AND 12.0
            AND lang IN ('en', 'de', 'fr', 'es')),
    d AS (SELECT doc_id, lang, n_tokens, md5(substring(text, 1, 40)) AS sig,
                 row_number() OVER (PARTITION BY md5(substring(text, 1, 40))
                                    ORDER BY doc_id) AS rn
          FROM g)
    SELECT doc_id, lang, sig, n_tokens FROM d WHERE rn = 1""",
)
def pipe1_curation(spark, sf_dir):
    # End-to-end corpus CURATION pass — the composition a real training-data
    # pipeline runs, built entirely from this battery's primitives:
    # tokenize (tx1) → quality gates (tx2: token count + mean word length)
    # → language filter (tx3's output column) → exact dedup keep-first (dd1).
    # One narrow scan computes all metrics, then a single shuffle on the
    # dedup signature for the keep-first window — at 10^12 rows that is the
    # minimal-shuffle plan for this semantics.
    ws = _spark_words()
    sum_len = F.aggregate(
        F.transform(ws, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    q_ = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.size(ws).cast("long").alias("n_tokens"),
        (sum_len / F.size(ws).cast("double")).alias("mwl"),
    )
    g = q_.filter(
        (F.col("n_tokens") >= 20)
        & F.col("mwl").between(2.0, 12.0)
        & F.col("lang").isin("en", "de", "fr", "es")
    ).withColumn("sig", F.md5(F.substring("text", 1, 40)))
    w = Window.partitionBy("sig").orderBy("doc_id")
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "sig", "n_tokens")
    )


_SAMP_RATES = {"en": 10, "de": 25, "fr": 25, "es": 25, "zh": 50}  # percent


@q(
    "samp1_stratified_sample",
    f"""SELECT doc_id, lang
       FROM documents
       WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
             < CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in _SAMP_RATES.items())}
               ELSE 0 END""",
)
def samp1_stratified_sample(spark, sf_dir):
    # Deterministic stratified sampling — the reproducible form of
    # df.sampleBy for training-data curation (down-sample over-represented
    # languages, keep rare ones). The acceptance test is a pure hash of the
    # row key (md5 16-bit prefix mod 100 vs a per-stratum rate), so the
    # sample is stable across runs/partitionings/engines — which is what a
    # rebuildable 10^12-row pipeline needs, and why it can be value-checked
    # exactly against SQL while rand()-based sampleBy cannot. Narrow
    # operation: predicate only, no shuffle.
    rate = F.create_map(
        *[x for k, v in _SAMP_RATES.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("lang")]
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 100
    return (
        t(spark, sf_dir, "documents")
        .filter(bucket < F.coalesce(rate, F.lit(0)))
        .select("doc_id", "lang")
    )


@q(
    "arr2_set_ops",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents
                   WHERE doc_id < 30),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 list_sort(list_distinct(list_intersect(a.ws, b.ws))) AS common,
                 len(list_distinct(list_concat(a.ws, b.ws))) AS n_union
          FROM w a JOIN w b ON a.doc_id + 1 = b.doc_id)
    SELECT doc_a, doc_b, array_to_string(common, ' ') AS common, n_union FROM p""",
)
def arr2_set_ops(spark, sf_dir):
    # array set algebra (intersect/union) JVM-side — the token-overlap
    # primitive under dd4's Jaccard, exposed directly.  `common` is
    # array_join-serialized for the driver's pandas canonicalizer (lists are
    # unhashable); the typed-array form is pytest-covered.
    w = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", _spark_words().alias("ws"))
    )
    a, b = w.alias("a"), w.alias("b")
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.array_join(
                F.array_sort(F.array_distinct(F.array_intersect("a.ws", "b.ws"))), " "
            ).alias("common"),
            F.size(F.array_distinct(F.concat("a.ws", "b.ws"))).cast("long").alias("n_union"),
        )
    )


@q(
    "p9_rlike_filter",
    """SELECT doc_id FROM documents WHERE regexp_matches(text, 'window .*batch')""",
)
def p9_rlike_filter(spark, sf_dir):
    # P9: regex predicate (the commented-out checkpoint regex filter,
    # exe_t.py:463-466)
    return t(spark, sf_dir, "documents").filter(F.col("text").rlike("window .*batch")).select("doc_id")


@q(
    "ud8_grouped_zscore",
    """SELECT event_id,
              round(CASE WHEN sd = 0 OR sd IS NULL THEN 0.0
                         ELSE (value - mu) / sd END, 6) AS z
       FROM (SELECT event_id, value,
                    avg(value) OVER (PARTITION BY user_id) AS mu,
                    stddev_samp(value) OVER (PARTITION BY user_id) AS sd
             FROM events)""",
)
def ud8_grouped_zscore(spark, sf_dir):
    # UD8 (custom aggregator surface): applyInPandas grouped-map — the
    # merge_best_states analog (train.py:202-220) as per-group vectorized
    # numpy. One shuffle on the group key; each group is one pandas frame.
    import numpy as _np
    import pandas as _pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [StructField("event_id", LongType()), StructField("z", DoubleType())]
    )

    def zscore(pdf: _pd.DataFrame) -> _pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=_np.float64)
        mu = v.mean()
        sd = v.std(ddof=1) if len(v) > 1 else 0.0
        z = _np.zeros_like(v) if (sd == 0 or _np.isnan(sd)) else (v - mu) / sd
        return _pd.DataFrame({"event_id": pdf["event_id"], "z": _np.round(z, 6)})

    return (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, schema)
        .select("event_id", "z")
    )


@q(
    "udtf1_token_positions",
    f"""SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS token
        FROM (SELECT doc_id, {_duck_words()} AS w FROM documents
              WHERE doc_id < 20), unnest(range(1, len(w) + 1)) AS r(i)""",
)
def udtf1_token_positions(spark, sf_dir):
    # True Python UDTF (Spark 4 surface): one row in → many rows out with
    # per-call state (position counter). Semantically = posexplode (which
    # is what the engine uses at scale — the UDTF exists to cover the
    # user-defined-table-function API).
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split()):
                yield i, tok

    spark.udtf.register("gos_tokenize", Tokenize)
    t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """SELECT d.doc_id, tk.pos, tk.token
           FROM udtf_docs d, LATERAL gos_tokenize(trim(d.text)) tk
           WHERE d.doc_id < 20"""
    )


@q(
    "dec1_decontaminate",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(len(ws) - 2),
                        i -> md5(array_to_string(ws[i + 1 : i + 3], ' ')))) AS gh
          FROM w WHERE len(ws) >= 3),
    ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0),
    tr AS (SELECT DISTINCT doc_id, gh FROM g WHERE doc_id % 97 <> 0),
    tot AS (SELECT doc_id, count(*) AS n_ngrams FROM tr GROUP BY doc_id)
    SELECT tr.doc_id, count(*) AS n_overlap, min(tot.n_ngrams) AS n_ngrams
    FROM tr JOIN ev USING (gh) JOIN tot USING (doc_id)
    GROUP BY tr.doc_id HAVING count(*) >= 2""",
)
def dec1_decontaminate(spark, sf_dir):
    # Benchmark decontamination (GPT-3 appx C / Pile style): flag training
    # docs sharing word n-grams with a held-out eval set. Eval set = docs
    # with doc_id % 97 == 0, materialized ONCE as a gram-hash side table
    # (_fixture_eval_grams_dir) — the production shape, where the
    # benchmark gram table is maintained separately from the corpus — so
    # the query itself scans documents exactly once (plan-pinned); n=3 at
    # this vocabulary — production uses 13-grams, one knob. Scale shape:
    # the eval n-gram set is benchmark-sized (millions), so it BROADCASTS
    # — the corpus side never shuffles for the join; the corpus then
    # takes exactly ONE shuffle, on doc_id, where distinct-aggregation
    # computes both the overlap and per-doc gram totals (map-side partial
    # distinct). Grams travel as md5 hashes, never strings.
    ev = spark.read.parquet(
        _fixture_eval_grams_dir(spark, sf_dir)
    ).withColumn("hit", F.lit(1))
    tr = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", _spark_words().alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(_spark_gram3_hashes()).alias("gh"))
    )
    return (
        tr.join(F.broadcast(ev), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count_distinct(
                F.when(F.col("hit") == 1, F.col("gh"))
            ).alias("n_overlap"),
            F.count_distinct("gh").alias("n_ngrams"),
        )
        .filter(F.col("n_overlap") >= 2)
        .select("doc_id", "n_overlap", "n_ngrams")
    )


@q(
    "ng1_dup_spans",
    f"""WITH w AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(len(ws) - 2),
                        i -> md5(array_to_string(ws[i + 1 : i + 3], ' ')))) AS gh
          FROM w WHERE len(ws) >= 3),
    c AS (SELECT gh, count(*) AS nd FROM g GROUP BY gh)
    SELECT doc_id, count(*) AS n_spans,
           count(*) FILTER (WHERE nd >= 2) AS n_shared
    FROM g JOIN c USING (gh)
    GROUP BY doc_id HAVING count(*) FILTER (WHERE nd >= 2) >= 1""",
)
def ng1_dup_spans(spark, sf_dir):
    # Cross-document repeated-span detection — the sliding-window form of
    # exact-substring dedup (Lee et al. 2021's suffix-array dedup at
    # word-window granularity, which IS Spark-expressible): a span is
    # shared if its n-gram window occurs in >= 2 distinct docs, at ANY
    # alignment (unlike pg1's fixed chunks) and across docs (unlike tx7's
    # within-doc rule). Scale shape: distinct (doc, span-hash) pairs →
    # per-hash doc count → join back. Both the count agg and the join key
    # on the same hash, so AQE reuses one exchange; no collect_list of doc
    # ids (a stopword span at 10^12 docs would OOM any list aggregate).
    g = (
        t(spark, sf_dir, "documents")
        .select("doc_id", _spark_words().alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(_spark_gram3_hashes()).alias("gh"))
        .distinct()
    )
    c = g.groupBy("gh").agg(F.count("*").alias("nd"))
    return (
        g.join(c, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.expr("count_if(nd >= 2)").alias("n_shared"),
        )
        .filter(F.col("n_shared") >= 1)
    )


@q(
    "scrub1_pii_redact",
    r"""SELECT c_custkey,
              regexp_replace(c_name, '\d+(\d{3})', '[ID-\1]', 'g')
                  AS name_scrubbed,
              len(regexp_extract_all(c_name, '\d{4,}')) AS n_redacted
       FROM customer""",
)
def scrub1_pii_redact(spark, sf_dir):
    # PII-style scrubbing: mask long digit runs (account/phone/SSN-like
    # identifiers) keeping a 3-digit audit tail, plus a per-row redaction
    # count for the compliance ledger. Pure regexp_replace/extract_all —
    # narrow, JVM-side, whole-stage-codegen'd, zero shuffle; at 10^12 rows
    # this is embarrassingly parallel and pushdown keeps only the two
    # touched columns in the scan.
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", r"\d+(\d{3})", "[ID-$1]").alias(
            "name_scrubbed"
        ),
        F.size(F.expr(r"regexp_extract_all(c_name, '\\d{4,}', 0)")).alias(
            "n_redacted"
        ),
    )


def _mixture_weight_table(d):
    """Per (source, lang) doc/token counts + the token-equalizing sampling
    weight in integer ppm — shared by mix1 (reports it) and samp2 (applies
    it), so the two can never drift apart. One map-side-combined groupBy
    over the corpus; the window runs over the GROUP table (sources × langs
    — tiny), so the single-partition window is a non-issue at any corpus
    scale. The ppm is computed in DOUBLE with the identical operation
    order on both engines (same IEEE ops → bit-identical results); a
    pure-int64 numerator (tot_tokens * 1e6) would wrap Spark's BIGINT at
    ~9.2e12 total tokens — inside the 100-TB target — while DuckDB's
    HUGEINT would not: silent engine divergence."""
    g = d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_spark_words())).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return (
        g.withColumn("tot_tokens", F.sum("n_tokens").over(w))
        .withColumn("n_groups", F.count("*").over(w))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            F.expr(
                "CAST(floor((1000000.0 * tot_tokens)"
                " / (n_groups * n_tokens)) AS BIGINT)"
            ).alias("weight_ppm"),
        )
    )


@q(
    "mix1_source_mix_weights",
    f"""WITH g AS (SELECT source, lang, count(*) AS n_docs,
                         sum(len({_duck_words()})) AS n_tokens
                  FROM documents GROUP BY source, lang)
    SELECT source, lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor((1000000.0 * (sum(n_tokens) OVER ()))
                      / (count(*) OVER () * n_tokens)) AS BIGINT)
               AS weight_ppm
    FROM g""",
)
def mix1_source_mix_weights(spark, sf_dir):
    # Training-mixture reweighting: per (source, lang) token counts and the
    # up/down-sampling weight (ppm) that equalizes token share across
    # groups — the domain-mixing step before sampling a training corpus.
    return _mixture_weight_table(t(spark, sf_dir, "documents"))


@q(
    "samp2_mixture_resample",
    f"""WITH g AS (SELECT source, lang, sum(len({_duck_words()})) AS n_tokens
                  FROM documents GROUP BY source, lang),
    w AS (SELECT source, lang,
                 least(1000000,
                       CAST(floor((1000000.0 * (sum(n_tokens) OVER ()))
                                  / (count(*) OVER () * n_tokens)) AS BIGINT))
                     AS keep_ppm
          FROM g)
    SELECT d.doc_id, d.source, d.lang, w.keep_ppm
    FROM documents d JOIN w USING (source, lang)
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 5))
               AS BIGINT) % 1000000 < w.keep_ppm""",
)
def samp2_mixture_resample(spark, sf_dir):
    # Applies mix1's token-equalizing mixture weights as a deterministic
    # downsample — the step that actually materializes the rebalanced
    # training corpus. Weights come from the SAME _mixture_weight_table as
    # mix1 (capped at 1.0 — upsampling is a replication concern, not a
    # filter); keep/drop decided by md5(doc_id) ppm so the sample is
    # reproducible and engine-identical. The weight table is sources x
    # langs (tiny) and broadcasts; the corpus pays one groupBy to learn
    # the weights and a narrow filtered scan to apply them — no
    # corpus-sized shuffle at any scale.
    d = t(spark, sf_dir, "documents")
    weights = _mixture_weight_table(d).select(
        "source",
        "lang",
        F.expr("least(1000000, weight_ppm)").alias("keep_ppm"),
    )
    ppm = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5), 16, 10)
        .cast("long")
        % 1000000
    )
    return (
        d.join(F.broadcast(weights), ["source", "lang"])
        .filter(ppm < F.col("keep_ppm"))
        .select("doc_id", "source", "lang", "keep_ppm")
    )


def chunk_corpus(docs, seq_len: int):
    """Shared sequence-packing kernel (chk1 + plans/export.py): fixed-size
    token chunks with stable (doc_id, chunk_idx) addresses. The word array
    is materialized ONCE per row; explode(sequence(...)) fans out to chunk
    starts and slice() reads the shared array — a narrow one-to-many
    projection, zero shuffles, embarrassingly parallel at 10^12 docs.
    Empty tokens are filtered from the word array itself (split of an
    empty/whitespace-only string yields [''] or ['','']; a trim-based
    prefilter misses tab/newline-only docs), so whitespace-only documents
    produce zero chunks and no ghost tokens, whatever the whitespace."""
    ws_clean = F.filter(_spark_words(), lambda x: x != "")
    d = (
        docs.select("doc_id", ws_clean.alias("ws"))
        .filter(F.size("ws") > 0)
        .withColumn(
            "n_chunks", F.ceil(F.size("ws") / F.lit(float(seq_len))).cast("int")
        )
    )
    g = F.col("g")
    return (
        d.select(
            "doc_id",
            "ws",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("g"),
        )
        .select(
            "doc_id",
            g.cast("int").alias("chunk_idx"),
            F.array_join(F.slice("ws", g * seq_len + 1, seq_len), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(seq_len), F.size("ws") - g * seq_len)
            .cast("int")
            .alias("n_tokens"),
        )
    )


@q(
    "chk1_token_chunks",
    f"""WITH w AS (SELECT doc_id,
                          list_filter({_duck_words()}, x -> x <> '') AS ws
                   FROM documents),
    c AS (SELECT doc_id, ws, CAST(ceil(len(ws) / 8.0) AS INT) AS n_chunks
          FROM w WHERE len(ws) > 0)
    SELECT doc_id, CAST(g AS INT) AS chunk_idx,
           array_to_string(ws[g*8+1 : g*8+8], ' ') AS chunk_text,
           CAST(least(8, len(ws) - g*8) AS INT) AS n_tokens
    FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(g)""",
)
def chk1_token_chunks(spark, sf_dir):
    # Sequence packing (the context-window packing step of LLM training-data
    # prep) at 8 tokens per chunk — delegates to the shared chunk_corpus
    # kernel, which plans/export.py runs in production at seq_len 256, so
    # the oracle-checked query and the job can never silently diverge.
    return chunk_corpus(t(spark, sf_dir, "documents"), 8)


@q(
    "hh1_hot_hosts",
    """WITH c AS (SELECT source || '.example.com' AS host,
                        count(*) AS n_rows,
                        CAST(sum(n_chars) AS BIGINT) AS n_bytes
                 FROM documents GROUP BY host),
    t AS (SELECT CAST(sum(n_bytes) AS BIGINT) AS total FROM c)
    SELECT host, n_rows, n_bytes,
           CAST(ceil(n_bytes / (total / 20.0)) AS INT) AS n_salts
    FROM c, t
    WHERE n_bytes > total / 20.0""",
)
def hh1_hot_hosts(spark, sf_dir):
    # Heavy-hitter detection — the learning step of adaptive skew salting
    # (functions/sqlfns.adaptive_salted_part_id uses this rule on row
    # counts: hot = any host above one partition budget total/n_parts;
    # here the budget is BYTE mass, the signal that actually stalls an
    # extraction task, and the above-average host set is non-empty even
    # on the row-uniform test corpus). Exposed as a driver-checkable
    # query: one map-side-combined aggregate per host (hosts << rows),
    # the 1-row total broadcast back. At 10^12 rows the host table is
    # the web's host set (~10^8) — still one cheap aggregate, no corpus
    # second-scan.
    c = (
        t(spark, sf_dir, "documents")
        .groupBy(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
        )
    )
    tot = c.agg(F.sum("n_bytes").cast("long").alias("total"))
    return (
        c.join(F.broadcast(tot))
        .filter(F.col("n_bytes") > F.col("total") / 20.0)
        .select(
            "host",
            "n_rows",
            "n_bytes",
            F.ceil(F.col("n_bytes") / (F.col("total") / F.lit(20.0)))
            .cast("int")
            .alias("n_salts"),
        )
    )


_BLOCKLIST = ["src1.example.com", "de.src2.example.com", "src5.example.com"]


@q(
    "url3_blocklist_filter",
    f"""WITH h AS (SELECT doc_id, lang || '.' || source || '.example.com' AS host
                  FROM documents),
    b(entry) AS (VALUES {", ".join(f"('{e}')" for e in _BLOCKLIST)}),
    blocked AS (SELECT DISTINCT doc_id FROM h JOIN b
                ON h.host = b.entry OR h.host LIKE '%.' || b.entry)
    SELECT h.doc_id, h.host FROM h
    WHERE h.doc_id NOT IN (SELECT doc_id FROM blocked)""",
)
def url3_blocklist_filter(spark, sf_dir):
    # Domain-blocklist filtering with subdomain semantics: a doc is dropped
    # if its host equals a blocklist entry OR sits under one (UT1-style
    # crawl blocklists). The oracle is the naive LIKE spec; the Spark form
    # is the shape that survives a 1M-entry blocklist: each host explodes
    # into its dot-suffix chain (bounded by label depth, ~5), the suffixes
    # equi-semi-join the BROADCAST blocklist (never a LIKE scan per
    # entry), and the hit-bounded blocked-id set anti-joins back. No
    # suffix trie, no per-entry pass — two broadcast hash joins.
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("lang"), F.lit("."), F.col("source"), F.lit(".example.com")
        ).alias("host"),
    )
    parts = F.split(F.col("host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(
            F.slice(parts, i, F.size(parts) - i + 1), "."
        ),
    )
    bl = spark.createDataFrame([(e,) for e in _BLOCKLIST], "entry string")
    blocked = (
        d.select("doc_id", F.explode(suffixes).alias("sfx"))
        .join(F.broadcast(bl), F.col("sfx") == F.col("entry"), "left_semi")
        .select("doc_id")
        .distinct()
    )
    return d.join(F.broadcast(blocked), "doc_id", "left_anti").select(
        "doc_id", "host"
    )


@q(
    "chk2_pack_offsets",
    f"""WITH d AS (SELECT doc_id, len({_duck_words()}) AS n FROM documents),
    c AS (SELECT doc_id, n,
                 sum(n) OVER (ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(cum - n AS BIGINT) AS tok_offset,
           CAST(floor((cum - n) / 256.0) AS BIGINT) AS seq_id
    FROM c""",
)
def chk2_pack_offsets(spark, sf_dir, _n_override: int | None = None):
    # Greedy document packing: assign every doc its global token offset and
    # the 256-token training sequence its first token lands in — the
    # dataset-builder step that concatenates a corpus into fixed-budget
    # sequences. The oracle is a global running sum; the Spark form is the
    # SCALABLE equivalent: a two-phase distributed prefix sum — per-block
    # token totals get block-start offsets from a window over blocks only,
    # joined back, and each block computes its local running sum in
    # parallel. A naive Window.orderBy(doc_id) over the corpus would
    # serialize 10^12 rows through one partition; this shape never
    # materializes a global order anywhere. Block size is ≈√N (derived
    # from the corpus row count — in production this scalar comes free
    # from table stats / the Iceberg snapshot row count), so at 10^12 docs
    # both the block table and each in-block sort are ~10^6 rows; the
    # offsets join is broadcast-hinted only while the block table is
    # dim-sized. _n_override is a test-only hook pinning the large-N plan.
    docs = t(spark, sf_dir, "documents")
    n_rows = (
        _n_override
        if _n_override is not None
        else table_rowcount(spark, sf_dir, "documents")
    )
    bs = prefix_sum_block_size(n_rows)
    d = docs.select(
        "doc_id",
        F.size(_spark_words()).alias("n"),
        (F.col("doc_id") / bs).cast("long").alias("blk"),
    )
    blk_tot = d.groupBy("blk").agg(F.sum("n").alias("blk_tot"))
    # block offsets via _exclusive_offsets: a plain bounded window while
    # the block table fits one task, recursing into super-blocks beyond —
    # the corpus never funnels through a global window at ANY level
    offsets = _exclusive_offsets(blk_tot, "blk", "blk_tot", n_rows / bs + 1)
    w_loc = Window.partitionBy("blk").orderBy("doc_id")
    return (
        d.join(_maybe_broadcast(offsets, n_rows // bs + 1), "blk")
        .withColumn("cum", F.col("off") + F.sum("n").over(w_loc))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            (F.col("cum") - F.col("n")).cast("long").alias("tok_offset"),
            F.floor((F.col("cum") - F.col("n")) / F.lit(256.0)).alias(
                "seq_id"
            ),
        )
    )


@q(
    "tx9_rare_terms",
    f"""WITH e AS (SELECT doc_id, unnest({_duck_words()}) AS word
                  FROM documents),
    dw AS (SELECT DISTINCT doc_id, word FROM e WHERE word <> ''),
    df AS (SELECT word, count(*) AS df FROM dw GROUP BY word),
    r AS (SELECT dw.doc_id, dw.word, df.df,
                 row_number() OVER (PARTITION BY dw.doc_id
                                    ORDER BY df.df, dw.word) AS rk
          FROM dw JOIN df USING (word))
    SELECT doc_id, word, CAST(df AS BIGINT) AS df, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 3""",
)
def tx9_rare_terms(spark, sf_dir):
    # Per-document distinctive-term extraction: the 3 corpus-rarest words
    # of each doc, tf-idf's argmax reduced to integer arithmetic (rank by
    # document frequency with a lexical tiebreak) so both engines agree
    # bit-for-bit — no log(), no float ordering hazards. Shape at scale:
    # the (doc, word) distinct is one shuffle with map-side partials; the
    # df table is vocabulary-sized (Heaps' law: sublinear in corpus) and
    # joins back on the word key; the top-k window partitions by doc_id —
    # never a global sort, never all-pairs.
    e = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_spark_words()).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    dfreq = e.groupBy("word").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "word")
    return (
        e.join(dfreq, "word")
        .select(
            "doc_id",
            "word",
            F.col("df").alias("df"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .select("doc_id", "word", "df", F.col("rk").cast("int").alias("rk"))
    )


# =========================================================================
# Multimodal plumbing (binary payload → typed metadata; decode stubbed)
# =========================================================================


@q(
    "mm1_binary_meta",
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS payload_len,
              CAST(ceil(length(text) / 256.0) AS BIGINT) AS n_patches,
              ascii(substring(text, 1, 1)) AS first_byte
       FROM documents""",
)
def mm1_binary_meta(spark, sf_dir):
    # Multimodal columns: opaque binary payload + typed metadata, processed
    # by an Arrow-batched mapInPandas stage. The "decode" here is a
    # deterministic stub (container has no image/audio libs — see
    # operators/multimodal.py for the real-plumbing stub surface); the
    # Spark-side schema/batching/UDF shape is the real, tested thing.
    from greenocr_spark.operators.multimodal import binary_meta

    payload = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return binary_meta(payload, id_col="doc_id")


# =========================================================================
# Flagship extraction queries
# =========================================================================

def _wrapped_pages(d):
    """Wrap each document in the canonical boilerplate-laden page whose
    extraction has the closed-form oracle _WRAP_ORACLE (and the host
    closed form of ex6). ONE definition — ex1 and ex6's oracles are only
    valid against this exact byte sequence."""
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit(
            '<html><head><title>Doc</title></head><body>'
            '<nav><a href="/">Home</a> <a href="/about">About</a></nav><p>'
        ),
        F.col("text"),
        F.lit('</p><footer><a href="/terms">Terms</a></footer></body></html>'),
    )
    return d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))


_WRAP_ORACLE = """
    SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN length(regexp_replace(trim(text), '\\s+', ' ', 'g')) >= 15
                THEN regexp_replace(trim(text), '\\s+', ' ', 'g') ELSE '' END AS text
    FROM documents
"""


@q(
    "ex6_host_report",
    """WITH e AS (
        SELECT source || '.example.com' AS host,
               CASE WHEN length(regexp_replace(trim(text), '\\s+', ' ', 'g')) >= 15
                    THEN regexp_replace(trim(text), '\\s+', ' ', 'g') ELSE '' END AS t
        FROM documents)
    SELECT host, count(*) AS n_docs,
           CAST(sum(length(t)) AS BIGINT) AS text_chars,
           CAST(sum(CASE WHEN t = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
    FROM e GROUP BY host""",
)
def ex6_host_report(spark, sf_dir):
    # Crawl-ops observability: per-host extraction rollup (docs, extracted
    # bytes, empty-extraction count) over the full pipeline — the report a
    # crawl operator watches to spot hosts whose markup defeats extraction.
    # Runs the real extract stage on ex1's wrapped pages, then one groupBy
    # on the parsed host; the oracle is the closed form ex1's wrapper
    # guarantees. At 10^12 rows this is the map-side-combined host rollup
    # (#hosts << #rows), the same shape as the salting stats pass.
    from greenocr_spark.functions.sqlfns import host_expr
    from greenocr_spark.operators.extract import extract_pages

    pages = _wrapped_pages(t(spark, sf_dir, "documents"))
    ext = extract_pages(pages).withColumn("host", host_expr("url"))
    return ext.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("text_chars"),
        F.sum(F.when(F.col("text") == "", 1).otherwise(0)).cast("long").alias("n_empty"),
    )


@q("ex1_extract_wrapped", _WRAP_ORACLE)
def ex1_extract_wrapped(spark, sf_dir):
    # THE flagship, value-checked end to end: wrap each document in a
    # boilerplate-laden page (nav/title/footer, all link-dense or short →
    # classified boilerplate), run the full Arrow-batched extraction
    # pipeline, and the oracle is the closed form the spec guarantees:
    # extracted text == canonical main paragraph.
    from greenocr_spark.operators.extract import extract_pages

    pages = _wrapped_pages(t(spark, sf_dir, "documents"))
    return extract_pages(pages).select("url", "text")


@q(
    "ex2_extract_fixture_pages",
    """SELECT CAST(387176475572252077 AS BIGINT) AS corpus_hash,
              CAST(400 AS BIGINT) AS n_docs""",
)
def ex2_extract_fixture_pages(spark, sf_dir):
    # Full degradation-matrix pipeline over generated fixture pages
    # (entity soup, unclosed tags, charset quirks, PDFs, ...), reduced to the
    # ex4-style order-insensitive sha256-xor corpus hash so the driver gets a
    # hash-green byte-identity check (VERDICT r04 task 2 — closes the
    # no_oracle class). The literal is computed by the pure-Python reference
    # extractor over the same 400-page seed-42 fixture
    # (tests/test_spark_pipeline.py::test_fixture400_hashes_frozen); row-level
    # byte identity is additionally pytest-pinned in test_spark_pipeline.py.
    from greenocr_spark.operators.extract import extract_pages

    pages = spark.read.parquet(_fixture_pages_path(400))
    return _corpus_hash_reduce(extract_pages(pages))


@q(
    "ex4_corpus_hash",
    """SELECT CAST(1061150180202206482 AS BIGINT) AS corpus_hash,
              CAST(1500 AS BIGINT) AS n_docs""",
)
def ex4_corpus_hash(spark, sf_dir):
    # Driver-checkable byte-identity for the binary extraction path (VERDICT
    # r02 item 2): run the full Arrow-batched pipeline over the deterministic
    # 1500-page seed-42 fixture corpus and reduce every output row
    # (url, text, spans, counts, kind) to one 60-bit sha256-prefix hash,
    # combined with bit_xor — order-insensitive and map-side combinable, so
    # the same reduction is a valid corpus checksum at 10^12 rows (no sorted
    # global concat needed). The oracle literal is computed by the pure-Python
    # single-node reference extractor (scripts note in tests/test_golden
    # corpus-hash test) — matching here proves the distributed pipeline is
    # byte-identical to the golden extractor, per the north rule.
    from greenocr_spark.operators.extract import extract_pages

    pages = spark.read.parquet(_fixture_pages_path(1500))
    return _corpus_hash_reduce(extract_pages(pages))


@q(
    "ex5_warc_corpus_hash",
    """SELECT CAST(1061150180202206482 AS BIGINT) AS corpus_hash,
              CAST(1500 AS BIGINT) AS n_docs""",
)
def ex5_warc_corpus_hash(spark, sf_dir):
    # The WARC ingestion face (sources/warc.py): the SAME 1500-page corpus,
    # serialized into Common-Crawl-style WARC segment files, read back
    # through the binaryFile + Content-Length parser, extracted, and
    # reduced with the identical xor hash as ex4. Matching ex4's frozen
    # golden literal proves WARC path ≡ parquet path ≡ pure-Python
    # reference, byte for byte — container-format independence of the
    # whole pipeline.
    from greenocr_spark.operators.extract import extract_pages
    from greenocr_spark.sources.warc import read_warc

    pages = read_warc(spark, _fixture_warc_dir(1500)).select("url", "html")
    return _corpus_hash_reduce(extract_pages(pages))


def _corpus_hash_reduce(ext):
    """Reduce an extraction output to one (corpus_hash, n_docs) row: per-row
    sha256 prefix (60 bits) over url/text/spans/counts joined on unit
    separators, combined with bit_xor — order-insensitive, map-side
    combinable, a valid corpus checksum at any scale."""
    spans_str = F.array_join(
        F.transform(
            "spans",
            lambda s: F.concat_ws(",", s["block_idx"], s["start"], s["end"], s["cls"]),
        ),
        ";",
    )
    canon = F.concat_ws(
        "\x1f",
        F.col("url"),
        F.col("text"),
        spans_str,
        F.concat_ws(",", "n_blocks", "n_content", "n_boilerplate", "kind"),
    )
    row_h = F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("long")
    return ext.select(row_h.alias("h")).agg(
        F.bit_xor("h").alias("corpus_hash"), F.count("*").alias("n_docs")
    )


@q(
    "st8_stream_warc_hash",
    """SELECT CAST(1061150180202206482 AS BIGINT) AS corpus_hash,
              CAST(1500 AS BIGINT) AS n_docs""",
)
def st8_stream_warc_hash(spark, sf_dir):
    # §2.10 × WARC: the streaming ingestion face over a WARC-drop directory
    # (stream_warc → extract_pages → xor-hash agg, availableNow drain).
    # Third independent execution path — batch-parquet (ex4), batch-WARC
    # (ex5), STREAMING-WARC (this) — all required to land on the same
    # frozen pure-Python golden literal. mapInPandas and the extraction
    # stage run unmodified under Structured Streaming because every stage
    # is a pure DataFrame→DataFrame function.
    import tempfile
    import uuid as _uuid

    from greenocr_spark.operators.extract import extract_pages
    from greenocr_spark.sources.warc import stream_warc

    pages = stream_warc(spark, _fixture_warc_dir(1500)).select("url", "html")
    hashed = _corpus_hash_reduce(extract_pages(pages))
    name = f"st8_{_uuid.uuid4().hex[:8]}"
    qh = (
        hashed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="st8_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        # never fall through to the sink on timeout: an empty/partial
        # memory table would masquerade as a hash mismatch while the
        # abandoned query kept running
        qh.stop()
        raise TimeoutError("st8 streaming drain did not finish within 600s")
    return spark.table(name)


def _fixture_eval_grams_dir(spark, sf_dir: str) -> str:
    # The dec1 eval-set gram table, materialized once per sf_dir (keyed by
    # basename + path hash so distinct dirs never collide) with the same
    # atomic-rename publish as the other fixtures. The one-time build scans
    # documents; the dec1 QUERY then reads only this side table plus one
    # corpus scan — the production decontamination shape, where benchmark
    # grams live in their own maintained table.
    import hashlib
    import uuid as _uuid

    ap = os.path.abspath(sf_dir.rstrip("/"))
    tag = f"{os.path.basename(ap)}_{hashlib.md5(ap.encode()).hexdigest()[:8]}"
    d = f"/tmp/greenocr_fixture_evalgrams_{tag}"
    if not os.path.isdir(d):
        tmp = f"{d}.build_{_uuid.uuid4().hex[:8]}"
        (
            t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 97 == 0)
            .select("doc_id", _spark_words().alias("ws"))
            .filter(F.size("ws") >= 3)
            .select(F.explode(_spark_gram3_hashes()).alias("gh"))
            .distinct()
            .write.mode("overwrite")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, d)
        except OSError:  # lost the publish race — winner's dir is complete
            import shutil as _shutil

            _shutil.rmtree(tmp, ignore_errors=True)
    return d


def _fixture_warc_dir(n: int) -> str:
    # build into a private temp dir, then publish by atomic rename — two
    # concurrent processes can never observe (or truncate) half-written
    # segments; the loser's rename simply fails and it uses the winner's
    d = f"/tmp/greenocr_fixture_warc_{n}"
    if not os.path.isdir(d):
        import uuid as _uuid

        from greenocr_spark.fixtures import make_pages
        from greenocr_spark.sources.warc import write_warc_dir

        tmp = f"{d}.build_{_uuid.uuid4().hex[:8]}"
        write_warc_dir(make_pages(n, seed=42), tmp, n_segments=8)
        try:
            os.rename(tmp, d)
        except OSError:  # lost the publish race — winner's dir is complete
            import shutil as _shutil

            _shutil.rmtree(tmp, ignore_errors=True)
    return d


def _fixture_pages_path(n: int) -> str:
    # own directory (not bare /tmp) so the streaming file source can list it
    d = f"/tmp/greenocr_fixture_pages_{n}"
    path = os.path.join(d, "pages.parquet")
    if not os.path.exists(path):
        from greenocr_spark.fixtures import write_pages_parquet

        os.makedirs(d, exist_ok=True)
        write_pages_parquet(path, n)
    return path


# =========================================================================
# Streaming face (availableNow batch over the same stage functions)
# =========================================================================


def _stream_table_dir(sf_dir: str, table: str) -> str:
    """Staging dir for the file streaming source (it requires a directory):
    expose a single table parquet through a symlinked dir keyed on
    (sf_dir, table) — read-only testdata untouched. Shared by every st*
    query."""
    import hashlib as _hashlib

    key = _hashlib.md5(f"{sf_dir}:{table}".encode()).hexdigest()[:8]
    stream_dir = f"/tmp/greenocr_stream_{table.split('.')[0]}_{key}"
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, table)
    try:
        # idempotent create — a concurrent process sharing this sf_dir may
        # win the race between an exists() check and symlink() (ADVICE r02)
        os.symlink(os.path.abspath(f"{sf_dir}/{table}"), link)
    except FileExistsError:
        pass
    return stream_dir


def _stream_events_dir(sf_dir: str) -> str:
    return _stream_table_dir(sf_dir, "events.parquet")


@q(
    "st1_stream_hourly",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              event_type, count(*) AS n
       FROM events GROUP BY 1, 2""",
)
def st1_stream_hourly(spark, sf_dir):
    # S12/§2.10: Structured Streaming ingestion face — file source over the
    # same events data, watermarked tumbling window, availableNow trigger,
    # memory sink. Same results as the batch oracle because availableNow
    # drains everything.
    import uuid as _uuid

    schema = t(spark, sf_dir, "events").schema
    name = f"st1_{_uuid.uuid4().hex[:8]}"
    stream_dir = _stream_events_dir(sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .parquet(stream_dir)
        # parquet stores TIMESTAMP_NTZ; watermarks need TIMESTAMP (session UTC)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
        )
    )
    qh = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query into the session
        raise TimeoutError("stream did not drain within 600s")
    return spark.table(name)


@q(
    "st6_stream_static_join",
    """SELECT c.c_mktsegment AS segment, count(*) AS n,
              round(sum(e.value), 4) AS total_value
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1""",
)
def st6_stream_static_join(spark, sf_dir):
    # §2.10 stream-static join: the streaming side (events file source)
    # enriches against a STATIC dimension (customer) — Spark broadcasts the
    # static side into every micro-batch, no stream-stream state. This is
    # the standard streaming-enrichment shape (Kafka events × dimension
    # table) and at 10^12 scale the static side stays a broadcast as long
    # as the dim fits executor memory.
    import uuid as _uuid

    schema = t(spark, sf_dir, "events").schema
    stream_dir = _stream_events_dir(sf_dir)
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    name = f"st6_{_uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .parquet(stream_dir)
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    qh = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query into the session
        raise TimeoutError("stream did not drain within 600s")
    return spark.table(name)


@q(
    "ex3_extract_pdf_branch",
    """SELECT CAST(903280726741984231 AS BIGINT) AS corpus_hash,
              CAST(25 AS BIGINT) AS n_docs""",
)
def ex3_extract_pdf_branch(spark, sf_dir):
    # The PDF router branch in isolation: fixture rows whose payload carries
    # the %PDF- magic go through the layout-parse mini-parser (reading-order
    # spans), reduced to the ex4-style xor corpus hash. The literal is the
    # pure-Python parser's value over the 25 PDF rows of the 400-page seed-42
    # fixture (tests/test_spark_pipeline.py::test_fixture400_hashes_frozen) —
    # hash-green proves the distributed PDF branch is byte-identical to the
    # reference parser (VERDICT r04 task 2).
    from greenocr_spark.functions.sqlfns import pdf_magic_expr
    from greenocr_spark.operators.extract import extract_pages

    pages = spark.read.parquet(_fixture_pages_path(400)).filter(pdf_magic_expr("html"))
    return _corpus_hash_reduce(extract_pages(pages))


@q(
    "st3_stream_extract",
    """SELECT CAST(387176475572252077 AS BIGINT) AS corpus_hash,
              CAST(400 AS BIGINT) AS n_docs""",
)
def st3_stream_extract(spark, sf_dir):
    # §2.10: the SAME extract_pages stage function run under Structured
    # Streaming (stages are pure DataFrame→DataFrame, so the batch pipeline
    # is the streaming pipeline). File source, availableNow drain, memory
    # sink; at scale this is the Kafka/WARC-drop ingestion face. Reduced to
    # the ex4-style xor corpus hash in complete mode — the literal is the
    # SAME 400-page value ex2 pins (streaming path ≡ batch path ≡ pure-Python
    # reference, byte for byte; VERDICT r04 task 2).
    import tempfile
    import uuid as _uuid

    from greenocr_spark.streaming.face import (
        extract_stream,
        run_available_now,
        stream_pages,
    )

    stream_dir = os.path.dirname(_fixture_pages_path(400))
    name = f"st3_{_uuid.uuid4().hex[:8]}"
    stream = _corpus_hash_reduce(extract_stream(stream_pages(spark, stream_dir)))
    qh = run_available_now(
        stream, name, tempfile.mkdtemp(prefix="st3_ckpt_"), output_mode="complete"
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query into the session
        raise TimeoutError("stream did not drain within 600s")
    return spark.table(name)


@q(
    "st4_stream_dedup",
    """SELECT user_id, event_type, count(*) AS n FROM (
         SELECT DISTINCT user_id, event_type, ts FROM events)
       GROUP BY user_id, event_type""",
)
def st4_stream_dedup(spark, sf_dir):
    # §2.10 dropDuplicatesWithinWatermark: streaming dedup on
    # (user_id, event_type, ts) with event-time state expiry, then a
    # per-key count. availableNow drains one batch, so the result equals
    # the batch DISTINCT (events has no exact dupes; identity holds).
    import uuid as _uuid

    schema = t(spark, sf_dir, "events").schema
    stream_dir = _stream_events_dir(sf_dir)
    name = f"st4_{_uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .parquet(stream_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "ts"])
    )
    qh = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query into the session
        raise TimeoutError("stream did not drain within 600s")
    return (
        spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )


@q(
    "st7_stream_stream_join",
    """SELECT a.event_id AS view_id, b.event_id AS click_id, a.user_id
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND a.event_type = 'view' AND b.event_type = 'click'
        AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR""",
)
def st7_stream_stream_join(spark, sf_dir):
    # §2.10 stream-stream JOIN — the hardest streaming op: both sides are
    # unbounded, so Spark buffers each in watermark-bounded state and the
    # time-range predicate (click within 6h after view) bounds how long a
    # view row must be retained. availableNow drains the finite source, so
    # the emitted pairs equal the batch self-join oracle. At 10^12 scale
    # state size = rows inside the watermark horizon per key — bounded by
    # construction, the reason stream-stream joins REQUIRE the time bound.
    import uuid as _uuid

    schema = t(spark, sf_dir, "events").schema
    stream_dir = _stream_events_dir(sf_dir)

    def side(kind, alias):
        return (
            spark.readStream.schema(schema)
            .parquet(stream_dir)
            .filter(F.col("event_type") == kind)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            # generous watermark: state retention only — a drained finite
            # source must not drop any in-horizon match
            .withWatermark("ts", "30 days")
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
            )
        )

    views, clicks = side("view", "view"), side("click", "click")
    joined = views.join(
        clicks,
        (F.col("view_user") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")),
    ).select(
        F.col("view_id").alias("view_id"),
        F.col("click_id").alias("click_id"),
        F.col("view_user").alias("user_id"),
    )
    name = f"st7_{_uuid.uuid4().hex[:8]}"
    qh = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query into the session
        raise TimeoutError("stream did not drain within 600s")
    return spark.table(name)


@q(
    "st5_session_window",
    """WITH g AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM g)
    SELECT user_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM s GROUP BY user_id, sid""",
)
def st5_session_window(spark, sf_dir):
    # §2.10 session windows: F.session_window(gap) under Structured
    # Streaming — merges events closer than the gap into one state window.
    # Oracle is the equivalent batch sessionization (w9 logic): with
    # microsecond timestamps an exactly-at-gap boundary never occurs, so
    # strict-vs-inclusive boundary semantics coincide.
    import uuid as _uuid

    schema = t(spark, sf_dir, "events").schema
    stream_dir = _stream_events_dir(sf_dir)
    name = f"st5_{_uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .parquet(stream_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("start_ts"))
        .select(
            "user_id", "n_events",
            F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )
    qh = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query into the session
        raise TimeoutError("stream did not drain within 600s")
    return spark.table(name)


@q(
    "mm2_frame_sample",
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                         octet_length(encode(text)) AS L
                  FROM documents),
    s AS (SELECT doc_id, hx, L, greatest(L // 4, 1) AS step FROM h),
    f AS (SELECT doc_id, hx, L, step, unnest([0, 1, 2, 3]) AS frame_idx FROM s),
    c AS (SELECT doc_id, frame_idx, hx, frame_idx * step AS off,
                 least(greatest(L - frame_idx * step, 0), 8) AS clen
          FROM f)
    SELECT doc_id, frame_idx,
           CASE WHEN clen = 0 THEN '0'
                ELSE array_to_string(list_transform(range(1, clen + 1),
                       i -> CAST(('0x' || substr(hx, (off + i - 1) * 2 + 1, 2))
                                 AS INTEGER)), ' ')
           END AS feature_bytes,
           'stub-decode' AS note
    FROM c""",
)
def mm2_frame_sample(spark, sf_dir):
    # Multimodal one-to-many: video-style frame sampling over opaque binary
    # payloads (mapInPandas, array<float> features). Decode is a deterministic
    # stub (no image libs in container); batching/schema plumbing is real.
    # The float32 feature vector is serialized for the driver hash by
    # recovering the exact source bytes (round(x*255) inverts b/255.0 with
    # margin far above float32 error) — no float formatting divergence, and
    # pandas can hash the string. The array<float> surface is pytest-covered.
    from greenocr_spark.operators.multimodal import frame_sample

    payload = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    fs = frame_sample(payload, id_col="doc_id", n_frames=4)
    return fs.select(
        "doc_id",
        "frame_idx",
        F.array_join(
            F.transform("feature", lambda x: F.round(x * 255).cast("int").cast("string")),
            " ",
        ).alias("feature_bytes"),
        "note",
    )


@q(
    "st2_stateful_per_user",
    """SELECT user_id, count(*) AS n_events, round(max(value), 6) AS max_value
       FROM events GROUP BY user_id""",
)
def st2_stateful_per_user(spark, sf_dir):
    # §2.10 custom stateful streaming: applyInPandasWithState keyed on
    # user_id, accumulating (count, max) in explicit GroupState — the
    # arbitrary-stateful-operator surface. availableNow drains the source,
    # so the final state equals the batch oracle (count/max are
    # order-insensitive, safe to value-check).
    import uuid as _uuid

    import pandas as _pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        DoubleType,
        StructField,
        StructType,
    )

    schema = t(spark, sf_dir, "events").schema
    stream_dir = _stream_events_dir(sf_dir)

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("mx", DoubleType())]
    )

    def upd(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [round(mx, 6)]}
        )

    name = f"st2_{_uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .parquet(stream_dir)
        .select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            upd, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    qh = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query into the session
        raise TimeoutError("stream did not drain within 600s")
    # one source file → one micro-batch → one output row per user (final)
    return spark.table(name).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value")
    )


# ---- quant1: int8 scalar quantization + top-k (ANN compression path) ------

_Q1_SCALE = (
    "greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    " / 127.0, 1e-12)"
)


@q(
    "quant1_int8_topk",
    f"""WITH s AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
                          {_Q1_SCALE} AS sc
                   FROM embeddings),
    z AS (SELECT vec_id, emb,
                 list_transform(emb, x ->
                     greatest(-127.0, least(127.0, floor(x / sc + 0.5)))) AS qc
          FROM s),
    qv AS (SELECT qc AS qq, emb AS qemb FROM z WHERE vec_id = 0),
    c AS (SELECT e.vec_id,
                 round(list_sum(list_transform(range(1, 65), i -> e.qc[i] * q.qq[i]))
                       / (sqrt(list_sum(list_transform(range(1, 65), i -> e.qc[i] * e.qc[i])))
                          * sqrt(list_sum(list_transform(range(1, 65), i -> q.qq[i] * q.qq[i])))),
                       4) AS cos_q,
                 round(list_sum(list_transform(range(1, 65), i -> e.emb[i] * q.qemb[i]))
                       / (sqrt(list_sum(list_transform(range(1, 65), i -> e.emb[i] * e.emb[i])))
                          * sqrt(list_sum(list_transform(range(1, 65), i -> q.qemb[i] * q.qemb[i])))),
                       4) AS cos_exact
          FROM z e, qv q WHERE e.vec_id <> 0)
    SELECT vec_id, cos_q, cos_exact FROM c
    ORDER BY cos_q DESC, vec_id LIMIT 10""",
)
def quant1_int8_topk(spark, sf_dir):
    # Int8 scalar quantization — the ANN memory-compression scale path:
    # 64 float32 dims (256 B) -> 64 int8 codes + one float scale (~68 B),
    # a ~4x footprint cut that at 10^12 vectors decides whether the index
    # fits executor memory. Symmetric per-vector max-abs scaling means the
    # scales cancel in cosine, so ranking over int8 codes IS the
    # reconstructed-vector cosine; the quantized dot products are integer
    # arithmetic (exact in float64), so the DuckDB twin matches
    # deterministically regardless of summation order. cos_exact is carried
    # alongside so the output itself exhibits the quantization error.
    # Plan shape: narrow quantization map + broadcast 1-row query +
    # TakeOrderedAndProject — the corpus is scanned once, never shuffled.
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select(
        "vec_id",
        dbl.alias("emb"),
        F.greatest(
            F.array_max(F.transform(dbl, lambda x: F.abs(x))) / F.lit(127.0),
            F.lit(1e-12),
        ).alias("sc"),
    )
    quantized = base.select(
        "vec_id",
        "emb",
        F.transform(
            F.col("emb"),
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(x / F.col("sc") + F.lit(0.5)).cast("double"),
                ),
            ),
        ).alias("qc"),
    )
    qv = quantized.filter(F.col("vec_id") == 0).select(
        F.col("qc").alias("qq"), F.col("emb").alias("qemb")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s0, v: s0 + v
        )

    # the query-side norms are loop-invariant — compute them ONCE in the
    # 1-row broadcast side instead of re-aggregating 64 elements per corpus
    # row (cuts per-row HOF work from 6 array aggregates to 4); the per-row
    # float expression tree is unchanged, so results are bit-identical
    qv = qv.select(
        "qq",
        "qemb",
        F.sqrt(_dot(F.col("qq"), F.col("qq"))).alias("qqn"),
        F.sqrt(_dot(F.col("qemb"), F.col("qemb"))).alias("qen"),
    )

    def _cos(a, b, bnorm):
        return _dot(a, b) / (F.sqrt(_dot(a, a)) * bnorm)

    return (
        quantized.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(_cos(F.col("qc"), F.col("qq"), F.col("qqn")), 4).alias("cos_q"),
            F.round(
                _cos(F.col("emb"), F.col("qemb"), F.col("qen")), 4
            ).alias("cos_exact"),
        )
        .orderBy(F.desc("cos_q"), "vec_id")
        .limit(10)
    )


@q(
    "shuf1_train_order",
    """WITH s AS (SELECT doc_id,
                         md5(CAST(doc_id AS VARCHAR) || ':42') AS skey
                  FROM documents)
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
    FROM s""",
)
def shuf1_train_order(spark, sf_dir, _n_override: int | None = None):
    # Deterministic training-order shuffle: every doc gets a reproducible
    # global position in a seeded pseudorandom permutation (the
    # dataset-builder step that randomizes training order — it must be
    # deterministic so a resumed/restarted training run sees the same
    # order). The oracle is a global row_number over the md5 shuffle key;
    # the Spark form is the scalable equivalent: the key's first k hex
    # chars partition the corpus into 16^k uniform blocks (a PREFIX of the
    # sort key, so block order + in-block order = global order), per-block
    # counts (16^k-row table) get block-start offsets from a window over
    # blocks only, joined back, and each block ranks locally in parallel.
    # No global-order window ever sees the corpus — the same two-phase
    # prefix-sum shape as chk2, keyed by the shuffle hash. k is derived
    # from the corpus row count (free from table stats in production):
    # 10^12 docs → k=5 → 1M blocks × ~1M rows, so block count scales with
    # the corpus instead of capping parallelism at a constant; the offsets
    # join is broadcast-hinted only while the block table is dim-sized.
    # _n_override is a test-only hook pinning the large-N plan.
    docs = t(spark, sf_dir, "documents")
    n_rows = (
        _n_override
        if _n_override is not None
        else table_rowcount(spark, sf_dir, "documents")
    )
    k = prefix_sum_hex_len(n_rows)
    c = docs.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))).alias(
            "skey"
        ),
        # numeric block key: fixed-length lowercase hex is ordered the same
        # lexicographically and numerically, and a numeric key lets the
        # offsets computation recurse into key//fanout super-blocks
    ).withColumn(
        "blk", F.conv(F.substring("skey", 1, k), 16, 10).cast("long")
    )
    blk_n = c.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
    offsets = _exclusive_offsets(blk_n, "blk", "n", float(16**k))
    w_loc = Window.partitionBy("blk").orderBy("skey", "doc_id")
    return (
        c.join(_maybe_broadcast(offsets, 16**k), "blk")
        .select(
            "doc_id",
            (F.col("off") + F.row_number().over(w_loc) - 1)
            .cast("long")
            .alias("pos"),
        )
    )


@q(
    "cdc1_snapshot_diff",
    """WITH base AS (SELECT doc_id,
                            'https://ex.org/' || source || '/' ||
                                CAST(doc_id AS VARCHAR) AS url,
                            text
                     FROM documents),
    old AS (SELECT url, md5(text) AS oh FROM base WHERE doc_id % 13 <> 0),
    new AS (SELECT url,
                   md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                            ELSE text END) AS nh
            FROM base WHERE doc_id % 17 <> 0),
    j AS (SELECT o.url AS ou, n.url AS nu, o.oh, n.nh
          FROM old o FULL OUTER JOIN new n ON o.url = n.url)
    SELECT CASE WHEN ou IS NULL THEN 'added'
                WHEN nu IS NULL THEN 'deleted'
                WHEN oh = nh THEN 'unchanged'
                ELSE 'changed' END AS status,
           count(*) AS n
    FROM j GROUP BY 1 ORDER BY status""",
)
def cdc1_snapshot_diff(spark, sf_dir):
    # Recrawl change-data-capture: diff two crawl snapshots by url into
    # added / deleted / changed / unchanged — the incremental-refresh
    # planning step (plans/incremental.py consumes exactly this signal) as
    # an oracle-checked query. The two snapshots are carved
    # deterministically out of documents (doc_id % 13 / % 17 membership,
    # % 5 text edits) so the query is self-contained. Scale shape: content
    # hashes are computed NARROW before the join so the full-outer join
    # carries (url, 32-byte hash), never text; a url-keyed full outer join
    # cannot broadcast, so it shuffle-joins co-partitioned on url — the
    # right 10^12-row shape (bucket both snapshots by url to elide the
    # exchange entirely) — and the status rollup aggregates with map-side
    # partials.
    base = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://ex.org/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    old = base.filter(F.col("doc_id") % 13 != 0).select(
        "url", F.md5("text").alias("oh"), F.lit(True).alias("in_old")
    )
    new = base.filter(F.col("doc_id") % 17 != 0).select(
        "url",
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("nh"),
        F.lit(True).alias("in_new"),
    )
    status = (
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "deleted")
        .when(F.col("oh") == F.col("nh"), "unchanged")
        .otherwise("changed")
    )
    return (
        old.join(new, "url", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@q(
    "idx1_inverted_index",
    f"""WITH e AS (SELECT DISTINCT doc_id, unnest({_duck_words()}) AS w
                   FROM documents),
    t2 AS (SELECT doc_id, w FROM e WHERE w <> ''),
    d AS (SELECT w, count(*) AS df FROM t2 GROUP BY w),
    r AS (SELECT doc_id, w,
                 row_number() OVER (PARTITION BY w ORDER BY doc_id) AS rk
          FROM t2)
    SELECT r.w AS term, CAST(d.df AS BIGINT) AS df,
           string_agg(CAST(r.doc_id AS VARCHAR), ' ' ORDER BY r.doc_id)
               AS postings
    FROM r JOIN d USING (w) WHERE r.rk <= 5
    GROUP BY r.w, d.df""",
)
def idx1_inverted_index(spark, sf_dir):
    # Inverted-index build (term -> df + postings): the search/retrieval
    # side of a training-data platform. The scale hazard is the postings
    # list itself — collect_list over a stopword's 10^12-row posting set is
    # an OOM; here postings are BOUNDED to the 5 smallest doc_ids via a
    # per-term row_number window BEFORE any list is materialized, and df
    # comes from a count over the same per-term partitioning, so one
    # word-keyed exchange serves window + count + the bounded collect.
    e = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_spark_words()).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    r = e.withColumn(
        "rk", F.row_number().over(Window.partitionBy("w").orderBy("doc_id"))
    ).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("w"))
    )
    return (
        r.filter(F.col("rk") <= 5)
        .groupBy(F.col("w").alias("term"), F.col("df").cast("long").alias("df"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                " ",
            ).alias("postings")
        )
    )


# GPT-2-ish pretokenizer classes: contraction / letter run / digit run /
# punctuation run. Same regex semantics in Java (Spark) and RE2 (DuckDB):
# no lookarounds, no \p classes — plain alternation over ASCII classes.
_TOK1_RE = r"'[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\s]+"


@q(
    "tok1_pretokenize",
    """WITH s AS (SELECT doc_id,
                         regexp_extract_all(lower(text),
                             '''[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\\s]+') AS tk
                  FROM documents)
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_tok,
           CAST(len(list_filter(tk, x -> regexp_matches(x, '^[a-z]')))
                AS BIGINT) AS n_alpha,
           CAST(len(list_filter(tk, x -> regexp_matches(x, '^[0-9]')))
                AS BIGINT) AS n_num,
           CAST(len(list_filter(tk,
                x -> NOT regexp_matches(x, '^[a-z0-9]'))) AS BIGINT) AS n_punct
    FROM s""",
)
def tok1_pretokenize(spark, sf_dir):
    # BPE-style pretokenization counts: split text with the GPT-2-shaped
    # pretokenizer regex (contraction | letter run | digit run | punct run)
    # and report per-class token counts — the token-budget accounting a
    # training-data pipeline runs before the real BPE merge (which is
    # vocabulary-dependent; the regex pass is the corpus-side, scale-heavy
    # step). Pure narrow projection: regexp_extract_all + array filters,
    # zero exchanges, JVM-side codegen throughout.
    tk = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK1_RE), F.lit(0))
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", tk.alias("tk"))
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tok"),
            F.size(F.filter(F.col("tk"), lambda x: x.rlike("^[a-z]")))
            .cast("long")
            .alias("n_alpha"),
            F.size(F.filter(F.col("tk"), lambda x: x.rlike("^[0-9]")))
            .cast("long")
            .alias("n_num"),
            F.size(F.filter(F.col("tk"), lambda x: ~x.rlike("^[a-z0-9]")))
            .cast("long")
            .alias("n_punct"),
        )
    )


def _stream_documents_dir(sf_dir: str) -> str:
    return _stream_table_dir(sf_dir, "documents.parquet")


@q(
    "st9_stream_dedup",
    """SELECT source, count(DISTINCT md5(text)) AS n_unique
       FROM documents GROUP BY source""",
)
def st9_stream_dedup(spark, sf_dir):
    # §2.10 + dedup: EXACT DEDUP ON INGEST — streaming dropDuplicates over
    # the content hash, the stateful operator a crawl pipeline runs at the
    # front door so downstream storage never sees a duplicate. Keyed on
    # (source, hash): WHICH duplicate row survives a streaming dedup is
    # nondeterministic, but the per-source set of distinct hashes is not —
    # that makes the face oracle-checkable. State is the hash set; at
    # 10^12 docs bound it with a watermark on ingest time
    # (dropDuplicatesWithinWatermark) — here the fixture drains in one
    # availableNow batch, so the unbounded form is exact.
    import uuid as _uuid

    schema = t(spark, sf_dir, "documents").schema
    name = f"st9_{_uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .parquet(_stream_documents_dir(sf_dir))
        .select("source", F.md5("text").alias("h"))
        .dropDuplicates(["source", "h"])
    )
    qh = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()  # don't leak a running query + memory sink into the session
        raise TimeoutError("st9 stream did not drain within 600s")
    return (
        spark.table(name)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
    )


@q(
    "ann4_ivf_sq8",
    f"""WITH {_IVF_CENTROID},
    b AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
                 {_Q1_SCALE} AS sc
          FROM embeddings),
    z AS (SELECT vec_id, label, emb,
                 list_transform(emb, x ->
                     greatest(-127.0, least(127.0, floor(x / sc + 0.5)))) AS qc
          FROM b),
    qv AS (SELECT qc AS qq, emb AS qemb FROM z WHERE vec_id = 0),
    probe AS (
        SELECT c.label FROM centroids c, qv
        ORDER BY list_sum(list_transform(range(1, 65), i -> c.cent[i] * qv.qemb[i]))
                 / (sqrt(list_sum(list_transform(c.cent, x -> x * x)))
                    * sqrt(list_sum(list_transform(qv.qemb, x -> x * x)))) DESC,
                 c.label
        LIMIT 2),
    r AS (SELECT e.vec_id, e.label,
                 list_sum(list_transform(range(1, 65), i -> e.qc[i] * q.qq[i]))
                 / (sqrt(list_sum(list_transform(range(1, 65), i -> e.qc[i] * e.qc[i])))
                    * sqrt(list_sum(list_transform(range(1, 65), i -> q.qq[i] * q.qq[i])))) AS cq
          FROM z e JOIN probe p ON e.label = p.label, qv q
          WHERE e.vec_id <> 0)
    SELECT vec_id, label, round(cq, 4) AS cos_q
    FROM r ORDER BY round(cq, 4) DESC, vec_id LIMIT 5""",
)
def ann4_ivf_sq8(spark, sf_dir):
    # IVF-SQ8 — the FAISS index shape for billion-to-trillion-vector search:
    # a coarse quantizer (IVF inverted lists, ann3's kernel) prunes the scan
    # to nprobe/nlists of the corpus, and the refine inside probed lists
    # runs on int8 SCALAR-QUANTIZED codes (quant1's kernel) so the resident
    # index is ~4x smaller than float32. Probing uses the exact query
    # against the tiny broadcast centroid table; the refine ranking is
    # integer-exact in float64, so the oracle match is deterministic.
    # Plan: one groupBy to train + two broadcasts + semi-join pruned scan —
    # the corpus is never shuffled, never scanned beyond the probed lists.
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )

    def norm(a):
        return F.sqrt(
            F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
        )

    base = e.select(
        "vec_id",
        "label",
        dbl.alias("emb"),
        F.greatest(
            F.array_max(F.transform(dbl, lambda x: F.abs(x))) / F.lit(127.0),
            F.lit(1e-12),
        ).alias("sc"),
    )
    z = base.select(
        "vec_id",
        "label",
        "emb",
        F.transform(
            F.col("emb"),
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.floor(x / F.col("sc") + F.lit(0.5)).cast("double"),
                ),
            ),
        ).alias("qc"),
    )
    # query-side norms are loop-invariant: computed ONCE in the 1-row
    # broadcast side (the same hoist quant1 applies), bit-identical results
    qv = z.filter(F.col("vec_id") == 0).select(
        F.col("qc").alias("qq"),
        F.col("emb").alias("qemb"),
    )
    qv = qv.select(
        "qq",
        "qemb",
        norm(F.col("qq")).alias("qqn"),
        norm(F.col("qemb")).alias("qen"),
    )
    cent = (
        e.select("label", F.posexplode(dbl).alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("s"))
        .select("label", F.transform("s", lambda st: st["m"]).alias("cent"))
    )
    probe = (
        cent.crossJoin(F.broadcast(qv))
        .select(
            "label",
            (
                dot(F.col("cent"), F.col("qemb"))
                / (norm(F.col("cent")) * F.col("qen"))
            ).alias("c"),
        )
        .orderBy(F.desc("c"), "label")
        .limit(2)
        .select("label")
    )
    cq = dot(F.col("qc"), F.col("qq")) / (norm(F.col("qc")) * F.col("qqn"))
    return (
        z.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe), "label", "left_semi")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", F.round(cq, 4).alias("cos_q"))
        .orderBy(F.desc("cos_q"), "vec_id")
        .limit(5)
    )


def _pr1_oracle_sql() -> str:
    # 3 unrolled PageRank iterations as chained CTEs (DuckDB has no
    # iterative loop; the Spark side loops over the same algebra)
    it = """r{k} AS (
        SELECT h.host,
               0.15 / (SELECT count(*) FROM h)
                 + 0.85 * COALESCE(sum(r{p}.r / d.outdeg), 0) AS r
        FROM h
        LEFT JOIN e ON e.dst = h.host
        LEFT JOIN d ON d.src = e.src
        LEFT JOIN r{p} ON r{p}.host = e.src
        GROUP BY h.host)"""
    steps = ",\n    ".join(it.format(k=k, p=k - 1) for k in (1, 2, 3))
    return f"""WITH e AS (SELECT source AS src,
                     'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
              FROM documents),
    d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    h AS (SELECT DISTINCT source AS host FROM documents),
    r0 AS (SELECT host, 1.0 / (SELECT count(*) FROM h) AS r FROM h),
    {steps}
    SELECT host, round(r, 6) AS rank FROM r3 ORDER BY host"""


@q("pr1_host_rank", _pr1_oracle_sql())
def pr1_host_rank(spark, sf_dir):
    # Host-authority PageRank (3 damped iterations, d=0.85) — the crawl
    # frontier's prioritization signal: which hosts deserve fetch budget.
    # The link graph is synthesized deterministically from documents (each
    # doc emits one edge source-host -> hash-derived target host) so the
    # query is self-contained; the oracle unrolls the same three
    # iterations as chained CTEs. Scale shape per iteration: the rank
    # vector is ONE ROW PER HOST (~10^8 at web scale, KBs here) and
    # broadcasts onto the edge table; contributions aggregate by dst with
    # map-side partials — the edge corpus shuffles on dst once per
    # iteration and nothing else moves. Fixed iteration count keeps the
    # lineage bounded (the dd8 localCheckpoint lesson does not apply at 3
    # rounds). round(6) pins away float-summation-order ulps between
    # engines.
    d0 = t(spark, sf_dir, "documents")
    e = d0.select(
        F.col("source").alias("src"),
        F.concat(
            F.lit("src"), ((F.col("doc_id") * 7 + 3) % 20).cast("string")
        ).alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    hosts = d0.select(F.col("source").alias("host")).distinct()
    n_hosts = hosts.count()  # host cardinality is tiny by definition
    ranks = hosts.select("host", F.lit(1.0 / n_hosts).alias("r"))
    for _ in range(3):
        contrib = (
            e.join(F.broadcast(deg), "src")
            .join(
                F.broadcast(ranks.withColumnRenamed("host", "src")), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("s"))
        )
        ranks = (
            hosts.join(contrib.withColumnRenamed("dst", "host"), "host", "left")
            .select(
                "host",
                (F.lit(0.15 / n_hosts) + F.lit(0.85) * F.coalesce("s", F.lit(0.0))).alias(
                    "r"
                ),
            )
        )
    return ranks.select("host", F.round("r", 6).alias("rank")).orderBy("host")


@q(
    "gr1_doc_triangles",
    """WITH raw AS (
        SELECT doc_id AS u,
               (doc_id + 1) % (SELECT count(*) FROM documents) AS v
        FROM documents
        UNION ALL
        SELECT doc_id, (doc_id + 2) % (SELECT count(*) FROM documents)
        FROM documents
        UNION ALL
        SELECT doc_id, (doc_id * 7 + 3) % (SELECT count(*) FROM documents)
        FROM documents),
    e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM raw WHERE u <> v)
    SELECT count(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""",
)
def gr1_doc_triangles(spark, sf_dir):
    # Triangle counting — the canonical multi-way self-join graph workload
    # (clustering-coefficient numerator; LDBC/graph-benchmark staple). The
    # doc graph is synthesized deterministically (ring + skip + hash edges,
    # so every doc closes at least one triangle and the count is
    # non-trivial). Edges canonicalize to a < b, so each triangle
    # (x ≺ y ≺ z) is counted exactly once. Scale shape: edges are oriented
    # low→high in DEGREE order (id tiebreak) — the standard skew
    # refinement (Schank-Wagner / Latapy compact-forward): every triangle
    # is charged to its ≺-minimum vertex, so wedge multiplicity per join
    # key is bounded by that vertex's OUT-degree under the orientation
    # (O(√m) worst case) instead of a hub's full degree — on a power-law
    # web graph the difference between a bounded shuffle join and a
    # hub-key blowup. All joins are key-equi (vertex or endpoint-pair
    # keys); never a cartesian. The degree table is vertex-sized and
    # deliberately unhinted — vertex count at web scale outgrows
    # broadcast, and AQE still broadcasts it while small.
    d0 = t(spark, sf_dir, "documents")
    # same scalar the oracle's subquery computes — footer stats, no scan job
    n = table_rowcount(spark, sf_dir, "documents")
    u = F.col("doc_id")
    raw = (
        d0.select(u.alias("u"), ((u + 1) % n).alias("v"))
        .unionAll(d0.select(u.alias("u"), ((u + 2) % n).alias("v")))
        .unionAll(d0.select(u.alias("u"), ((u * 7 + 3) % n).alias("v")))
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da, db = F.col("da"), F.col("db")
    a_first = (da < db) | ((da == db) & (F.col("a") < F.col("b")))
    eo = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(a_first, db).otherwise(da).alias("ddst"),
        )
    )
    wedge_lo = eo.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    wedge_hi = eo.select("src", F.col("dst").alias("z"), F.col("ddst").alias("dz"))
    dy, dz = F.col("dy"), F.col("dz")
    wedges = wedge_lo.join(wedge_hi, "src").filter(
        (dy < dz) | ((dy == dz) & (F.col("y") < F.col("z")))
    )
    # the closing edge y–z, if present, is oriented y→z (y ≺ z matches the
    # wedge filter), so one equi-join on the endpoint pair closes triangles
    closing = eo.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    return wedges.join(closing, ["y", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def _z_interleave_sql(a: str, b: str, bits: int = 8) -> str:
    # bit-interleave two small ints into a Z-curve value (a gets even bit
    # positions, b odd) — integer-exact, identical in Spark SQL and DuckDB
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({b} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


@q(
    "z1_zorder_key",
    f"""WITH k AS (SELECT l_orderkey, l_partkey,
                          CAST(l_orderkey % 256 AS BIGINT) AS a,
                          CAST(l_partkey % 256 AS BIGINT) AS b
                   FROM lineitem),
    z AS (SELECT l_orderkey, l_partkey,
                 CAST({_z_interleave_sql('a', 'b')} AS BIGINT) AS zval
          FROM k)
    SELECT l_orderkey, l_partkey, zval
    FROM z ORDER BY zval, l_orderkey, l_partkey LIMIT 50""",
)
def z1_zorder_key(spark, sf_dir):
    # Z-order (Morton) clustering key — the lakehouse OPTIMIZE ZORDER
    # primitive: interleaving the bits of two filter columns gives a single
    # sort key under which rows close in EITHER dimension land close on
    # disk, so parquet min/max row-group pruning works for predicates on
    # both columns (a plain sort clusters only its leading column). Here
    # the key is computed with pure integer bit arithmetic — JVM-codegen'd
    # narrow projection, exact in both engines — and the table layout step
    # is repartitionByRange(zval) + sortWithinPartitions(zval) at write
    # time. At 100 TB this is a maintenance job like plans/compact.py.
    li = t(spark, sf_dir, "lineitem")
    a = (F.col("l_orderkey") % 256).cast("long")
    b = (F.col("l_partkey") % 256).cast("long")
    zval = F.lit(0).cast("long")
    for i in range(8):
        zval = zval + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        zval = zval + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return (
        li.select("l_orderkey", "l_partkey", zval.alias("zval"))
        .orderBy("zval", "l_orderkey", "l_partkey")
        .limit(50)
    )


@q(
    "voc1_vocab_topk",
    f"""WITH e AS (SELECT unnest({_duck_words()}) AS word FROM documents),
    c AS (SELECT word, count(*) AS n FROM e WHERE word <> '' GROUP BY word),
    r AS (SELECT word, n,
                 row_number() OVER (ORDER BY n DESC, word) AS rk,
                 sum(n) OVER (ORDER BY n DESC, word
                              ROWS UNBOUNDED PRECEDING) AS cum
          FROM c)
    SELECT word, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk,
           CAST(cum AS BIGINT) AS cum_count
    FROM r WHERE rk <= 20""",
)
def voc1_vocab_topk(spark, sf_dir):
    # Vocabulary construction — the tokenizer-training prerequisite (count
    # every word, rank by frequency, cumulative token coverage of the top
    # ranks; the Zipf head that decides vocab size). Scale shape: the word
    # count is one map-side-combined groupBy over a vocabulary-sized table
    # (Heaps' law: sublinear in corpus); the top-k is TakeOrdered (never a
    # global sort of the vocab); rank + running coverage then run in a
    # window over the 20 SURVIVING rows only — a global-order window is
    # fine after a LIMIT, the thing that must never happen is one over the
    # vocab or the corpus. cum_count over the top-k prefix equals the full
    # -vocabulary prefix sum because ranking is a prefix of the same order.
    c = (
        t(spark, sf_dir, "documents")
        .select(F.explode(_spark_words()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = c.orderBy(F.desc("n"), "word").limit(20)
    w = Window.orderBy(F.desc("n"), "word").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return top.select(
        "word",
        "n",
        F.row_number().over(w).alias("rk"),
        F.sum("n").over(w).alias("cum_count"),
    )


@q(
    "km1_kmeans_estep",
    """WITH q AS (SELECT vec_id,
                         list_transform(embedding,
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                       AS BIGINT)) AS qe
                  FROM embeddings),
    c AS (SELECT vec_id AS cid, qe AS qc FROM q WHERE vec_id BETWEEN 1 AND 8),
    d AS (SELECT q.vec_id, q.qe[1] AS q0, c.cid,
                 list_sum(list_transform(range(1, 65),
                     i -> (q.qe[i] - c.qc[i]) * (q.qe[i] - c.qc[i]))) AS dist
          FROM q, c),
    a AS (SELECT vec_id, q0, cid, dist,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rn
          FROM d)
    SELECT cid, count(*) AS n_members,
           CAST(sum(q0) AS BIGINT) AS qsum0,
           CAST(sum(dist) AS BIGINT) AS inertia
    FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid""",
)
def km1_kmeans_estep(spark, sf_dir):
    # One Lloyd iteration (E-step assign + M-step partials) — the
    # clustering workhorse behind IVF index training and embedding-space
    # corpus maps. All arithmetic is scaled-int (components quantized to
    # round(x*1000) longs, squared-L2 in exact integer math — the tx8/
    # quant1 pattern), so both engines agree bit-for-bit with no float
    # accumulation-order hazards. Scale shape: the K=8 centroid set
    # collapses to a single broadcast ROW (array of structs), assignment
    # is argmin over that array via array_min — a narrow projection, so
    # the corpus is never multiplied by K rows, never shuffled on vec_id;
    # the only exchange is the final 8-group partial aggregate. M-step
    # emits exact integer SUMS (component-0 sum + member count + inertia),
    # not means — the driver of the next iteration divides.
    e = t(spark, sf_dir, "embeddings")
    qarr = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    qe = e.select("vec_id", qarr.alias("qe"))
    cents_row = (
        qe.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 8))
        .select(F.struct(F.col("vec_id").alias("cid"), F.col("qe").alias("qc")).alias("c"))
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )

    def dist_to(qc):
        return F.aggregate(
            F.zip_with(F.col("qe"), qc, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )

    best = F.array_min(
        F.transform(
            "cents",
            lambda c: F.struct(
                dist_to(c["qc"]).alias("dist"), c["cid"].alias("cid")
            ),
        )
    )
    return (
        qe.crossJoin(F.broadcast(cents_row))
        .select(
            F.element_at("qe", 1).alias("q0"),
            best.alias("b"),
        )
        .groupBy(F.col("b.cid").alias("cid"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("q0").alias("qsum0"),
            F.sum("b.dist").alias("inertia"),
        )
        .orderBy("cid")
    )


@q(
    "ex7_outlink_hash",
    """SELECT CAST(286616767658516744 AS BIGINT) AS corpus_hash,
              CAST(1500 AS BIGINT) AS n_docs""",
)
def ex7_outlink_hash(spark, sf_dir):
    # Web-graph construction face: harvest every <a href> of the 1500-page
    # seed-42 fixture corpus through the Arrow-batched link stage
    # (operators/links.extract_links — entity decode, urljoin resolution,
    # scheme filtering identical to the pure-Python extractor.links spec),
    # reduce (url, outlinks, n_links) rows with the same order-insensitive
    # sha256-prefix xor as ex4. The oracle literal is computed by the pure
    # -Python path (pinned with it in tests/test_links.py), so a green row
    # proves the distributed link harvest is string-identical to the
    # reference implementation — the ex4 byte-identity pattern applied to
    # the graph face. Narrow stage: no shuffle upstream of the 1-row agg.
    from greenocr_spark.operators.links import extract_links

    pages = spark.read.parquet(_fixture_pages_path(1500))
    lk = extract_links(pages)
    canon = F.concat_ws(
        "\x1f",
        F.col("url"),
        F.array_join("outlinks", ";"),
        F.col("n_links").cast("string"),
    )
    row_h = F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("long")
    return lk.select(row_h.alias("h")).agg(
        F.bit_xor("h").alias("corpus_hash"), F.count("*").alias("n_docs")
    )


# lnk1's edges come from HTML parsing over the FROZEN 400-page seed-42
# fixture corpus, so the exact host graph is a constant: freeze it as a
# VALUES oracle (hash-green driver check). Provenance is pure Python —
# tests/test_links.py recomputes these rows from extract_outlinks +
# urlsplit and pins equality, so the literal is independent of Spark.
_LNK1_GOLDEN_ROWS = [
    ("big.example.com", "big.example.com", 661),
    ("host1.example.org", "host1.example.org", 114),
    ("host10.example.org", "host10.example.org", 90),
    ("host11.example.org", "host11.example.org", 127),
    ("host12.example.org", "host12.example.org", 99),
    ("host13.example.org", "host13.example.org", 112),
    ("host14.example.org", "host14.example.org", 45),
    ("host15.example.org", "host15.example.org", 62),
    ("host16.example.org", "host16.example.org", 95),
    ("host17.example.org", "host17.example.org", 45),
    ("host18.example.org", "host18.example.org", 149),
    ("host19.example.org", "host19.example.org", 120),
    ("host2.example.org", "host2.example.org", 129),
    ("host3.example.org", "host3.example.org", 70),
    ("host4.example.org", "host4.example.org", 72),
    ("host5.example.org", "host5.example.org", 114),
    ("host6.example.org", "host6.example.org", 80),
    ("host7.example.org", "host7.example.org", 82),
    ("host8.example.org", "host8.example.org", 102),
    ("host9.example.org", "host9.example.org", 57),
]


@q(
    "lnk1_host_graph",
    "SELECT src_host, dst_host, CAST(n_edges AS BIGINT) AS n_edges FROM "
    "(VALUES "
    + ", ".join(f"('{s}', '{d}', {n})" for s, d, n in _LNK1_GOLDEN_ROWS)
    + ") AS t(src_host, dst_host, n_edges) ORDER BY src_host, dst_host",
)
def lnk1_host_graph(spark, sf_dir):
    # Host-level link graph — the pr1/crawl-frontier input built from real
    # page markup: explode the outlinks of the link stage, reduce each
    # edge to (src_host, dst_host), count. Scale shape: the narrow link
    # stage preserves partitioning; the only shuffle is the (src,dst)
    # -keyed aggregate with map-side partials; hosts come from
    # try_parse_url (NULL-safe on malformed crawl urls).
    from greenocr_spark.functions.sqlfns import host_expr
    from greenocr_spark.operators.links import extract_links

    pages = spark.read.parquet(_fixture_pages_path(400))
    lk = extract_links(pages)
    return (
        lk.select(
            host_expr("url").alias("src_host"),
            F.explode("outlinks").alias("out"),
        )
        .select("src_host", host_expr("out").alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .orderBy("src_host", "dst_host")
    )


@q(
    "ex8_meta_hash",
    """SELECT CAST(1049987538828195193 AS BIGINT) AS corpus_hash,
              CAST(1500 AS BIGINT) AS n_docs""",
)
def ex8_meta_hash(spark, sf_dir):
    # Page-metadata face (title / meta-robots / rel=canonical — the
    # signals that drive noindex exclusion and canonical-url dedup in a
    # CC-style pipeline): Arrow-batched harvest (operators/meta.py) over
    # the 1500-page fixture corpus, reduced with the ex4/ex7 sha256-xor
    # scheme against a frozen pure-Python literal (pinned together with
    # the spec in tests/test_meta.py). Narrow stage, 1-row agg.
    from greenocr_spark.operators.meta import extract_meta_pages

    pages = spark.read.parquet(_fixture_pages_path(1500))
    mt = extract_meta_pages(pages)
    canon = F.concat_ws(
        "\x1f",
        F.col("url"),
        F.coalesce("title", F.lit("")),
        F.coalesce("robots", F.lit("")),
        F.col("noindex").cast("int").cast("string"),
        F.coalesce("canonical", F.lit("")),
    )
    row_h = F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("long")
    return mt.select(row_h.alias("h")).agg(
        F.bit_xor("h").alias("corpus_hash"), F.count("*").alias("n_docs")
    )


@q(
    "st10_stream_link_hash",
    """SELECT CAST(286616767658516744 AS BIGINT) AS corpus_hash,
              CAST(1500 AS BIGINT) AS n_docs""",
)
def st10_stream_link_hash(spark, sf_dir):
    # §2.10 × web graph: the STREAMING face of the outlink harvest —
    # stream_warc over the same 1500-page WARC fixture → extract_links →
    # ex7's xor-hash canon, availableNow drain. Must land on ex7's frozen
    # pure-Python literal: batch-parquet (ex7) and streaming-WARC (this)
    # harvests are string-identical, the st8 container-independence
    # argument extended to the graph face (the link stage is a pure
    # DataFrame→DataFrame function, so the batch pipeline IS the
    # streaming pipeline).
    import tempfile
    import uuid as _uuid

    from greenocr_spark.operators.links import extract_links
    from greenocr_spark.sources.warc import stream_warc

    pages = stream_warc(spark, _fixture_warc_dir(1500)).select("url", "html")
    lk = extract_links(pages)
    canon = F.concat_ws(
        "\x1f",
        F.col("url"),
        F.array_join("outlinks", ";"),
        F.col("n_links").cast("string"),
    )
    row_h = F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("long")
    hashed = lk.select(row_h.alias("h")).agg(
        F.bit_xor("h").alias("corpus_hash"), F.count("*").alias("n_docs")
    )
    name = f"st10_{_uuid.uuid4().hex[:8]}"
    qh = (
        hashed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="st10_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()
        raise TimeoutError("st10 streaming drain did not finish within 600s")
    return spark.table(name)


_DOT16 = (
    "list_sum(list_transform(range(1, 17), i -> "
    "CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))"
)


@q(
    "ann5_truncated_refine",
    f"""WITH q AS (SELECT list_transform(embedding,
                       x -> CAST(x AS DOUBLE)) AS qe,
                   sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
            FROM embeddings WHERE vec_id = 0),
    cand AS (SELECT e.vec_id, e.embedding
             FROM embeddings e, q WHERE e.vec_id <> 0
             ORDER BY {_DOT16} DESC, e.vec_id LIMIT 50)
    SELECT e.vec_id,
           round(list_sum(list_transform(range(1, 65),
                     i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))
                 / (sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * q.qn),
                 4) AS cos
    FROM cand e, q
    ORDER BY list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))
             / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * q.qn)
             DESC, e.vec_id
    LIMIT 5""",
)
def ann5_truncated_refine(spark, sf_dir):
    # Truncated-dimension two-stage ANN (the Matryoshka/ADSampling shape):
    # coarse-rank every vector by the dot of its FIRST 16 dims against the
    # query (4× less arithmetic and — with a dim-sliced column layout —
    # 4× less I/O per scanned vector), keep the top 50, then refine with
    # the exact 64-dim cosine inside the candidate set only. Complements
    # ann3 (IVF prunes WHICH vectors are scanned; truncation prunes HOW
    # MUCH of each vector the coarse pass reads). Scale shape: query is a
    # broadcast row, both stages are TakeOrdered (never a global sort),
    # the refine input is candidate-bounded, the corpus never shuffles.
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )

    def norm(a):
        return F.sqrt(
            F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
        )

    qv = e.filter(F.col("vec_id") == 0).select(
        dbl.alias("qe"), norm(dbl).alias("qn")
    )
    coarse = dot(F.slice(dbl, 1, 16), F.slice(F.col("qe"), 1, 16))
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "embedding", "qe", "qn", coarse.alias("_c16"))
        .orderBy(F.desc("_c16"), "vec_id")
        .limit(50)
    )
    cos = dot(dbl, F.col("qe")) / (norm(dbl) * F.col("qn"))
    return (
        cand.select("vec_id", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), "vec_id")
        .limit(5)
        .select("vec_id", F.round("_cos", 4).alias("cos"))
    )


@q(
    "samp3_stratum_topk",
    """WITH r AS (SELECT doc_id, source,
                         md5(CAST(doc_id AS VARCHAR) || ':s3') AS skey
                  FROM documents),
    k AS (SELECT doc_id, source, skey,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY skey, doc_id) AS rk
          FROM r)
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM k WHERE rk <= 3""",
)
def samp3_stratum_topk(spark, sf_dir):
    # Deterministic fixed-size per-stratum sample — reservoir sampling's
    # reproducible twin (k docs per source, selection = smallest seeded
    # md5 ranks, so reruns and resumed runs pick the SAME sample; the
    # per-domain cap every mixture pipeline needs next to samp1's
    # rate-based carve). Scale shape: one window keyed by the stratum —
    # a single source-partitioned shuffle with rank short-circuiting;
    # no stratum ever needs more than k rows retained per task after the
    # running rank, and no global order exists anywhere.
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":s3"))).alias(
            "skey"
        ),
    )
    w = Window.partitionBy("source").orderBy("skey", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


# =========================================================================
# Web-text cleaning face (round 5): C4-style line filtering + Unicode NFC
# =========================================================================

def c4_keep_line_sql(var: str) -> str:
    """The DuckDB twin of c4_keep_line over a line expression `var` — ONE
    source for both the c4f1 oracle and the cross-engine fuzz test, so the
    two predicates can never drift apart."""
    return (
        f"length(trim({var})) > 0 "
        f"AND right(trim({var}), 1) IN ('.', '!', '?', '\"') "
        f"AND len(string_split_regex(trim({var}), '\\s+')) >= 5 "
        f"AND NOT contains(trim({var}), '{{') "
        f"AND NOT contains(lower(trim({var})), 'lorem ipsum') "
        f"AND NOT list_contains("
        f"string_split_regex(lower(trim({var})), '\\s+'), 'javascript')"
    )


_C4F1_ORACLE = r"""WITH w AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
), pg AS (
    SELECT doc_id, concat_ws(chr(10),
        array_to_string(list_slice(ws, 1, 6), ' ') || '.',
        array_to_string(list_slice(ws, 7, 9), ' ') || '.',
        array_to_string(list_slice(ws, 4, 11), ' '),
        array_to_string(list_slice(ws, 2, 7), ' ') || ' { x }.',
        CASE WHEN doc_id % 2 = 0
             THEN 'lorem ipsum dolor sit amet consectetur.'
             ELSE array_to_string(list_slice(ws, 1, 5), ' ') || ' again ok?' END,
        CASE WHEN doc_id % 3 = 0
             THEN 'please enable javascript to view this page.'
             ELSE array_to_string(list_slice(ws, 3, 8), ' ') || ' indeed!' END
    ) AS page FROM w
), ln AS (
    SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg
), k AS (
    SELECT doc_id, lines,
           list_filter(lines, x -> """ + c4_keep_line_sql("x") + r""") AS kept
    FROM ln
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       len(kept) >= 3 AS keep_doc,
       array_to_string(kept, chr(10)) AS clean_text
FROM k"""


def c4_keep_line(line):
    """C4's line-level keep rule (Raffel et al. 2020 §2.2, the 'C4' corpus
    rules), as one JVM boolean expression over a line Column: kept iff the
    trimmed line ends in terminal punctuation, has >= 5 whitespace words,
    and contains no '{', no 'lorem ipsum', and no 'javascript' word. Shared
    by c4f1 and any caller composing it over extracted text."""
    s = F.trim(line)
    return (
        (F.length(s) > 0)
        & F.substring(s, -1, 1).isin(".", "!", "?", '"')
        & (F.size(F.split(s, r"\s+")) >= 5)
        & ~s.contains("{")
        & ~F.lower(s).contains("lorem ipsum")
        & ~F.array_contains(F.split(F.lower(s), r"\s+"), "javascript")
    )


@q("c4f1_line_filter", _C4F1_ORACLE)
def c4f1_line_filter(spark, sf_dir):
    # C4-style line filtering (the classic web-text cleaning stage: keep
    # only lines that end in terminal punctuation, have >= 5 words, and
    # carry no code-brace / lorem-ipsum / javascript boilerplate markers;
    # keep the DOC iff >= 3 lines survive). The documents table is
    # single-line word soup, so the multi-line page under test is PLANTED
    # deterministically from each doc's word array — the identical
    # construction runs in the DuckDB oracle, so the kept/dropped decisions
    # and the reassembled clean text are fully value-checked cross-engine.
    # Scale shape: entirely JVM array lambdas inside one narrow projection —
    # zero shuffles, zero Python, embarrassingly parallel at 10^12 rows
    # (plan-pinned in tests/test_plans.py).
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")

    def chunk(start, n):
        return F.array_join(F.slice(ws, start, n), " ")

    page = F.concat_ws(
        "\n",
        F.concat(chunk(1, 6), F.lit(".")),
        F.concat(chunk(7, 3), F.lit(".")),
        chunk(4, 8),
        F.concat(chunk(2, 6), F.lit(" { x }.")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("lorem ipsum dolor sit amet consectetur."),
        ).otherwise(F.concat(chunk(1, 5), F.lit(" again ok?"))),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("please enable javascript to view this page."),
        ).otherwise(F.concat(chunk(3, 6), F.lit(" indeed!"))),
    )
    lines = F.split(page, "\n")
    kept = F.filter(lines, c4_keep_line)
    return d.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(kept) >= 3).alias("keep_doc"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


# the planted decomposed tail: 'e'+COMBINING ACUTE, 'a'+COMBINING DIAERESIS,
# 'o'+COMBINING CIRCUMFLEX — NFC recomposes all three to one codepoint each
_NFC_TAIL = " nfc:e\u0301a\u0308o\u0302"


@q(
    "nfc1_unicode_nfc",
    r"""WITH p AS (
        SELECT doc_id,
               text || ' nfc:e' || chr(769) || 'a' || chr(776)
                    || 'o' || chr(770) AS raw
        FROM documents)
    SELECT doc_id,
           nfc_normalize(raw) AS nfc_text,
           nfc_normalize(raw) <> raw AS changed,
           CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT)
               AS cp_removed
    FROM p""",
)
def nfc1_unicode_nfc(spark, sf_dir):
    # Unicode NFC canonicalization — the text-normalization stage every
    # web-extraction pipeline runs before hashing/dedup (decomposed
    # combining sequences from different crawls would otherwise defeat
    # exact dedup of identical text). Spark has no NFC builtin, so this is
    # the documented Arrow-batched pandas-UDF path (never a row UDF); the
    # oracle is DuckDB's INDEPENDENT nfc_normalize implementation over the
    # same planted decomposed tail, so the two Unicode implementations
    # cross-check each other value-for-value. Narrow, zero-shuffle,
    # embarrassingly parallel at 10^12 rows.
    import unicodedata

    nfc = F.pandas_udf(
        lambda s: s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        ),
        "string",
    )

    raw = F.concat(F.col("text"), F.lit(_NFC_TAIL))
    d = t(spark, sf_dir, "documents").select("doc_id", raw.alias("raw"))
    return d.select(
        "doc_id",
        nfc("raw").alias("nfc_text"),
        (nfc("raw") != F.col("raw")).alias("changed"),
        (F.length("raw") - F.length(nfc("raw"))).cast("long").alias("cp_removed"),
    )


_PIPE3_ORACLE = f"""WITH w AS (
    SELECT doc_id, {_duck_words()} AS ws FROM documents
), b AS (
    SELECT doc_id, ws,
           list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
               AS big
    FROM w
), m AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           round(list_sum(list_transform(ws, x -> length(x)))
                 / CAST(len(ws) AS DOUBLE), 4) AS mean_wlen,
           CASE WHEN len(ws) >= 2
                THEN round(1 - len(list_distinct(big))
                           / CAST(len(big) AS DOUBLE), 4)
                ELSE 0.0 END AS rep_frac,
           round(len(list_filter(ws, x -> x IN {str(tuple(_STOPWORDS))}))
                 / len(ws), 4) AS stop_ratio
    FROM b
)
SELECT doc_id, n_words, mean_wlen, rep_frac, stop_ratio,
       n_words BETWEEN 30 AND 90 AS pass_words,
       mean_wlen BETWEEN 3.8 AND 5.0 AS pass_wlen,
       rep_frac <= 0.05 AS pass_rep,
       stop_ratio >= 0.05 AS pass_stop,
       (n_words BETWEEN 30 AND 90) AND (mean_wlen BETWEEN 3.8 AND 5.0)
           AND rep_frac <= 0.05 AND stop_ratio >= 0.05 AS kept
FROM m"""


@q("pipe3_gopher_funnel", _PIPE3_ORACLE)
def pipe3_gopher_funnel(spark, sf_dir):
    # Gopher-rules quality filter funnel (Rae et al. 2021 Table A1 shape,
    # thresholds adapted to this corpus' 10-99-word docs): word-count
    # bounds, mean-word-length bounds, duplicate-bigram repetition cap, and
    # a stop-word floor — each rule reported as its own pass column (the
    # per-rule attrition attribution a curation funnel publishes) and the
    # doc kept iff ALL pass. Composes the tx2/tx7 kernels verbatim; every
    # metric is rounded to 4 places with the identical IEEE op order on
    # both engines before comparing, so the booleans are exactly
    # value-checked. One narrow JVM projection — zero shuffles, zero
    # Python, embarrassingly parallel at 10^12 rows.
    ws = _spark_words()
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda x: F.array_contains(stop_arr, x)))
    sum_len = F.aggregate(
        F.transform(ws, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    big = _bigram_array(ws)
    m = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.round(sum_len / F.size(ws).cast("double"), 4).alias("mean_wlen"),
        F.when(
            F.size(ws) >= 2,
            F.round(
                1 - F.size(F.array_distinct(big)) / F.size(big).cast("double"), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("rep_frac"),
        F.round(n_stop / F.size(ws), 4).alias("stop_ratio"),
    )
    pass_words = F.col("n_words").between(30, 90)
    pass_wlen = F.col("mean_wlen").between(3.8, 5.0)
    pass_rep = F.col("rep_frac") <= 0.05
    pass_stop = F.col("stop_ratio") >= 0.05
    return m.select(
        "doc_id",
        "n_words",
        "mean_wlen",
        "rep_frac",
        "stop_ratio",
        pass_words.alias("pass_words"),
        pass_wlen.alias("pass_wlen"),
        pass_rep.alias("pass_rep"),
        pass_stop.alias("pass_stop"),
        (pass_words & pass_wlen & pass_rep & pass_stop).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Anchor-text face (round 5): the web-graph edges CARRY text — the anchor
# words pointing at a url are the classic relevance signal (anchor-term
# indexing) and a crawl-frontier prioritization input. Two faces:
#   anch1 — distributed harvest string-identity (frozen xor literal, the
#           ex4/ex7 pattern; seq disambiguates repeated (src,dst,anchor)
#           triples so xor can't self-cancel);
#   anch2 — per-target-host anchor-term aggregation (frozen VALUES oracle,
#           the lnk1 pattern; provenance recomputed pure-Python in
#           tests/test_links.py).
# ---------------------------------------------------------------------------

# frozen with tests/test_links.py::test_anchor_golden_frozen
_ANCH1_XOR = 7359346626384892
_ANCH1_N = 11636


@q(
    "anch1_anchor_hash",
    f"""SELECT CAST({_ANCH1_XOR} AS BIGINT) AS corpus_hash,
              CAST({_ANCH1_N} AS BIGINT) AS n_anchors""",
)
def anch1_anchor_hash(spark, sf_dir):
    # Anchor-text harvest over the 1500-page seed-42 fixture corpus through
    # the Arrow-batched stage (operators/links.extract_anchors_df — href
    # resolution shared verbatim with the outlink spec via _resolve_href),
    # reduced with the order-insensitive sha256-prefix xor over
    # (src, seq, dst, anchor) rows. The literal is computed by the pure-
    # Python path and pinned with it in tests/test_links.py, so a green row
    # proves the distributed anchor harvest is string-identical to the
    # spec. Narrow stage: no shuffle upstream of the 1-row agg.
    from greenocr_spark.operators.links import extract_anchors_df

    pages = spark.read.parquet(_fixture_pages_path(1500))
    an = extract_anchors_df(pages)
    canon = F.concat_ws(
        "\x1f",
        F.col("src"),
        F.col("seq").cast("string"),
        F.col("dst"),
        F.col("anchor"),
    )
    row_h = F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("long")
    return an.select(row_h.alias("h")).agg(
        F.bit_xor("h").alias("corpus_hash"), F.count("*").alias("n_anchors")
    )


# frozen with tests/test_links.py::test_anchor_host_terms_provenance —
# (dst_host, n_anchors, n_terms, top_term, top_count) over the 400-page
# seed-42 fixture corpus; top term per host by (count DESC, term ASC).
_ANCH2_GOLDEN_ROWS = [
    ("big.example.com", 832, 44, "about", 98),
    ("host1.example.org", 153, 40, "page", 16),
    ("host10.example.org", 120, 38, "about", 12),
    ("host11.example.org", 169, 43, "about", 17),
    ("host12.example.org", 138, 42, "host", 16),
    ("host13.example.org", 139, 38, "about", 17),
    ("host14.example.org", 45, 8, "about", 9),
    ("host15.example.org", 74, 31, "about", 10),
    ("host16.example.org", 110, 26, "about", 16),
    ("host17.example.org", 45, 8, "about", 9),
    ("host18.example.org", 203, 44, "about", 19),
    ("host19.example.org", 165, 42, "about", 15),
    ("host2.example.org", 168, 42, "about", 18),
    ("host3.example.org", 85, 30, "about", 11),
    ("host4.example.org", 99, 40, "hash", 10),
    ("host5.example.org", 168, 42, "page", 14),
    ("host6.example.org", 80, 8, "about", 16),
    ("host7.example.org", 94, 28, "about", 14),
    ("host8.example.org", 144, 40, "score", 14),
    ("host9.example.org", 69, 32, "filter", 10),
]


@q(
    "anch2_host_anchor_terms",
    "SELECT dst_host, CAST(n_anchors AS BIGINT) AS n_anchors, "
    "CAST(n_terms AS BIGINT) AS n_terms, top_term, "
    "CAST(top_count AS BIGINT) AS top_count FROM (VALUES "
    + ", ".join(
        f"('{h}', {na}, {nt}, '{tt}', {tc})"
        for h, na, nt, tt, tc in _ANCH2_GOLDEN_ROWS
    )
    + ") AS t(dst_host, n_anchors, n_terms, top_term, top_count) "
    "ORDER BY dst_host",
)
def anch2_host_anchor_terms(spark, sf_dir):
    # Per-target-host anchor-term index summary: for every dst host, how
    # many anchors point at it, how many distinct (lowercased, whitespace-
    # split) anchor terms, and the most frequent term (count DESC, term ASC
    # tie-break). Scale shape: the narrow anchor stage preserves
    # partitioning; n_anchors is one map-side-combined groupBy on dst_host;
    # term counts shuffle once on (dst_host, term); the top term comes from
    # a rank-1 window WindowGroupLimit short-circuits, so no host's full
    # term list is ever sorted globally; the final join is between two
    # host-cardinality tables (broadcast). Hosts via try_parse_url
    # (NULL-safe on malformed urls).
    from pyspark.sql import Window

    from greenocr_spark.functions.sqlfns import host_expr
    from greenocr_spark.operators.links import extract_anchors_df

    pages = spark.read.parquet(_fixture_pages_path(400))
    an = extract_anchors_df(pages).select(
        host_expr("dst").alias("dst_host"), F.col("anchor")
    )
    n_anchors = an.groupBy("dst_host").agg(F.count(F.lit(1)).alias("n_anchors"))
    terms = an.select(
        "dst_host", F.explode(F.split(F.lower("anchor"), " ")).alias("term")
    ).where(F.col("term") != "")
    tc = terms.groupBy("dst_host", "term").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("dst_host").orderBy(F.col("c").desc(), F.col("term"))
    top = (
        tc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("dst_host", F.col("term").alias("top_term"), F.col("c").alias("top_count"))
    )
    n_terms = tc.groupBy("dst_host").agg(F.count(F.lit(1)).alias("n_terms"))
    return (
        n_anchors.join(F.broadcast(n_terms), "dst_host")
        .join(F.broadcast(top), "dst_host")
        .select("dst_host", "n_anchors", "n_terms", "top_term", "top_count")
        .orderBy("dst_host")
    )


@q(
    "url1_latest_snapshot",
    """WITH snaps AS (
        SELECT doc_id, text,
               'https://host' || CAST(doc_id % 13 AS VARCHAR)
                   || '.example/p' || CAST(doc_id % 97 AS VARCHAR) AS url
        FROM documents)
    SELECT url, doc_id AS latest_doc_id, text,
           CAST(n_snaps AS BIGINT) AS n_snaps
    FROM (
        SELECT url, doc_id, text,
               row_number() OVER (PARTITION BY url ORDER BY doc_id DESC)
                   AS rn,
               count(*) OVER (PARTITION BY url) AS n_snaps
        FROM snaps) t
    WHERE rn = 1""",
)
def url1_latest_snapshot(spark, sf_dir):
    # Recrawl dedup — keep the NEWEST snapshot per url (every CC-style
    # pipeline's first dedup pass: the same url is fetched in many crawls;
    # only the latest capture feeds extraction). The documents table has no
    # url column, so snapshots are PLANTED deterministically: url from
    # doc_id arithmetic (13*97 = 1261 > any collision accident; ~5 docs
    # per synthetic url at sf0.01) and recency = doc_id (the fixture
    # corpus' warc_ts is likewise monotone in row id). Keeps the max-
    # recency row per url plus the snapshot count. Scale shape: ONE scan,
    # ONE url-keyed exchange, ONE per-partition sort feeding both window
    # functions (rank-1 + count share the window spec). The plausible
    # alternatives lose at 100 TB: max_by aggregation falls back to
    # SortAggregate (string buffer — two sorts, and map-side partials
    # rarely combine because same-url recrawls live in different crawl
    # dumps), and an agg+join-back shape scans the wide text column from
    # storage twice. No WindowGroupLimit here BY DESIGN — the count must
    # see every snapshot, so top-1 can't be short-circuited. url is an
    # exact key, so group skew is bounded by the per-url recrawl count,
    # not host skew; recency ties are impossible (doc_id is unique —
    # production orders by (warc_ts, digest) for the same determinism).
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://host"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".example/p"),
            (F.col("doc_id") % 97).cast("string"),
        ).alias("url"),
    )
    w = Window.partitionBy("url").orderBy(F.col("doc_id").desc())
    wc = Window.partitionBy("url")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_snaps", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(
            "url",
            F.col("doc_id").alias("latest_doc_id"),
            "text",
            F.col("n_snaps").cast("long").alias("n_snaps"),
        )
    )


@q(
    "meta1_canonical_dedup",
    """WITH p AS (
        SELECT doc_id,
               'https://p.example/' || CAST(doc_id AS VARCHAR) AS url,
               doc_id % 7 = 0 AS noindex,
               CASE WHEN doc_id % 3 = 0
                    THEN 'https://canon.example/c'
                         || CAST(doc_id % 50 AS VARCHAR)
                    ELSE NULL END AS canonical
        FROM documents)
    SELECT coalesce(canonical, url) AS canon_key,
           CAST(count(*) AS BIGINT) AS n_pages,
           min(url) AS keeper
    FROM p WHERE NOT noindex
    GROUP BY 1""",
)
def meta1_canonical_dedup(spark, sf_dir):
    # noindex exclusion + rel=canonical dedup — the two page-metadata
    # policies every CC-style corpus applies before content work. The
    # documents table has no markup, so pages are PLANTED deterministically
    # from doc_id (every 3rd page declares a canonical into a 50-key space,
    # every 7th a robots noindex) and pushed through the REAL metadata
    # extractor (operators/meta.extract_meta_pages — regex parse, entity
    # decode, urljoin resolution); the DuckDB oracle recomputes the planted
    # truth ARITHMETICALLY, so a green row value-checks the parser AND the
    # dedup shape cross-engine (the c4f1 planting pattern applied to the
    # meta face). Scale shape: narrow Arrow-batched parse, narrow noindex
    # predicate, ONE map-side-combined groupBy on the canonical key; at
    # 10^12 pages canonical-key skew is bounded by real canonical fan-in
    # (pages per canonical), the same boundedness as url dedup.
    from greenocr_spark.operators.meta import extract_meta_pages

    d = t(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://p.example/"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.encode(
            F.concat(
                F.lit("<html><head><title>t</title>"),
                F.when(
                    F.col("doc_id") % 3 == 0,
                    F.concat(
                        F.lit('<link rel="canonical" href="https://canon.example/c'),
                        (F.col("doc_id") % 50).cast("string"),
                        F.lit('">'),
                    ),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.lit('<meta name="robots" content="noindex, nofollow">'),
                ).otherwise(F.lit("")),
                F.lit("</head><body><p>x</p></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    mt = extract_meta_pages(d)
    return (
        mt.where(~F.col("noindex"))
        .groupBy(F.coalesce("canonical", "url").alias("canon_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.min("url").alias("keeper"),
        )
    )


@q(
    "st11_stream_anchor_hash",
    f"""SELECT CAST({_ANCH1_XOR} AS BIGINT) AS corpus_hash,
              CAST({_ANCH1_N} AS BIGINT) AS n_anchors""",
)
def st11_stream_anchor_hash(spark, sf_dir):
    # §2.10 × anchor text: the STREAMING face of the anchor harvest —
    # stream_warc over the same 1500-page WARC fixture →
    # extract_anchors_df → anch1's xor-hash canon, availableNow drain.
    # Must land on anch1's frozen pure-Python literal: batch-parquet
    # (anch1) and streaming-WARC (this) harvests are string-identical —
    # the st8/st10 container-independence argument extended to the
    # anchor-text face (the anchor stage is a pure DataFrame→DataFrame
    # function, so the batch pipeline IS the streaming pipeline). The
    # eleventh streaming face.
    import tempfile
    import uuid as _uuid

    from greenocr_spark.operators.links import extract_anchors_df
    from greenocr_spark.sources.warc import stream_warc

    pages = stream_warc(spark, _fixture_warc_dir(1500)).select("url", "html")
    an = extract_anchors_df(pages)
    canon = F.concat_ws(
        "\x1f",
        F.col("src"),
        F.col("seq").cast("string"),
        F.col("dst"),
        F.col("anchor"),
    )
    row_h = F.conv(F.substring(F.sha2(canon, 256), 1, 15), 16, 10).cast("long")
    hashed = an.select(row_h.alias("h")).agg(
        F.bit_xor("h").alias("corpus_hash"), F.count("*").alias("n_anchors")
    )
    name = f"st11_{_uuid.uuid4().hex[:8]}"
    qh = (
        hashed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="st11_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not qh.awaitTermination(600):
        qh.stop()
        raise TimeoutError("st11 streaming drain did not finish within 600s")
    return spark.table(name)


@q(
    "rob1_robots_filter",
    """WITH p AS (
        SELECT doc_id, doc_id % 20 AS host_id, doc_id % 4 AS pk,
               doc_id % 7 AS d7
        FROM documents)
    SELECT doc_id,
           CAST(host_id AS BIGINT) AS host_id,
           CASE pk WHEN 0 THEN '/p' || CAST(d7 AS VARCHAR) || '/x'
                   WHEN 1 THEN '/private/ok/page'
                   WHEN 2 THEN '/private/secret'
                   ELSE '/bot/page' END AS path,
           CASE WHEN host_id % 4 = 0 THEN pk <> 3
                ELSE CASE pk
                     WHEN 0 THEN NOT (host_id % 3 = 0 AND d7 = host_id % 7)
                     WHEN 1 THEN TRUE
                     WHEN 2 THEN FALSE
                     ELSE TRUE END
           END AS allowed
    FROM p""",
)
def rob1_robots_filter(spark, sf_dir):
    # robots.txt politeness filter — the crawl-exclusion policy applied to
    # every CC-style corpus. One robots.txt per HOST is PLANTED textually
    # from host-id arithmetic (mixed-case directives, comments, an ignored
    # Sitemap line, a per-host extra Disallow every 3rd host, and a
    # SPECIFIC greenocrbot group every 4th host that must OVERRIDE the *
    # group per RFC 9309), parsed by the REAL parser
    # (extractor/robots.py via operators/robots.compile_robots); page
    # paths are planted from doc_id and decided by pure-JVM longest-
    # prefix-match array lambdas. The DuckDB oracle recomputes the planted
    # truth ARITHMETICALLY, so a green row value-checks the parser, the
    # group-selection rule, the longest-match/Allow-tie decision, and the
    # join shape cross-engine. Scale: the robots table is host-cardinality
    # (tiny at any corpus size) → Arrow parse + BROADCAST join; the
    # per-page decision is a narrow array-lambda projection — zero
    # page-side shuffles at 10^12 rows.
    from greenocr_spark.operators.robots import allowed_col

    d = t(spark, sf_dir, "documents").select("doc_id")
    pages = d.select(
        "doc_id",
        (F.col("doc_id") % 20).alias("host_id"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("/p"), (F.col("doc_id") % 7).cast("string"), F.lit("/x")),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit("/private/ok/page"))
        .when(F.col("doc_id") % 4 == 2, F.lit("/private/secret"))
        .otherwise(F.lit("/bot/page"))
        .alias("path"),
    )
    rules = _planted_robots_rules(spark, sf_dir)
    joined = pages.join(F.broadcast(rules), "host_id")
    return joined.select(
        "doc_id",
        "host_id",
        "path",
        allowed_col("rules", "path").alias("allowed"),
    )


def _planted_robots_rules(spark, sf_dir):
    """(host_id, rules) — the rob1 planted robots corpus compiled through
    the REAL parser for agent greenocrbot; shared by rob1 and pipe4."""
    from greenocr_spark.operators.robots import compile_robots

    h = F.col("host_id")
    robots_txt = F.concat(
        F.lit("# planted robots for host "),
        h.cast("string"),
        F.lit("\nUser-Agent: *\nDisallow: /private\nAllow: /private/ok\n"),
        F.when(
            h % 3 == 0,
            F.concat(F.lit("Disallow: /p"), (h % 7).cast("string"), F.lit("\n")),
        ).otherwise(F.lit("")),
        F.when(
            h % 4 == 0,
            F.lit("\nUser-agent: GreenOCRBot\nDisallow: /bot\n"),
        ).otherwise(F.lit("")),
        F.lit("Sitemap: https://example.org/sitemap.xml\n"),
    )
    hosts = (
        t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 20).alias("host_id"))
        .distinct()
        .withColumn("robots_txt", robots_txt)
    )
    return compile_robots(hosts, "greenocrbot", host_col="host_id")


@q(
    "map1_sitemap_urls",
    """WITH h AS (
        SELECT DISTINCT doc_id % 20 AS host_id FROM documents
    ), e AS (
        SELECT host_id, unnest(range(3 + host_id % 4)) AS i FROM h
    )
    SELECT CAST(host_id AS BIGINT) AS host_id,
           'https://h' || CAST(host_id AS VARCHAR) || '.example/p'
               || CAST(i AS VARCHAR) || '?a=1&b=' || CAST(i % 2 AS VARCHAR)
               AS loc,
           CASE WHEN i % 2 = 0
                THEN '2025-01-0' || CAST(1 + host_id % 9 AS VARCHAR)
                ELSE NULL END AS lastmod
    FROM e""",
)
def map1_sitemap_urls(spark, sf_dir):
    # sitemap.xml url discovery — the crawl-frontier seeding face. One
    # sitemap per HOST is PLANTED textually from host-id arithmetic
    # (3 + h%4 <url> blocks, XML-entity-escaped query strings, lastmod on
    # every other url, mixed-case tags and noise whitespace) and parsed by
    # the REAL parser (extractor/sitemap.py via an Arrow-batched stage);
    # the DuckDB oracle recomputes the planted truth arithmetically, so a
    # green row value-checks the block/loc/lastmod parse and the entity
    # decode cross-engine. Scale: sitemaps are host-cardinality — the
    # parse stage is negligible next to the page corpus at any scale, and
    # the exploded url list feeds the frontier anti-join (the j6 shape)
    # without touching page payloads.
    return _planted_sitemap_table(spark, sf_dir)


def _planted_sitemap_table(spark, sf_dir):
    """(host_id, loc, lastmod) — the map1 planted sitemap corpus parsed
    through the REAL parser; shared by map1 and pipe4."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from greenocr_spark.extractor.sitemap import parse_sitemap

    d = t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 20).alias("host_id")
    ).distinct()
    h = F.col("host_id")

    def urlblock(i: int) -> F.Column:
        loc = F.concat(
            F.lit("<LOC> https://h"),
            h.cast("string"),
            F.lit(f".example/p{i}?a=1&amp;b={i % 2} </loc>"),
        )
        lastmod = (
            F.concat(
                F.lit("<lastmod>2025-01-0"),
                (1 + h % 9).cast("string"),
                F.lit("</lastmod>"),
            )
            if i % 2 == 0
            else F.lit("")
        )
        return F.concat(F.lit("<url>\n  "), loc, lastmod, F.lit("</url>\n"))

    # 3 + h%4 blocks: blocks 0-2 always, 3..5 gated on h%4
    xml = F.concat(
        F.lit('<?xml version="1.0"?>\n<urlset xmlns="x">\n'),
        urlblock(0),
        urlblock(1),
        urlblock(2),
        F.when(h % 4 >= 1, urlblock(3)).otherwise(F.lit("")),
        F.when(h % 4 >= 2, urlblock(4)).otherwise(F.lit("")),
        F.when(h % 4 >= 3, urlblock(5)).otherwise(F.lit("")),
        F.lit("</urlset>\n"),
    )
    sm = d.withColumn("sitemap_xml", xml)
    schema = StructType(
        [
            StructField("host_id", LongType()),
            StructField("loc", StringType()),
            StructField("lastmod", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hosts, locs, mods = [], [], []
            for hid, txt in zip(
                pdf["host_id"].tolist(), pdf["sitemap_xml"].tolist()
            ):
                for loc, lastmod, is_index in parse_sitemap(txt):
                    if is_index:
                        continue
                    hosts.append(hid)
                    locs.append(loc)
                    mods.append(lastmod)
            yield pd.DataFrame({"host_id": hosts, "loc": locs, "lastmod": mods})

    return sm.mapInPandas(run, schema=schema)


@q(
    "pipe4_crawl_frontier",
    """WITH h AS (
        SELECT DISTINCT doc_id % 20 AS host_id FROM documents
    ), e AS (
        SELECT host_id, unnest(range(3 + host_id % 4)) AS i FROM h
    )
    SELECT CAST(host_id AS BIGINT) AS host_id,
           'https://h' || CAST(host_id AS VARCHAR) || '.example/p'
               || CAST(i AS VARCHAR) || '?a=1&b=' || CAST(i % 2 AS VARCHAR)
               AS loc
    FROM e
    WHERE i >= 1
      AND NOT (host_id % 4 <> 0 AND host_id % 3 = 0 AND i = host_id % 7)""",
)
def pipe4_crawl_frontier(spark, sf_dir):
    # Crawl-frontier composition — the capstone of the three crawl faces:
    # sitemap url DISCOVERY (map1's planted corpus through the REAL
    # sitemap parser) → robots POLITENESS filter (rob1's planted corpus
    # through the REAL RFC 9309 parser, pure-JVM longest-match decision on
    # the loc's path) → SEEN-SET anti-join (each host's first sitemap url
    # is 'already crawled'; the j6/P8 resume shape). The oracle recomputes
    # the surviving frontier arithmetically, so a green row value-checks
    # the whole chain end-to-end — including that the specific-bot robots
    # group overrides * (hosts 0/4/8/... keep their /p urls even when
    # h%3==0 plants a /p disallow in *). Scale: every table in the chain
    # except the discovered-urls list is host-cardinality and broadcasts;
    # the url list itself shuffles ZERO times (broadcast equi-join +
    # broadcast anti-join + narrow regexp path extraction) — at 10^9
    # hosts / 10^11 sitemap urls the same plan holds with the rule table
    # bucketed by host instead of broadcast.
    from greenocr_spark.operators.robots import allowed_col

    urls = _planted_sitemap_table(spark, sf_dir)
    rules = _planted_robots_rules(spark, sf_dir)
    path = F.regexp_extract(F.col("loc"), r"^https?://[^/]+(/.*)$", 1)
    seen = (
        t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 20).alias("host_id"))
        .distinct()
        .select(
            F.concat(
                F.lit("https://h"),
                F.col("host_id").cast("string"),
                F.lit(".example/p0?a=1&b=0"),
            ).alias("loc")
        )
    )
    return (
        urls.join(F.broadcast(rules), "host_id")
        .withColumn("path", path)
        .where(allowed_col("rules", "path"))
        .join(F.broadcast(seen), "loc", "left_anti")
        .select("host_id", "loc")
    )
