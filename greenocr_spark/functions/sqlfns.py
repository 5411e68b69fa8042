"""JVM-side (Catalyst-native) column expressions used across the engine.

Everything here compiles into whole-stage codegen — no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canon_ws_expr(col) -> Column:
    """F1 whitespace canonicalization as a JVM expression (for SQL-side
    queries; the byte-identity path uses core.canon_ws inside the UDF).

    Reference analog: ' '.join(text.split()) (exe_t.py:531-532)."""
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def host_expr(url_col) -> Column:
    """Extract the host from a url (F20) — feeds skew salting.

    try_parse_url, not parse_url: Spark 4's parse_url RAISES
    INVALID_URL on malformed input, which would fail the whole job on one
    bad crawl record. Unparseable urls yield NULL host and are treated as
    cold (hashed by the NULL host, never salted hot)."""
    return F.try_parse_url(
        F.col(url_col) if isinstance(url_col, str) else url_col, F.lit("HOST")
    )


def salt_expr(url_col, n_salts: int) -> Column:
    """Deterministic per-url salt in [0, n_salts) (F8 made deterministic —
    the reference's random 5-char filename prefix, ENHANCMENT24.py:80-81,
    replaced by a pure function of the row)."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_salts))


def salted_part_id(url_col, n_parts: int, n_salts: int = 8) -> Column:
    """Partition key: hash of (host, salt(url)) mod n_parts.

    Host-level locality with explicit skew mitigation (north rule): a host
    carrying 30% of rows is spread over n_salts distinct partitions instead
    of melting one task — the width-bucket analog (X1, train.py:899-907)."""
    return F.pmod(
        F.xxhash64(host_expr(url_col), salt_expr(url_col, n_salts)),
        F.lit(n_parts),
    )


def adaptive_salted_part_id(
    df, url_col: str, n_parts: int, n_salts: int = 8
):
    """Skew-aware partition key: salt hot hosts PROPORTIONALLY to their
    size, keep the long tail host-local (Scarlett-style skew handling).

    Budget rule: with budget = total/n_parts rows per ideal partition, any
    host whose count exceeds the budget is spread over ceil(count/budget)
    salts (capped at n_parts) — so every host's partitions converge to
    ~budget rows regardless of how skewed the host distribution is. A
    fixed salt count (the old top-host-only design) fails both ways: the
    30%-host still overfills its n_salts partitions, and a corpus with few
    distinct hosts leaves most partitions empty while each cold host melts
    one task.

    Two phases, both cheap at any scale:
      1. stats: one partial-aggregated count per host (#hosts << #rows);
         the grand total derives from the same cached aggregate — no
         second pass over the input (VERDICT r01 item 4);
      2. assign: fold the per-host salt count into the key via a literal
         map (hot hosts << n_parts entries); cold hosts hash by host
         alone, preserving host locality (cache/dns/politeness affinity)
         that uniform salting destroys.

    Returns (df_with_part_id, hot) where hot is {host: n_salts_for_host}.
    `n_salts` is accepted for signature stability but the salt count is
    derived from the data. Uniform salting (salted_part_id) remains the
    default for unknown distributions."""
    import math

    host = host_expr(url_col)
    per_host = df.select(host.alias("h")).groupBy("h").count().cache()
    try:
        total = per_host.agg(F.sum("count")).first()[0] or 0
        budget = max(total / n_parts, 1.0)
        # NULL hosts (unparseable urls) stay cold even over budget: a None
        # key would break sorted(hot.items()) and is invalid as a
        # create_map literal key (ADVICE r02). They hash by host alone —
        # all-NULL-host skew is not salvageable by salting anyway (no
        # per-host identity to spread), and in practice such rows are
        # rejects headed for the error sink.
        hot = {
            r["h"]: min(n_parts, math.ceil(r["count"] / budget))
            for r in per_host.filter(
                F.col("h").isNotNull() & (F.col("count") > budget)
            ).collect()
        }
    finally:
        per_host.unpersist()
    return (
        df.withColumn("part_id", hot_salted_part_id(url_col, hot, n_parts, n_salts)),
        hot,
    )


def hot_salted_part_id(url_col: str, hot, n_parts: int, n_salts: int = 8) -> Column:
    """part_id for a KNOWN hot-host assignment: hot hosts get a per-url salt
    in [0, salts_for_host) folded in, cold hosts hash by host alone. Split
    out so a resumed job can reuse the hot map persisted by the first run
    (part_id stability across runs must not depend on re-deriving hot hosts
    from a changed input — ADVICE r01).

    `hot` is {host: n_salts_for_host}; a plain list is accepted for
    backward compatibility and means n_salts salts per listed host.

    Hot buckets are laid out ROUND-ROBIN, not hashed: bucket (host, salt)
    gets part_id = (offset_of_host + salt) % n_parts, with offsets the
    running sum of salt counts over the sorted hot map. Hashing each
    bucket independently put ~n_parts random keys into n_parts bins —
    birthday collisions stacked 3-4 budget-sized buckets onto one
    partition (observed 8x row skew at the 2M-page soak); the sequential
    layout gives every partition ⌈buckets/n_parts⌉ hot buckets at most,
    and stays deterministic across resume because the offsets derive from
    the persisted map itself."""
    host = host_expr(url_col)
    if isinstance(hot, (list, tuple)):
        hot = {h: n_salts for h in hot}
    if hot:
        items = sorted(hot.items())
        offsets, acc = {}, 0
        for h, s in items:
            offsets[h] = acc
            acc += int(s)
        salts_map = F.create_map(
            *[x for h, s in items for x in (F.lit(h), F.lit(int(s)))]
        )
        off_map = F.create_map(
            *[x for h, _ in items for x in (F.lit(h), F.lit(offsets[h]))]
        )
        salts = salts_map[host]  # NULL for cold hosts
        url = F.col(url_col) if isinstance(url_col, str) else url_col
        return F.when(
            salts.isNotNull(),
            F.pmod(off_map[host] + F.pmod(F.xxhash64(url), salts), F.lit(n_parts)),
        ).otherwise(F.pmod(F.xxhash64(host), F.lit(n_parts)))
    return F.pmod(F.xxhash64(host), F.lit(n_parts))


def pdf_magic_expr(html_col) -> Column:
    """Router predicate: binary payload starts with %PDF- (the RealESRGAN
    raw-binary branch analog, ENHANCMENT24.py:93-107)."""
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.startswith(col, F.lit(b"%PDF-"))
