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
    """Extract the host from a url (F20) — feeds skew salting."""
    return F.parse_url(F.col(url_col) if isinstance(url_col, str) else url_col, F.lit("HOST"))


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
    df, url_col: str, n_parts: int, n_salts: int = 8, hot_frac: float = 0.05
):
    """Skew-aware partition key: salt ONLY hot hosts (Scarlett-style skew
    handling — spread popular content, keep the long tail co-located).

    Two phases, both cheap at any scale:
      1. stats: one partial-aggregated count per host (#hosts << #rows),
         keep hosts holding > hot_frac of rows;
      2. assign: broadcast the hot-host list; hot hosts get the per-url
         salt folded into the key, cold hosts hash by host alone —
         preserving host locality (cache/dns/politeness affinity) that
         uniform salting destroys.

    Returns (df_with_part_id, hot_hosts). Uniform salting
    (salted_part_id) remains the default for unknown distributions."""
    from pyspark.sql import functions as F

    host = host_expr(url_col)
    # ONE scan of the input: materialize the per-host count aggregate
    # (#hosts rows << #rows), then derive the grand total and the hot set
    # from that cached aggregate — the old separate df.count() was a second
    # full pass over the input (VERDICT r01 item 4).
    per_host = df.select(host.alias("h")).groupBy("h").count().cache()
    try:
        total = per_host.agg(F.sum("count")).first()[0] or 0
        hot = [
            r["h"]
            for r in per_host.filter(F.col("count") > hot_frac * total).collect()
        ]
    finally:
        per_host.unpersist()
    return (
        df.withColumn("part_id", hot_salted_part_id(url_col, hot, n_parts, n_salts)),
        hot,
    )


def hot_salted_part_id(url_col: str, hot: list, n_parts: int, n_salts: int = 8) -> Column:
    """part_id for a KNOWN hot-host list: hot hosts get the per-url salt
    folded in, cold hosts hash by host alone. Split out so a resumed job can
    reuse the hot list persisted by the first run (part_id stability across
    runs must not depend on re-deriving hot hosts from a changed input —
    ADVICE r01)."""
    host = host_expr(url_col)
    if hot:
        hot_arr = F.array(*[F.lit(h) for h in hot])
        key = F.when(
            F.array_contains(hot_arr, host),
            F.xxhash64(host, salt_expr(url_col, n_salts)),
        ).otherwise(F.xxhash64(host))
    else:
        key = F.xxhash64(host)
    return F.pmod(key, F.lit(n_parts))


def pdf_magic_expr(html_col) -> Column:
    """Router predicate: binary payload starts with %PDF- (the RealESRGAN
    raw-binary branch analog, ENHANCMENT24.py:93-107)."""
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.startswith(col, F.lit(b"%PDF-"))
