"""Operator battery: every SURVEY.md §2 operator as a (Spark query, DuckDB
oracle SQL) pair over the driver's synthetic tables.

Registry contract (driver: __spark_entry__.py):
- each Spark callable takes (spark, sf_dir) and returns a DataFrame;
- the oracle is ANSI SQL DuckDB runs on the same parquet (views
  pre-registered per table name);
- column names are aliased identically on both sides (driver sorts columns
  by name before value-hashing);
- floats that pass through order-dependent accumulation are rounded; sums
  of 2-decimal money go through exact decimal; timestamps are emitted as
  formatted strings (engine-neutral).

Oracle-less entries (value is None) are genuinely non-SQL-expressible
(extraction over binary payloads, fixture-backed pipelines) — the driver
records a rows-only check for those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

REGISTRY: dict = {}  # name -> (callable, oracle_sql | None)


def q(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_rowcount(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Table row count from parquet FOOTER metadata — no Spark job, no data
    scan (VERDICT r04 task 5). The prefix-sum/LSH sizing queries (shuf1,
    chk2, dd7, gr1) need this one scalar before planning; on a real lake it
    comes free from Iceberg snapshot stats / the catalog, and locally the
    parquet footers carry the same number. Falls back to a count() job only
    if the footer read fails (e.g. the path is a view, not parquet)."""
    try:
        import pyarrow.dataset as pads

        ds = pads.dataset(f"{sf_dir}/{name}.parquet", format="parquet")
        return ds.count_rows()  # parquet + no filter = footer-only
    except Exception:
        return t(spark, sf_dir, name).count()


def _dec(col):
    """Exact money sum: 2-decimal doubles → decimal → sum → double."""
    return F.sum(col.cast("decimal(38,2)")).cast("double")


# =========================================================================
# Scans / projections / filters  (SURVEY §2.1, §2.2)
# =========================================================================


@q(
    "s1_scan_project",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       WHERE l_quantity > 45""",
)
def s1_scan_project(spark, sf_dir):
    # P10 + predicate pushdown: filter and projection reach the parquet scan
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@q(
    "p1_null_filter",
    """SELECT event_type, count(*) AS n FROM events
       WHERE props IS NOT NULL AND value IS NOT NULL
       GROUP BY event_type""",
)
def p1_null_filter(spark, sf_dir):
    # P1/P4/P5: malformed-row drop as null-safe filters
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@q(
    "p6_regex_strip",
    """SELECT doc_id,
              regexp_replace(text, '[^a-z ]', '', 'g') AS clean_text
       FROM documents WHERE n_chars < 120""",
)
def p6_regex_strip(spark, sf_dir):
    # P6: vocab-membership projection — drop chars outside the "vocabulary"
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("n_chars") < 120)
        .select("doc_id", F.regexp_replace("text", "[^a-z ]", "").alias("clean_text"))
    )


@q(
    "p7_clamp_math",
    """SELECT p_partkey,
              least(greatest(p_size, 10), 40) AS size_clamped,
              CAST(ceil(p_retailprice / 32) * 32 AS DOUBLE) AS price_bucket
       FROM part""",
)
def p7_clamp_math(spark, sf_dir):
    # F9 clamp + F11 ceil-to-multiple (reference train.py:321,839)
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.least(F.greatest(F.col("p_size"), F.lit(10)), F.lit(40)).alias("size_clamped"),
        (F.ceil(F.col("p_retailprice") / 32) * 32).cast("double").alias("price_bucket"),
    )


@q(
    "f12_ctc_width_law",
    """SELECT l_orderkey, l_linenumber,
              CAST(ceil((2 * l_quantity - 1) * 32 * 1.1) AS BIGINT) AS min_width
       FROM lineitem WHERE l_linenumber = 1""",
)
def f12_ctc_width_law(spark, sf_dir):
    # F12: the reference's CTC feasibility law width ≥ (2·len−1)·32·1.1
    # (train.py:828-830) as a vectorized expression
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ceil((2 * F.col("l_quantity") - 1) * 32 * 1.1).cast("long").alias("min_width"),
    )


@q(
    "p3_feasibility_filter",
    """SELECT doc_id, n_chars FROM documents
       WHERE n_chars <= length(text)""",
)
def p3_feasibility_filter(spark, sf_dir):
    # P3: the CTC feasibility predicate target_len <= input_len
    # (reference train.py:1163-1170) as a column-vs-column data-quality filter
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("n_chars") <= F.length("text"))
        .select("doc_id", "n_chars")
    )


@q(
    "a8_minmax_normalize",
    """SELECT event_id,
              round(CASE WHEN mx = mn THEN 0.0
                         ELSE (value - mn) / (mx - mn) END, 6) AS v_norm
       FROM (SELECT event_id, value,
                    min(value) OVER (PARTITION BY user_id) AS mn,
                    max(value) OVER (PARTITION BY user_id) AS mx
             FROM events)""",
)
def a8_minmax_normalize(spark, sf_dir):
    # A8: the Laplacian-channel (x-min)/(max-min) rescale (train.py:631)
    # as a per-group min/max window normalize
    w = Window.partitionBy("user_id")
    mn, mx = F.min("value").over(w), F.max("value").over(w)
    v = F.when(mx == mn, F.lit(0.0)).otherwise((F.col("value") - mn) / (mx - mn))
    return t(spark, sf_dir, "events").select("event_id", F.round(v, 6).alias("v_norm"))


@q(
    "w2_argmax_per_group",
    """SELECT user_id, event_type AS top_type FROM (
         SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id DESC) AS rn
         FROM events) WHERE rn = 1""",
)
def w2_argmax_per_group(spark, sf_dir):
    # W2: argmax per timestep (exe_t.py:523) → max_by with deterministic
    # struct tie-break, one partial+final aggregate
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max_by("event_type", F.struct("value", "event_id")).alias("top_type"))
    )


# =========================================================================
# Joins  (SURVEY §2.3)
# =========================================================================


@q(
    "j3_dict_decode_join",
    """SELECT c.c_custkey, n.n_name AS nation_name
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE c.c_acctbal > 9000""",
)
def j3_dict_decode_join(spark, sf_dir):
    # J2/J3: the char_to_idx/idx_to_char dictionary decode (exe_t.py:95-99)
    # generalized: a tiny dimension collected once into a create_map literal,
    # applied as a pure projection — zero join, zero shuffle (the literal
    # ships inside the serialized plan, the broadcast-map pattern)
    n = {r["n_nationkey"]: r["n_name"] for r in t(spark, sf_dir, "nation").collect()}
    m = F.create_map(*[F.lit(x) for kv in n.items() for x in kv])
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", m[F.col("c_nationkey")].alias("nation_name"))
    )


@q(
    "j1_broadcast_join_agg",
    """SELECT c.c_mktsegment, count(*) AS n_orders,
              CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def j1_broadcast_join_agg(spark, sf_dir):
    # J1: the dict-lookup join (train.py:889-896) as an explicit broadcast
    # hash join — customer is the small dim, no shuffle of orders
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), _dec(F.col("o_totalprice")).alias("total"))
    )


@q(
    "j2_brand_quantity",
    """SELECT p.p_brand, count(*) AS n, round(avg(l.l_quantity), 4) AS avg_qty
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       GROUP BY p.p_brand""",
)
def j2_brand_quantity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.round(F.avg("l_quantity"), 4).alias("avg_qty"))
    )


@q(
    "j5_semi_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""",
)
def j5_semi_join(spark, sf_dir):
    # P2: label-existence filter as left-semi join (train.py:941-942)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@q(
    "j6_anti_join",
    """SELECT c_custkey FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)
def j6_anti_join(spark, sf_dir):
    # J5: the resume anti-join pattern (north rule) on the star schema
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q(
    "j7_range_join",
    """SELECT s.s_nationkey AS nationkey, count(*) AS n_pairs
       FROM supplier s JOIN customer c
         ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
       GROUP BY s.s_nationkey""",
)
def j7_range_join(spark, sf_dir):
    # J7: non-equi range join (equi key + range predicate)
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .groupBy(s.s_nationkey.alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@q(
    "j8_asof_join",
    """SELECT o.o_orderkey,
              strftime((SELECT max(e.ts) FROM events e
                        WHERE e.user_id = o.o_custkey % 100
                          AND e.ts <= o.o_orderdate), '%Y-%m-%d %H:%M:%S') AS asof_ts
       FROM orders o WHERE o.o_orderkey % 17 = 0""",
)
def j8_asof_join(spark, sf_dir):
    # J7 as-of join via the scalable union+window trick (no per-row subquery):
    # union event rows and probe rows per key, one ordered window pass, carry
    # the last event timestamp forward with last(ignorenulls).
    e = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("ts"), F.lit(0).alias("is_probe"),
        F.col("ts").alias("ev_ts"), F.lit(None).cast("long").alias("o_orderkey"),
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 17 == 0).select(
        (F.col("o_custkey") % 100).alias("k"), F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("is_probe"), F.lit(None).cast("timestamp").alias("ev_ts"),
        F.col("o_orderkey"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.unionByName(o)
        .withColumn("asof", F.last("ev_ts", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            "o_orderkey", F.date_format("asof", "yyyy-MM-dd HH:mm:ss").alias("asof_ts")
        )
    )


@q(
    "j9_shipping_priority",
    """SELECT l.l_orderkey,
              CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
              strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
       FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       GROUP BY l.l_orderkey, o.o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def j9_shipping_priority(spark, sf_dir):
    # TPC-H Q3 shape: selective dim filters pushed below a 3-way join, then
    # agg + top-k. Catalyst broadcasts the filtered customer side; the
    # lineitem date filter reaches the scan.
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,4)")
    ).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@q(
    "j10_local_supplier_volume",
    """SELECT n.n_name AS nation,
              CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
       FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'REGION_1'
       GROUP BY n.n_name""",
)
def j10_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5 shape: 6-way snowflake join with a co-nation equi-condition;
    # region/nation/supplier are broadcast tiers, the fact joins stay on
    # the orderkey spine.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_1")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,4)")
    ).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(rev.alias("revenue"))
    )


# =========================================================================
# Aggregations  (SURVEY §2.4)
# =========================================================================


@q(
    "a1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_base,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS n
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def a1_pricing_summary(spark, sf_dir):
    # A4: the running sum/count/avg metrics loop (train.py:1193-1198) as one
    # partial+final aggregate — TPC-H Q1 shape
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec(F.col("l_quantity")).alias("sum_qty"),
        _dec(F.col("l_extendedprice")).alias("sum_base"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("n"),
    )


@q(
    "a5_argmin_per_group",
    """SELECT event_type, event_id AS min_event_id, round(value, 6) AS min_value
       FROM (SELECT event_type, event_id, value,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS rn
             FROM events) WHERE rn = 1""",
)
def a5_argmin_per_group(spark, sf_dir):
    # A5/O2: argmin with deterministic tie-break (best-checkpoint selection,
    # train.py:1201-1207)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("min_event_id"),
            F.round("value", 6).alias("min_value"),
        )
    )


@q(
    "a6_weighted_avg",
    """SELECT l_returnflag,
              round(sum(l_extendedprice * l_discount) / sum(l_discount), 4) AS w_avg
       FROM lineitem WHERE l_discount > 0 GROUP BY l_returnflag""",
)
def a6_weighted_avg(spark, sf_dir):
    # A6: merge_best_states weighted average Σw·x/Σw (train.py:202-220) as
    # the classic partial+final aggregate
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0)
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")) / F.sum("l_discount"), 4
        ).alias("w_avg")
    )


@q(
    "a7_percentile",
    """SELECT event_type,
              round(quantile_cont(value, 0.01), 4) AS p01,
              round(quantile_cont(value, 0.5), 4) AS p50,
              round(quantile_cont(value, 0.99), 4) AS p99
       FROM events GROUP BY event_type""",
)
def a7_percentile(spark, sf_dir):
    # A7: the 1%/99% contrast-stretch percentiles (exe_t.py:253-262) as
    # exact interpolated percentiles
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.01)), 4).alias("p01"),
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        )
    )


@q(
    "a2_distinct_chars",
    """SELECT DISTINCT unnest(regexp_extract_all(text, '.')) AS ch
       FROM documents""",
)
def a2_distinct_chars(spark, sf_dir):
    # A2: unique character inventory (uniqueLabels.py:4-13)
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.regexp_extract_all("text", F.lit("."), F.lit(0))).alias("ch"))
        .distinct()
    )


@q(
    "a3_minmax",
    """SELECT o_orderpriority, min(o_totalprice) AS min_price,
              max(o_totalprice) AS max_price,
              CAST(max(o_orderkey) AS BIGINT) AS max_key
       FROM orders GROUP BY o_orderpriority""",
)
def a3_minmax(spark, sf_dir):
    # A3: batch max-width aggregate (exe_t.py:166); min/max are exact on
    # doubles regardless of order
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
    )


@q(
    "a11_rollup",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
)
def a11_rollup(spark, sf_dir):
    # A11: grouping sets / rollup for metrics reporting
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@q(
    "a13_count_distinct",
    """SELECT lang, count(DISTINCT source) AS n_sources, count(*) AS n_docs
       FROM documents GROUP BY lang""",
)
def a13_count_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.countDistinct("source").alias("n_sources"), F.count("*").alias("n_docs"))
    )


@q(
    "a12_approx_distinct",
    """SELECT count(DISTINCT user_id) AS exact_users, TRUE AS est_in_bounds
       FROM events""",
)
def a12_approx_distinct(spark, sf_dir):
    # A12: approx_count_distinct for dedup metrics at 10^12 scale (HLL —
    # constant memory per partition, map-side combinable). The raw HLL
    # estimate is engine-specific (another engine's sketch can't
    # hash-match it), but its ERROR CONTRACT can be value-checked: emit
    # the exact count plus a boolean pinning the estimate within ±15% of
    # it (default rsd is 5%; HLL is deterministic on fixed input, so the
    # boolean is stable). The exact side exists only to make the sketch
    # driver-checkable at test scale — production runs the sketch alone.
    est, exact = F.col("est"), F.col("exact_users")
    return (
        t(spark, sf_dir, "events")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id").alias("est"),
        )
        .select(
            "exact_users",
            ((est >= 0.85 * exact) & (est <= 1.15 * exact)).alias(
                "est_in_bounds"
            ),
        )
    )


@q(
    "a15_pivot",
    """SELECT o_orderstatus,
              count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
              count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
              count(*) FILTER (o_orderpriority = '5-LOW') AS low
       FROM orders GROUP BY o_orderstatus""",
)
def a15_pivot(spark, sf_dir):
    # pivot = conditional aggregation with a fixed value list (always give
    # Spark the list — inferring it costs an extra distinct scan at 10^12).
    # coalesce pins absent combinations to 0, matching count(*) FILTER.
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .count()
        .withColumnsRenamed({"1-URGENT": "urgent", "3-MEDIUM": "medium", "5-LOW": "low"})
        .select(
            "o_orderstatus",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("urgent", "medium", "low")],
        )
    )


@q(
    "a16_unpivot",
    """SELECT c_custkey, kind, round(val, 2) AS val FROM (
         SELECT c_custkey, 'acctbal' AS kind, c_acctbal AS val FROM customer
         UNION ALL
         SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer)
       WHERE c_custkey < 100""",
)
def a16_unpivot(spark, sf_dir):
    # unpivot/melt: wide → long without a shuffle (generator-style expand)
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return (
        c.select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "kind", "v")
        .select("c_custkey", "kind", F.round("v", 2).alias("val"))
    )


# =========================================================================
# Windows / ordered-sequence operators  (SURVEY §2.5)
# =========================================================================


@q(
    "w1_ctc_collapse",
    """SELECT user_id, event_id, event_type FROM (
         SELECT user_id, event_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
         FROM events)
       WHERE prev IS NULL OR event_type <> prev""",
)
def w1_ctc_collapse(spark, sf_dir):
    # W1: CTC greedy decode as a window op — emit only where the class
    # changes vs the previous timestep (exe_t.py:420-427). The blank-drop
    # half lives in the extraction pipeline; here the collapse half runs
    # on the events sequence.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .select("user_id", "event_id", "event_type")
    )


@q(
    "w7_topk_per_group",
    """SELECT user_id, event_id, round(value, 6) AS value, rn FROM (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) AS rn
         FROM events) WHERE rn <= 3""",
)
def w7_topk_per_group(spark, sf_dir):
    # W7/O4: ranking + top-k per group
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.round("value", 6).alias("value"), "rn")
    )


@q(
    "w3_moving_avg",
    """SELECT event_id,
              round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS smooth
       FROM events""",
)
def w3_moving_avg(spark, sf_dir):
    # W3: the 3-tap neighborhood smoothing frame (gaussian_blur2d analog,
    # exe_t.py:299) as a window moving average
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-1, 1)
    )
    return (
        t(spark, sf_dir, "events")
        .select("event_id", F.round(F.avg("value").over(w), 4).alias("smooth"))
    )


@q(
    "w5_second_diff",
    """SELECT event_id,
              round(value - 2 * lag(value) OVER w + lag(value, 2) OVER w, 4)
                  + 0.0 AS laplace
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def w5_second_diff(spark, sf_dir):
    # W5: Laplacian second difference (train.py:630) over the event
    # sequence. `+ 0.0` on BOTH sides: a second difference that lands
    # exactly on zero can round to -0.0 in one engine and +0.0 in the
    # other (seen once at sf0.1), and the two are value-equal but
    # byte-hash-different; IEEE -0.0 + 0.0 = +0.0 normalizes the sign
    # while changing nothing else (NULLs stay NULL).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id",
        (
            F.round(
                F.col("value")
                - 2 * F.lag("value", 1).over(w)
                + F.lag("value", 2).over(w),
                4,
            )
            + F.lit(0.0)
        ).alias("laplace"),
    )


@q(
    "w4_contrast_rescore",
    """WITH p AS (
        SELECT user_id, quantile_cont(value, 0.01) AS lo,
               quantile_cont(value, 0.99) AS hi
        FROM events GROUP BY user_id),
    n AS (
        SELECT e.event_id, e.user_id, e.ts,
               CASE WHEN p.hi - p.lo < 1e-9 THEN CAST(e.value > 0 AS DOUBLE)
                    ELSE least(greatest((e.value - p.lo) / (p.hi - p.lo), 0.0), 1.0)
               END AS norm
        FROM events e JOIN p ON e.user_id = p.user_id),
    s AS (
        SELECT event_id, norm,
               0.25 * coalesce(lag(norm) OVER w, norm)
               + 0.5 * norm
               + 0.25 * coalesce(lead(norm) OVER w, norm) AS smooth
        FROM n WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id,
           round(least(greatest(norm + 1.5 * (norm - smooth), 0.0), 1.0), 6) AS sharp
    FROM s""",
)
def w4_contrast_rescore(spark, sf_dir):
    # The reference's full restoration math (exe_t.py:253-262, 299-300) as
    # ONE relational pipeline: per-group 1%/99% contrast stretch (A7) →
    # 3-tap edge-replicated neighborhood smoothing (W3) → unsharp rescore
    # with clamp (W4/F9). This is the window-form twin of the in-UDF
    # scoring spec (core.score_blocks) — same constants, same kernel.
    e = t(spark, sf_dir, "events")
    pcts = e.groupBy("user_id").agg(
        F.percentile("value", F.lit(0.01)).alias("lo"),
        F.percentile("value", F.lit(0.99)).alias("hi"),
    )
    n = e.join(F.broadcast(pcts), "user_id").withColumn(
        "norm",
        F.when((F.col("hi") - F.col("lo")) < 1e-9, (F.col("value") > 0).cast("double"))
        .otherwise(
            F.least(
                F.greatest((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")), F.lit(0.0)),
                F.lit(1.0),
            )
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    smooth = (
        0.25 * F.coalesce(F.lag("norm").over(w), F.col("norm"))
        + 0.5 * F.col("norm")
        + 0.25 * F.coalesce(F.lead("norm").over(w), F.col("norm"))
    )
    sharp = F.least(
        F.greatest(F.col("norm") + 1.5 * (F.col("norm") - smooth), F.lit(0.0)), F.lit(1.0)
    )
    return n.select("event_id", F.round(sharp, 6).alias("sharp"))


@q(
    "ts1_resample_ffill",
    """WITH b AS (
        SELECT user_id,
               to_timestamp(floor(epoch(ts) / 21600) * 21600) AS bucket,
               round(sum(value), 4) AS v
        FROM events GROUP BY 1, 2),
    ext AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY 1),
    spine AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket
        FROM ext),
    j AS (SELECT s.user_id, s.bucket, b.v
          FROM spine s LEFT JOIN b ON b.user_id = s.user_id AND b.bucket = s.bucket)
    SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS UNBOUNDED PRECEDING), 4) AS v_ffill,
           (v IS NOT NULL) AS observed
    FROM j""",
)
def ts1_resample_ffill(spark, sf_dir):
    # time-series resample to a 6-hour grid with forward fill: per-key
    # spine via sequence+explode (no shuffle beyond the agg), left join
    # observed buckets, last(ignorenulls) carries values across gaps —
    # the standard gap-fill plan shape for sparse event streams
    e = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    b = (
        e.withColumn("bucket", F.timestamp_seconds(F.floor(sec / 21600) * 21600))
        .groupBy("user_id", "bucket")
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    ext = b.groupBy("user_id").agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    spine = ext.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 6 hours"))).alias("bucket"),
    )
    j = spine.join(b, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("v_ffill"),
        F.col("v").isNotNull().alias("observed"),
    )


@q(
    "w8_first_last",
    """SELECT DISTINCT user_id,
              first_value(event_type) OVER w AS first_type,
              last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def w8_first_last(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(wfull).alias("last_type"),
        )
        .distinct()
    )


# =========================================================================
# Sorts / limits / set ops  (SURVEY §2.6, §2.7)
# =========================================================================


@q(
    "o1_topk_orders",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def o1_topk_orders(spark, sf_dir):
    # O2/O3: global top-k (TakeOrderedAndProject — no full sort at scale)
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@q(
    "u1_union_tagged",
    """SELECT src, count(*) AS n FROM (
         SELECT 'high' AS src FROM orders WHERE o_totalprice > 300000
         UNION ALL
         SELECT 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT')
       GROUP BY src""",
)
def u1_union_tagged(spark, sf_dir):
    # U1: multi-source union with source tag (train.py:885-989)
    o = t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 300000).select(F.lit("high").alias("src"))
    ur = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src")
    )
    return hi.unionByName(ur).groupBy("src").agg(F.count("*").alias("n"))


@q(
    "u2_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""",
)
def u2_intersect(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.intersect(b)


@q(
    "u3_except",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 0
       EXCEPT
       SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000""",
)
def u3_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.exceptAll(o).distinct()


@q(
    "f25_histogram",
    """SELECT CASE WHEN value < 0 THEN 0
                   WHEN value >= 200 THEN 11
                   ELSE CAST(floor((value - 0) / (200 - 0) * 10) AS BIGINT) + 1
              END AS bin,
              count(*) AS n, round(min(value), 4) AS lo, round(max(value), 4) AS hi
       FROM events GROUP BY 1""",
)
def f25_histogram(spark, sf_dir):
    # equi-width histogram via width_bucket — one partial+final agg;
    # the oracle replicates width_bucket's documented bin law exactly
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.width_bucket("value", F.lit(0), F.lit(200), F.lit(10)).alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@q(
    "f24_scalar_subquery",
    """SELECT o_orderkey,
              round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6)
              AS price_ratio
       FROM orders WHERE o_orderkey % 13 = 0""",
)
def f24_scalar_subquery(spark, sf_dir):
    # scalar subquery (Catalyst rewrites to a broadcast one-row join);
    # expressed explicitly as crossJoin(broadcast(agg)) — identical plan
    o = t(spark, sf_dir, "orders")
    avg = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .crossJoin(F.broadcast(avg))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") / F.col("_avg"), 6).alias("price_ratio"),
        )
    )


@q(
    "a18_stats_suite",
    """SELECT l_returnflag,
              round(stddev_samp(l_quantity), 4) AS sd_qty,
              round(var_samp(l_discount), 6) AS var_disc,
              round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
              round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
       FROM lineitem GROUP BY l_returnflag""",
)
def a18_stats_suite(spark, sf_dir):
    # statistical aggregates: all single-pass partial+final (Welford-style
    # combiners) — constant memory per partition at any scale
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qp"),
        )
    )


# =========================================================================
# Scalar functions  (SURVEY §2.8)
# =========================================================================


@q(
    "f1_canon_ws",
    """SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS canon
       FROM documents""",
)
def f1_canon_ws(spark, sf_dir):
    # F1: whitespace canonicalization — the byte-identity-critical final step
    return t(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace(F.trim(F.col("text")), r"\s+", " ").alias("canon")
    )


@q(
    "f2_string_suite",
    """SELECT c_custkey,
              split_part(c_name, '#', 2) AS cust_num,
              upper(c_mktsegment) AS seg,
              length(c_name) AS name_len,
              concat(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nation
       FROM customer""",
)
def f2_string_suite(spark, sf_dir):
    # F2-F6: split/concat/upper/length over the 'Customer#000000042' shape
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split("c_name", "#").getItem(1).alias("cust_num"),
        F.upper("c_mktsegment").alias("seg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    )


@q(
    "f18_date_trunc",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
              count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1""",
)
def f18_date_trunc(spark, sf_dir):
    # F18: event-time bucketing over warc_ts-like timestamps
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@q(
    "f19_json_extract",
    """SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
       FROM events GROUP BY 1""",
)
def f19_json_extract(spark, sf_dir):
    # F19: JSON scalar extraction from the props column
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.get_json_object("props", "$.k").alias("k"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "f20_url_host",
    """SELECT doc_id, lang || '.wikipedia.org' AS host FROM documents""",
)
def f20_url_host(spark, sf_dir):
    # F20: host extraction feeds skew salting; construct a url, then parse
    # the host back out with the engine's parse_url
    d = t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("lang"), F.lit(".wikipedia.org/doc/"),
                   F.col("doc_id").cast("string"))
    return d.select("doc_id", F.parse_url(url, F.lit("HOST")).alias("host"))
