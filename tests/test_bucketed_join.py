"""Bucketed co-located join — the shuffle-elimination technique for the
repeated big-big join at 100 TB (SURVEY.md §4: "repartition/bucketing for
co-located joins"). Writing both fact tables bucketed by the join key lets
every subsequent join run exchange-free: each task reads matching buckets
from both sides. At 10^12 rows this turns the recurring orders⋈lineitem
shuffle (the single most expensive exchange in the TPC-H-shape workload)
into a narrow scan, paid once at write time.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark):
    import shutil

    n_buckets = 4
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a previously failed run can leave the managed location without a
    # catalog entry; saveAsTable refuses to reuse it
    for t_ in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"/tmp/greenocr_test_warehouse/{t_}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )

    # at test scale the dim side would broadcast and bucketing would be
    # moot; force the big-big SMJ shape this test is about
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        p = _plan(joined)
        # the join itself must not shuffle either side: bucketed scan feeds
        # SortMergeJoin directly; the only exchange is the tiny final agg
        join_section = p.split("HashAggregate")[0]
        assert "SortMergeJoin" in p
        assert "Exchange" not in join_section, join_section
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_thresh)

    # same results as the plain (shuffling) join
    plain = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    want = {(r["o_orderpriority"], r["n"]) for r in plain.collect()}
    assert got == want

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
