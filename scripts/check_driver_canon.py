"""Simulate the driver's CORRECTNESS canonicalizer (pandas sort_values over
all columns + string value hash) for a named subset of queries, at a given
sf dir. Usage: python scripts/check_driver_canon.py [sf_dir] name1 name2 ...
Defaults to the four rows that were red in CORRECTNESS_r02.json.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_compare import (  # noqa: E402
    driver_canon_hash as _canon,
    duck_connection,
)


def main() -> int:
    args = sys.argv[1:]
    if args and (os.path.sep in args[0] or args[0].startswith("sf")):
        sf_dir = args.pop(0)
        if not os.path.isdir(sf_dir):
            print(f"sf_dir does not exist: {sf_dir}", file=sys.stderr)
            return 2
    else:
        sf_dir = "/root/testdata/sf0.01"
    run_all = "--all" in args
    args = [a for a in args if a != "--all"]
    names = args or (
        None  # resolved to every oracle-backed entry after registry import
        if run_all
        else ["w9_sessionize", "arr2_set_ops", "f13_pad_tokens", "mm2_frame_sample"]
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import greenocr_spark.battery as b
    import greenocr_spark.battery_ml  # noqa: F401

    if names is None:
        names = [n for n, (_, sql) in b.REGISTRY.items() if sql is not None]

    con = duck_connection(sf_dir)

    failed = []
    for name in names:
        fn, sql = b.REGISTRY[name]
        spdf = fn(spark, sf_dir).toPandas()
        odf = con.execute(sql).fetchdf()
        rows_ok = len(spdf) == len(odf)
        schema_ok = sorted(spdf.columns) == sorted(odf.columns)
        try:
            hash_ok = _canon(spdf) == _canon(odf)
        except Exception as e:  # canonicalizer crash = driver red
            hash_ok = False
            print(f"{name}: CANON ERROR {type(e).__name__}: {e}")
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(f"{name}: rows={rows_ok}({len(spdf)}/{len(odf)}) schema={schema_ok} hash={hash_ok} -> {status}")
        if status == "FAIL":
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
