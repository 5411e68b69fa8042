"""Iteration harness: run every registry query vs its DuckDB oracle at a
small sf and print a pass/fail table. Not a pytest file — use for fast
loop during development:  python tests/run_battery_check.py [names...]
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_compare import compare  # noqa: E402

SF_DIR = os.environ.get("GREENOCR_TEST_SF_DIR", "/root/testdata/sf0.001")


def main():
    from greenocr_spark.session import build_session
    import greenocr_spark.battery as b
    import greenocr_spark.battery_ml  # noqa: F401

    only = set(sys.argv[1:])
    spark = build_session(app_name="battery-check", master="local[4]", shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")

    n_pass = n_fail = n_rows_only = 0
    for name, (fn, sql) in b.REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if sql is None:
                df = fn(spark, SF_DIR)
                n = df.count()
                print(f"  ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                continue
            problems = compare(spark, SF_DIR, fn, sql)
            if problems:
                n_fail += 1
                print(f"✗ FAIL {name} ({time.time()-t0:.1f}s)")
                for p in problems[:5]:
                    print("   ", p[:500])
            else:
                n_pass += 1
                print(f"✓ pass {name} ({time.time()-t0:.1f}s)")
        except Exception as e:
            n_fail += 1
            print(f"✗ ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            if only:
                traceback.print_exc()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()


if __name__ == "__main__":
    main()
