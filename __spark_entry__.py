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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries get the driver's rows-only check."""
    return {name: sql for name, (_, sql) in _registry().items() if sql is not None}
