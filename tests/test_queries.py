"""Oracle gate as pytest: every registered query vs its DuckDB twin at
sf0.001 (mirrors the driver's CORRECTNESS check — row count + schema +
order-insensitive values). Oracle-less entries get a rows/schema-stability
check."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_compare import compare


def _registry():
    import greenocr_spark.battery as b
    import greenocr_spark.battery_ml  # noqa: F401

    return b.REGISTRY


@pytest.mark.parametrize("name", list(_registry().keys()))
def test_query_vs_oracle(spark, name):
    fn, sql = _registry()[name]
    if sql is None:
        df = fn(spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
        return
    problems = compare(spark, SF_DIR, fn, sql)
    assert not problems, "\n".join(p[:800] for p in problems[:5])
