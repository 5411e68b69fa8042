import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from greenocr_spark.session import build_session

    s = build_session(
        app_name="greenocr-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            # keep catalog state (bucketed-table test) out of the repo tree
            "spark.sql.warehouse.dir": "/tmp/greenocr_test_warehouse",
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/greenocr_derby",
        },
    )
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s
    s.stop()


SF_DIR = os.environ.get("GREENOCR_TEST_SF_DIR", "/root/testdata/sf0.001")
