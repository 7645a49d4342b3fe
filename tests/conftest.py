from __future__ import annotations

import os

import pytest

# Tests default to a smaller local parallelism than the 32-thread bench
# session: tiny inputs + 32 shuffle partitions is pure scheduler overhead.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

#: The driver's correctness tier runs at sf0.01 — tests mirror it exactly.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from sealnet_etl_spark.session import get_spark

    session = get_spark(app_name="sealnet-etl-spark-tests")
    yield session
    session.stop()
