import os

import pytest

from datafusion_uba_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # small + pinned for deterministic plans, mirroring the reference's
    # target_partitions=4 test harness (tests/sqllogictests/src/main.rs:242-244)
    s = get_spark(app_name="uba-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
