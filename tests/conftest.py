import os
import tempfile

import pytest

from datafusion_uba_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

# Unique managed-table warehouse per test session (get_spark honors
# SPARK_WAREHOUSE_DIR). A shared /tmp warehouse poisons every future
# run when a session dies mid-test: the catalog forgets the table but
# its location dir survives, DROP TABLE IF EXISTS no-ops, and the next
# saveAsTable fails LOCATION_ALREADY_EXISTS (r18's driver-side pytest
# timeout left exactly this mine behind for the r19 baseline run).
os.environ.setdefault(
    "SPARK_WAREHOUSE_DIR", tempfile.mkdtemp(prefix="uba-test-warehouse-")
)


@pytest.fixture(scope="session")
def spark():
    # shuffle_partitions stays pinned at 4 for deterministic plans,
    # mirroring the reference's target_partitions=4 test harness
    # (tests/sqllogictests/src/main.rs:242-244). cpus is pure execution
    # parallelism (it changes no plan shape — broadcast thresholds and
    # partition counts are conf-driven) and defaults higher so the
    # suite fits the driver's verify window (r18 verdict item 3: the
    # 33-minute wall at cpus=4 timed out the driver's pytest gate; the
    # compute-bound files — ANN calibration, oracle parity on the dedup
    # rows — are 2-3x faster at 16). UBA_TEST_CPUS overrides.
    s = get_spark(
        app_name="uba-tests",
        cpus=int(os.environ.get("UBA_TEST_CPUS", "16")),
        shuffle_partitions=4,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
