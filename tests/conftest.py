from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from aws_glue_data_catalog_replication_utility_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_TEST_CPUS sizes the shared test session (r13,
    # VERDICT r12 #4 — the driver's pytest gate must finish inside its
    # window): the compute-bound suites (scale probes, CC/close
    # towers, the CLI corpus pipelines) dominate the suite's wall time
    # and were pinned to 4 cores on a 32-core box. Measured on the
    # heavy subset (corpus-build e2e + both scale probes, quiet box):
    # 338 s at 4 cores, 227 s at 12, 255 s at 16 (over-slicing tiny
    # inputs turns back up) — 12 is the knee. shuffle_partitions stays
    # at 4 so shuffle-stage task counts are unchanged.
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "12"))
    s = get_spark(app_name="tests", cpus=cpus, shuffle_partitions=4)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running property/stress tests"
    )
