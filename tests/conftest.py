from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from aws_glue_data_catalog_replication_utility_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running property/stress tests"
    )
