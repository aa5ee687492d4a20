from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbitool_spark.session import get_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("dbitool_spark-tests", cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    yield s
    s.stop()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: scale-shaped measurements (10^6-row state); run in CI but "
        "deselectable with -m 'not slow' for quick iteration",
    )
