import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinyflux_spark.schema import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tinyflux_spark_tests", cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    yield s
