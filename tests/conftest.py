import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from trck_spark.session import get_spark

    s = get_spark("trck_spark_tests", shuffle_partitions=8)
    yield s
