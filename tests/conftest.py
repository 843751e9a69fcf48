import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loong_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "loong-tests",
        cores=int(os.environ.get("LOONG_TEST_CORES", "8")),
        shuffle_partitions=8,  # tiny fixtures: task-launch overhead dominates
    )
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")
