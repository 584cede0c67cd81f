from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_spark.session import get_spark

# t2 gate scale; override with SPARK_GRAFT_TEST_SF=sf0.001 for quick iteration.
SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"),
    os.environ.get("SPARK_GRAFT_TEST_SF", "sf0.01"),
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mfs-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# module-scope alias usable inside hypothesis @given tests (function-scoped
# fixtures clash with hypothesis; the session fixture does not)
@pytest.fixture(scope="session")
def spark_global():
    return get_spark(app_name="mfs-tests")
