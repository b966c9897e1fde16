from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dot_spark import get_spark  # noqa: E402

SF_TEST_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dot_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST_DIR
