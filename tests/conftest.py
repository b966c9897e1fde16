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


def norm_toks(text: str) -> list[str]:
    """Driver-side replay of dot_spark's normalize_text + split,
    shared by every replay test so the tokenizer can't silently
    diverge copy-by-copy (the r11 tab bug: str.strip() eats tabs,
    Spark's trim strips only ASCII spaces). Shares no code with the
    engine."""
    import re

    return re.sub(" +", " ", text.lower()).strip(" ").split(" ")
