"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from dot_spark.queries import ORACLE, QUERIES


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    df.limit(5).collect()  # force execution of a sample
