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


def test_queries_survive_bare_driver_session(tmp_path):
    """The harness may run queries() on a SparkSession it built
    itself — none of get_spark's configs present. load_table's
    ensure_session_confs must make the risky surfaces (TIMESTAMP
    NANOS events, Python-source pushdown, Arrow UDFs) work anyway.
    Subprocess: one JVM per process."""
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[4]').getOrCreate()\n"
        "from dot_spark.queries import QUERIES\n"
        "for n in ('a2_watermark_max', 's2_paged_rest_scan', 'f8_hmac_sha256'):\n"
        "    assert len(QUERIES[n](spark, '/root/testdata/sf0.001').collect()) >= 0, n\n"
        "print('BARE_SESSION_OK')\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "BARE_SESSION_OK" in out.stdout, out.stderr[-2000:]
