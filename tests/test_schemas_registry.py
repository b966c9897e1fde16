"""Reference schema registry (FIXTURES.md port): every declared
schema parses, matches its dedup config, and aligns arbitrary input
with the reference's reconciliation semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dot_spark.operators.dedup import DEDUP_CONFIG, dedupe_keep_latest
from dot_spark.schemas import DDL, align_to, columns_of, struct_of


@pytest.mark.parametrize("name", sorted(DDL))
def test_schema_parses(spark, name):
    st = struct_of(name)
    assert len(st.fields) >= 1
    # every field nullable (BigQuery NULLABLE mode throughout)
    assert all(f.nullable for f in st.fields)


def test_dedup_config_keys_exist_in_schemas(spark):
    # the per-table dedup registry (okta-sync/main.py:24-30) must
    # reference real columns of the declared schemas
    for table, (keys, order) in DEDUP_CONFIG.items():
        cols = set(columns_of(table))
        assert set(keys) <= cols, table
        assert set(order) <= cols, table


def test_align_to_reference_semantics(spark):
    # raw API frame: wrong type for created, missing lastUpdated,
    # extra column to drop
    raw = spark.createDataFrame(
        [("u1", "ACTIVE", "2026-01-02 03:04:05", "junk")],
        "id STRING, status STRING, created STRING, extra_col STRING",
    )
    out = align_to(raw, "okta_users")
    assert [f.name for f in out.schema.fields] == list(columns_of("okta_users"))
    row = out.collect()[0]
    assert row.id == "u1" and row.status == "ACTIVE"
    assert row.created is not None          # cast string -> timestamp
    assert row.lastUpdated is None          # added as typed null
    assert "extra_col" not in out.columns   # dropped


def test_registry_schema_drives_keep_latest_dedup(spark):
    dup = spark.createDataFrame(
        [
            ("g1", "u1", "2026-01-01 00:00:00", "2026-01-01 00:00:00"),
            ("g1", "u1", "2026-01-02 00:00:00", "2026-01-01 00:00:00"),
            ("g2", "u1", "2026-01-01 00:00:00", "2026-01-01 00:00:00"),
        ],
        "group_id STRING, id STRING, lastUpdated STRING, created STRING",
    )
    aligned = align_to(dup, "okta_group_members")
    keys, order = DEDUP_CONFIG["okta_group_members"]
    out = dedupe_keep_latest(aligned, keys, order)
    assert out.count() == 2
    kept = out.filter(F.col("group_id") == "g1").collect()[0]
    assert str(kept.lastUpdated).startswith("2026-01-02")
