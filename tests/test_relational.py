"""Relational core (reference J1-J4, A1-A2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dot_spark.operators.relational import (
    anti_join,
    broadcast_lookup,
    group_having_count,
    union_distinct,
    watermark_max,
)


def test_anti_join_excludes(spark):
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    excl = spark.createDataFrame([("b",)], "id string")
    assert sorted(r.id for r in anti_join(ids, excl, "id").collect()) == ["a", "c"]


def test_anti_join_is_broadcast(spark):
    ids = spark.createDataFrame([("a",)], "id string")
    excl = spark.createDataFrame([("b",)], "id string")
    plan = anti_join(ids, excl, "id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_union_distinct(spark):
    a = spark.createDataFrame([("x",), ("y",)], "id string")
    b = spark.createDataFrame([("y",), ("z",)], "id string")
    assert sorted(r.id for r in union_distinct(a, b).collect()) == ["x", "y", "z"]


def test_broadcast_lookup_left_keeps_unmatched(spark):
    facts = spark.createDataFrame([(1, "j1"), (2, "jX")], "id long, job string")
    dim = spark.createDataFrame([("j1", "fabric")], "job string, target string")
    out = {r.id: r.target for r in broadcast_lookup(facts, dim, "job").collect()}
    assert out == {1: "fabric", 2: None}


def test_group_having_threshold(spark):
    df = spark.createDataFrame([("g1",)] * 5 + [("g2",)] * 2, "gid string")
    out = group_having_count(df, ["gid"], 3).collect()
    assert len(out) == 1 and out[0].gid == "g1" and out[0].cnt == 5


def test_watermark_max_with_predicate(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [("s1", dt.datetime(2024, 1, 1)), ("s1", dt.datetime(2024, 1, 5)),
         ("s2", dt.datetime(2024, 1, 9))],
        "store string, ts timestamp",
    )
    wm = watermark_max(df, "ts", F.col("store") == "s1").collect()[0].watermark
    assert wm == dt.datetime(2024, 1, 5)
