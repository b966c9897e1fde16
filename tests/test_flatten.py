"""Nested-data operators (reference N2-N5, woo-sync/main.py:570-1129)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dot_spark.operators.flatten import (
    element_first_last,
    explode_with_parent,
    kv_pivot,
    sticky_carry,
)


def test_explode_carries_parent(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], "oid long, items array<string>")
    out = explode_with_parent(df, "items", ["oid"], child_alias="item")
    assert sorted((r.oid, r.item) for r in out.collect()) == [(1, "a"), (1, "b"), (2, "c")]


def test_explode_with_position(spark):
    df = spark.createDataFrame([(1, ["a", "b"])], "oid long, items array<string>")
    out = explode_with_parent(df, "items", ["oid"], child_alias="item", with_position=True)
    assert sorted((r.pos, r.item) for r in out.collect()) == [(0, "a"), (1, "b")]


def test_kv_pivot_known_keys_and_defaults(spark):
    # meta_data pivot: known keys lifted, defaults applied, unknown ignored
    df = spark.createDataFrame(
        [(1, "cost", "9.5"), (1, "junk", "zzz"), (2, "origin", "PHONE")],
        "pid long, k string, v string",
    )
    out = {r.pid: (r.cost, r.origin) for r in
           kv_pivot(df, "pid", "k", "v", {"cost": "0", "origin": "WEB"}).collect()}
    assert out == {1: ("9.5", "WEB"), 2: ("0", "PHONE")}


def test_element_first_last(spark):
    df = spark.createDataFrame([([10, 20, 30],)], "arr array<long>")
    r = element_first_last(df, "arr").collect()[0]
    assert (r.elem_first, r.elem_last) == (10, 30)


def test_sticky_carry_sku_to_bundle_members(spark):
    # standalone item's sku carries to following bundle members
    # (woo-sync/main.py:683-688)
    df = spark.createDataFrame(
        [(1, 1, "SKU-A"), (1, 2, None), (1, 3, None), (1, 4, "SKU-B"), (1, 5, None)],
        "oid long, pos long, sku string",
    )
    out = sticky_carry(df, "sku", ["oid"], ["pos"], out_col="sku_eff")
    assert [r.sku_eff for r in out.orderBy("pos").collect()] == [
        "SKU-A", "SKU-A", "SKU-A", "SKU-B", "SKU-B"
    ]


def test_element_first_last_empty_array_yields_null(spark):
    from dot_spark.operators.flatten import element_first_last

    df = spark.createDataFrame([(1, []), (2, ["a", "b"])], "id INT, arr ARRAY<STRING>")
    got = {r.id: (r.elem_first, r.elem_last)
           for r in element_first_last(df, "arr").collect()}
    assert got == {1: (None, None), 2: ("a", "b")}
