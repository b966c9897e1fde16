"""Schema alignment + sentinel rules (reference P1/P2/P7/P8,
okta-sync/main.py:544-584, process-geography/main.py:115-137)."""

from __future__ import annotations

from dot_spark.schema import (
    align_schema,
    normalize_sentinels,
    positional_projection,
    with_defaults,
)


def test_align_casts_adds_drops(spark):
    df = spark.createDataFrame([("1", "x", "extra")], "a string, b string, junk string")
    out = align_schema(df, {"a": "bigint", "b": "string", "missing": "double"})
    assert out.columns == ["a", "b", "missing"]
    row = out.collect()[0]
    assert row.a == 1 and row.b == "x" and row.missing is None
    assert dict(out.dtypes) == {"a": "bigint", "b": "string", "missing": "double"}


def test_align_uncastable_becomes_null(spark):
    # BigQuery coercion errors='coerce' semantics (okta-sync/main.py:564-568)
    df = spark.createDataFrame([("notanumber",)], "a string")
    assert align_schema(df, {"a": "bigint"}).collect()[0].a is None


def test_positional_projection(spark):
    df = spark.createDataFrame([(1, 2, 3)], "c0 long, c1 long, c2 long")
    out = positional_projection(df, ["x", "y"])
    assert out.columns == ["x", "y"] and out.collect()[0] == (1, 2)


def test_na_is_namibia(spark):
    # "NA" must survive normalization (it's Namibia's country code);
    # the default token list excludes it by design.
    df = spark.createDataFrame([("NA",), ("NULL",), ("",), ("US",)], "cc string")
    vals = [r.cc for r in normalize_sentinels(df).collect()]
    assert vals == ["NA", None, None, "US"]


def test_zero_datetime_sentinel(spark):
    df = spark.createDataFrame([("0000-00-00 00:00:00",), ("2024-01-01",)], "d string")
    vals = [r.d for r in normalize_sentinels(df).collect()]
    assert vals == [None, "2024-01-01"]


def test_with_defaults(spark):
    df = spark.createDataFrame([(None,), ("X",)], "origin string")
    vals = [r.origin for r in with_defaults(df, {"origin": "WEB"}).collect()]
    assert vals == ["WEB", "X"]
