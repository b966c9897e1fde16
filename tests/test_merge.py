"""Warehouse.merge_upsert (pl8): MERGE semantics + partition scoping."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dot_spark.loads import Warehouse


def _files_of(path):
    return {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    }


def test_merge_upsert_insert_update_delete(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k bigint, s string, v double"
    )
    wh.write(target, "t", "truncate")
    cdc = spark.createDataFrame(
        [
            (2, "b2", 25.0, False),   # update
            (4, "d", 40.0, False),    # insert
            (3, None, None, True),    # delete
        ],
        "k bigint, s string, v double, is_delete boolean",
    )
    wh.merge_upsert(cdc, "t", ["k"], delete_col="is_delete")
    rows = {r["k"]: (r["s"], r["v"]) for r in wh.read("t").collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 25.0), 4: ("d", 40.0)}


def test_merge_upsert_without_delete_col_is_pure_upsert(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"), "t", "truncate"
    )
    wh.merge_upsert(
        spark.createDataFrame([(2, 9.0), (3, 3.0)], "k bigint, v double"), "t", ["k"]
    )
    rows = {r["k"]: r["v"] for r in wh.read("t").collect()}
    assert rows == {1: 1.0, 2: 9.0, 3: 3.0}


def test_partitioned_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """On a hive-partitioned target, applying a CDC batch touching one
    partition must leave every other partition's data files untouched
    on disk (same paths, same mtimes) — the copy-on-write scope that
    makes a one-day CDC apply cheap on a 365-day table."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    target = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0), ("2024-01-02", 3, 30.0)],
        "day string, k bigint, v double",
    )
    wh.write(target, "t", "truncate", partition_cols=["day"])
    untouched_before = _files_of(os.path.join(wh.path("t"), "day=2024-01-02"))
    assert untouched_before

    cdc = spark.createDataFrame(
        [("2024-01-01", 2, 99.0, False), ("2024-01-01", 1, None, True)],
        "day string, k bigint, v double, is_delete boolean",
    )
    wh.merge_upsert(cdc, "t", ["day", "k"], delete_col="is_delete")

    # hive partition-dir values read back type-inferred (DATE here)
    rows = {(str(r["day"]), r["k"]): r["v"] for r in wh.read("t").collect()}
    assert rows == {("2024-01-01", 2): 99.0, ("2024-01-02", 3): 30.0}
    assert _files_of(os.path.join(wh.path("t"), "day=2024-01-02")) == untouched_before


def test_merge_upsert_delete_wins_on_same_key(spark, tmp_path):
    """A batch carrying both an update and a delete for one key (the
    pl8 %91 overlap shape) must not resurrect the row: touched keys
    are removed first and only non-delete rows re-insert."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(spark.createDataFrame([(1, 1.0)], "k bigint, v double"), "t", "truncate")
    cdc = spark.createDataFrame(
        [(1, None, True)], "k bigint, v double, is_delete boolean"
    )
    wh.merge_upsert(cdc, "t", ["k"], delete_col="is_delete")
    assert wh.read("t").count() == 0


def test_partitioned_merge_applies_delete_only_batches(spark, tmp_path):
    """A CDC batch whose slice for some partition is DELETE-ONLY must
    still rewrite that partition: partition scoping derives from all
    change rows, not just the upserts (scoping from upserts silently
    dropped the deletes — they addressed a partition that was never
    read or rewritten)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    target = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0), ("2024-01-02", 3, 30.0)],
        "day string, k bigint, v double",
    )
    wh.write(target, "t", "truncate", partition_cols=["day"])
    cdc = spark.createDataFrame(
        [("2024-01-01", 1, None, True)],  # delete only, no upsert anywhere
        "day string, k bigint, v double, is_delete boolean",
    )
    wh.merge_upsert(cdc, "t", ["day", "k"], delete_col="is_delete")
    rows = {(str(r["day"]), r["k"]): r["v"] for r in wh.read("t").collect()}
    assert rows == {("2024-01-01", 2): 20.0, ("2024-01-02", 3): 30.0}


def test_partitioned_merge_drops_partition_emptied_by_deletes(spark, tmp_path):
    """Deleting EVERY row of a partition must remove the partition:
    dynamic partition overwrite writes zero rows there (so cannot
    replace it), and a surviving stale directory would resurrect the
    deleted rows on the next read."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    target = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-02", 3, 30.0)],
        "day string, k bigint, v double",
    )
    wh.write(target, "t", "truncate", partition_cols=["day"])
    cdc = spark.createDataFrame(
        [("2024-01-01", 1, None, True)],
        "day string, k bigint, v double, is_delete boolean",
    )
    wh.merge_upsert(cdc, "t", ["day", "k"], delete_col="is_delete")
    rows = {(str(r["day"]), r["k"]): r["v"] for r in wh.read("t").collect()}
    assert rows == {("2024-01-02", 3): 30.0}
    assert not os.path.isdir(os.path.join(wh.path("t"), "day=2024-01-01"))
    # idempotent under replay: re-applying the same batch is a no-op
    wh.merge_upsert(cdc, "t", ["day", "k"], delete_col="is_delete")
    rows2 = {(str(r["day"]), r["k"]): r["v"] for r in wh.read("t").collect()}
    assert rows2 == rows


def test_merge_upsert_null_delete_flag_is_an_upsert(spark, tmp_path):
    """NULL delete flag means NOT a delete (the CDC convention:
    absent flag == change row). Previously ~NULL filtered the row out
    of the upserts while its key stayed in the touched set — the row
    was silently deleted, the opposite of the convention."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"),
        "t",
        "truncate",
    )
    cdc = spark.createDataFrame(
        [(1, 9.0, None), (3, 3.0, None)],  # NULL flags: update + insert
        "k bigint, v double, is_delete boolean",
    )
    wh.merge_upsert(cdc, "t", ["k"], delete_col="is_delete")
    rows = {r["k"]: r["v"] for r in wh.read("t").collect()}
    assert rows == {1: 9.0, 2: 2.0, 3: 3.0}


def test_merge_upsert_is_idempotent(spark, tmp_path):
    """Applying the SAME CDC batch twice must be a no-op the second
    time — the at-least-once delivery contract: a replayed batch
    (retry, redelivered message) cannot duplicate inserts or re-flip
    state."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"),
        "t",
        "truncate",
    )
    cdc = spark.createDataFrame(
        [(2, 9.0, False), (3, 3.0, False), (1, None, True)],
        "k bigint, v double, is_delete boolean",
    )
    wh.merge_upsert(cdc, "t", ["k"], delete_col="is_delete")
    once = sorted((r["k"], r["v"]) for r in wh.read("t").collect())
    wh.merge_upsert(cdc, "t", ["k"], delete_col="is_delete")
    twice = sorted((r["k"], r["v"]) for r in wh.read("t").collect())
    assert once == twice == [(2, 9.0), (3, 3.0)]


def test_streaming_cdc_apply_end_to_end(spark, tmp_path):
    """JSONL CDC drops stream into merge_upsert via foreachBatch:
    intra-batch changes collapse to the newest per key (seq_col),
    batches apply in drop order, and a restarted query resumes from
    the file-source checkpoint (drop 2 applies without re-reading
    drop 1)."""
    import json

    from dot_spark.pipelines import streaming_cdc_apply

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
        "t",
        "truncate",
    )
    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "k BIGINT, v STRING, seq BIGINT, is_delete BOOLEAN"

    def drop(name, rows):
        with open(cdc_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    drop("b1.jsonl", [
        {"k": 2, "v": "b2", "seq": 1, "is_delete": False},
        {"k": 4, "v": "x", "seq": 1, "is_delete": False},
        {"k": 4, "v": "y", "seq": 2, "is_delete": False},  # newest wins
    ])
    q = streaming_cdc_apply(
        spark, str(cdc_dir), wh, ckpt, "t", ["k"], "seq", schema=schema
    )
    q.awaitTermination(120)
    state1 = {r["k"]: r["v"] for r in wh.read("t").collect()}
    assert state1 == {1: "a", 2: "b2", 4: "y"}

    drop("b2.jsonl", [
        {"k": 1, "v": None, "seq": 3, "is_delete": True},
        {"k": 4, "v": "z", "seq": 4, "is_delete": False},
    ])
    q2 = streaming_cdc_apply(
        spark, str(cdc_dir), wh, ckpt, "t", ["k"], "seq", schema=schema
    )
    q2.awaitTermination(120)
    state2 = {r["k"]: r["v"] for r in wh.read("t").collect()}
    assert state2 == {2: "b2", 4: "z"}


def test_read_merge_schema_reconciles_evolved_appends(spark, tmp_path):
    """Additive schema evolution: an append that ADDS a column must be
    readable together with the older files (merge_schema=True reads
    the union schema; pre-evolution rows surface NULL for the new
    column). The default read stays cheap (no footer sweep) and may
    see only the original columns."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(spark.createDataFrame([(1, "a")], "k bigint, v string"), "t", "truncate")
    wh.write(
        spark.createDataFrame([(2, "b", 9.5)], "k bigint, v string, score double"),
        "t",
        "append",
    )
    merged = wh.read("t", merge_schema=True)
    assert set(merged.columns) == {"k", "v", "score"}
    rows = {r["k"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_all_sink_formats_round_trip_identically(spark, tmp_path):
    """Format matrix: the SAME table written through every sink
    (parquet, CSV checkpoint, JSONL, ORC) must read back value-
    identical — one canonical row-set across four codecs, so a
    format-specific type mangling (CSV string coercion, JSON number
    widening, ORC decimal drift) can't hide."""
    from pyspark.sql import functions as F

    from dot_spark.loads import Warehouse
    from dot_spark.sources.registry import load_table

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = (
        load_table(spark, "orders", "/root/testdata/sf0.001")
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price"))
        .limit(500)
    )
    schema = "o_orderkey BIGINT, o_orderstatus STRING, price DOUBLE"

    wh.write(src, "t_parquet", "truncate")
    wh.write_csv(src, "t_csv")
    wh.write_jsonl(src, "t_jsonl")
    wh.write_orc(src, "t_orc")

    def rows(df):
        return sorted(
            (r["o_orderkey"], r["o_orderstatus"], r["price"]) for r in df.collect()
        )

    want = rows(src)
    assert rows(wh.read("t_parquet")) == want
    assert rows(wh.read_csv("t_csv", schema)) == want
    assert rows(wh.read_jsonl("t_jsonl", schema)) == want
    assert rows(wh.read_orc("t_orc")) == want


def test_write_observed_counts_during_the_load(spark, tmp_path):
    """Observation metrics gathered DURING the write must equal
    independently computed counts — no second scan needed for the
    load audit."""
    from dot_spark.loads import Warehouse, write_observed

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "k bigint, v string"
    )
    metrics = write_observed(wh, df, "t", null_check_cols=["v"])
    assert metrics == {"n_rows": 4, "nulls_v": 2}
    assert wh.read("t").count() == 4


def test_snapshot_diff_then_merge_reproduces_the_new_snapshot(spark, tmp_path):
    """snapshot_diff and merge_upsert are inverses: extracting the
    change set between two snapshots and APPLYING it through the
    merge machinery must land exactly the new snapshot — the law that
    makes snapshot-diff output a valid CDC feed."""
    from dot_spark.loads import Warehouse
    from dot_spark.operators.relational import snapshot_diff

    old_rows = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)]
    new_rows = [(1, "a", 10.0), (2, "B", 25.0), (4, "d", 40.0), (5, "e", 50.0)]
    schema = "k long, s string, v double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)

    diff = snapshot_diff(old, new, keys=["k"])
    got = {(r["k"], r["change_type"]) for r in diff.collect()}
    assert got == {(2, "updated"), (3, "deleted"), (5, "inserted")}

    # turn the diff into a merge change-set: new-side rows for
    # upserts, key-only tombstones for deletes
    upserts = diff.filter(F.col("change_type") != "deleted").join(
        new, on="k"
    ).select("k", "s", "v", F.lit(False).alias("is_delete"))
    deletes = diff.filter(F.col("change_type") == "deleted").select(
        "k", F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("double").alias("v"), F.lit(True).alias("is_delete"),
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(old, "snap")
    wh.merge_upsert(upserts.unionByName(deletes), "snap", ["k"], delete_col="is_delete")
    got_rows = sorted(map(tuple, wh.read("snap").collect()))
    assert got_rows == sorted(new_rows)


def test_snapshot_diff_null_keys_classified_correctly(spark):
    """NULL-keyed rows are data, not absence: a NULL-key row present
    only in old is 'deleted' (not 'inserted'), and a NULL-key row
    identical in both snapshots is unchanged — presence must come
    from marker columns, the key join from null-safe equality."""
    from dot_spark.operators.relational import snapshot_diff

    schema = "k string, v long"
    old = spark.createDataFrame([(None, 1), ("a", 2)], schema)
    new = spark.createDataFrame([("a", 2)], schema)
    got = {(r["k"], r["change_type"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {(None, "deleted")}

    both = spark.createDataFrame([(None, 1), ("a", 2)], schema)
    assert snapshot_diff(both, both, ["k"]).count() == 0

    upd = spark.createDataFrame([(None, 9), ("a", 2)], schema)
    got2 = {(r["k"], r["change_type"]) for r in snapshot_diff(both, upd, ["k"]).collect()}
    assert got2 == {(None, "updated")}


def test_partitioned_merge_null_partition_scopes_and_survives(spark, tmp_path):
    """The NULL partition (__HIVE_DEFAULT_PARTITION__) is a
    legitimate hive partition and must be scoped NULL-SAFELY: a
    partial delete inside it removes exactly the deleted key — the
    other NULL-partition rows survive. (A plain equi-semi-join never
    matches NULL, so the survivors were invisible to the rewrite
    while the emptied-partition sweep deleted the whole directory:
    silent data loss.)"""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    target = spark.createDataFrame(
        [(None, 1, 10.0), (None, 2, 20.0), ("2024-01-01", 3, 30.0)],
        "day string, k bigint, v double",
    )
    wh.write(target, "t", "truncate", partition_cols=["day"])
    cdc = spark.createDataFrame(
        [(None, 1, None, True)], "day string, k bigint, v double, is_delete boolean"
    )
    wh.merge_upsert(cdc, "t", ["day", "k"], delete_col="is_delete")
    rows = {
        (None if r["day"] is None else str(r["day"]), r["k"]): r["v"]
        for r in wh.read("t").collect()
    }
    assert rows == {(None, 2): 20.0, ("2024-01-01", 3): 30.0}

    # and a delete emptying the NULL partition removes its directory
    cdc2 = spark.createDataFrame(
        [(None, 2, None, True)], "day string, k bigint, v double, is_delete boolean"
    )
    wh.merge_upsert(cdc2, "t", ["day", "k"], delete_col="is_delete")
    rows2 = {(str(r["day"]), r["k"]): r["v"] for r in wh.read("t").collect()}
    assert rows2 == {("2024-01-01", 3): 30.0}
    assert not os.path.isdir(
        os.path.join(wh.path("t"), "day=__HIVE_DEFAULT_PARTITION__")
    )


def test_append_partitioned_into_unpartitioned_table_raises(spark, tmp_path):
    """The partition-spec guard fires in BOTH directions: appending
    hive key=value dirs into a recorded-UNPARTITIONED (flat-file)
    table is the same mixed-layout corruption as the reverse, and
    letting it through would also clobber the recorded spec."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a")], "k bigint, day string")
    wh.write(df, "t", "truncate")  # recorded spec: []
    with pytest.raises(ValueError, match="partition_cols"):
        wh.write(df, "t", "append", partition_cols=["day"])
    # spec and layout are untouched by the failed attempt
    assert wh.partition_cols_of("t") == []
    assert not any(
        e.startswith("day=") for e in os.listdir(wh.path("t"))
    )
    # and the reverse direction still raises too
    wh.write(df, "p", "truncate", partition_cols=["day"])
    with pytest.raises(ValueError, match="partition_cols"):
        wh.write(df, "p", "append", partition_cols=["k"])


def test_append_records_union_schema_not_last_batch(spark, tmp_path):
    """The recorded schema_ddl (the emptied-table read fallback) must
    be the UNION across appends, not the last batch's: a narrower
    append must not shrink it, an evolved append extends it."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(
        spark.createDataFrame([(1, "a", 9.5)], "k bigint, v string, score double"),
        "t",
        "truncate",
    )
    # narrower append: recorded schema keeps score
    wh.write(spark.createDataFrame([(2, "b")], "k bigint, v string"), "t", "append")
    ddl = wh._table_meta("t")["schema_ddl"]
    assert "score" in ddl and "k" in ddl and "v" in ddl
    # evolved append: recorded schema gains the new column
    wh.write(
        spark.createDataFrame(
            [(3, "c", "x")], "k bigint, v string, extra string"
        ),
        "t",
        "append",
    )
    ddl2 = wh._table_meta("t")["schema_ddl"]
    for c in ("k", "v", "score", "extra"):
        assert c in ddl2, ddl2
    # the fallback path actually parses: an empty DF from that DDL
    # carries all four columns
    empty = spark.createDataFrame([], ddl2)
    assert set(empty.columns) == {"k", "v", "score", "extra"}
