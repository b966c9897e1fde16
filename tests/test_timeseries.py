"""Boundary semantics of the time-series operators (st8/a14/w9)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dot_spark.operators.timeseries import (
    gapfill_locf,
    scd2_history,
    session_window_agg,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )


def test_session_window_boundary_is_inclusive(spark):
    """An event exactly gap after the previous one MERGES (probed
    Spark semantics: "within the gap" is inclusive — this pins the
    `diff > gap` form of the st8 oracle); one microsecond past the
    gap starts a new session."""
    rows = [
        (1, 1, T0, 1.0),
        (2, 1, T0 + dt.timedelta(minutes=30), 1.0),  # == boundary -> merges
        (3, 2, T0, 1.0),
        (4, 2, T0 + dt.timedelta(minutes=30, microseconds=1), 1.0),  # new
    ]
    out = session_window_agg(_ev(spark, rows), "user_id", "ts", "30 minutes")
    per_user = {r["user_id"]: r for r in out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions")).collect()}
    assert per_user[1]["n_sessions"] == 1
    assert per_user[2]["n_sessions"] == 2


def test_session_window_end_is_last_event_plus_gap(spark):
    rows = [(1, 7, T0, 2.0), (2, 7, T0 + dt.timedelta(minutes=10), 3.0)]
    out = session_window_agg(_ev(spark, rows), "user_id", "ts", "30 minutes").collect()
    assert len(out) == 1
    r = out[0]
    assert r["session_start"] == T0
    assert r["session_end_excl"] == T0 + dt.timedelta(minutes=40)
    assert r["n_events"] == 2 and r["sum_value"] == 5.0


def test_gapfill_locf_fills_interior_gaps_only(spark):
    """Grid spans each key's own [min, max] hour; holes carry the
    previous value; nothing is generated before the first or after
    the last observation."""
    rows = [
        (1, 1, T0, 10.0),                             # 12:00
        (2, 1, T0 + dt.timedelta(hours=3), 40.0),     # 15:00 (13:00/14:00 holes)
        (3, 2, T0, 7.0),                              # single point -> 1 row
    ]
    out = gapfill_locf(_ev(spark, rows), "user_id", "ts", "value").collect()
    u1 = sorted([r for r in out if r["user_id"] == 1], key=lambda r: r["bucket"])
    assert [r["filled_value"] for r in u1] == [10.0, 10.0, 10.0, 40.0]
    assert [r["observed"] for r in u1] == [True, False, False, True]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["observed"]


def test_gapfill_rounds_before_carry(spark):
    """The forwarded value is the ROUNDED bucket aggregate, so a
    carried cell is bit-identical to its source cell."""
    rows = [(1, 1, T0, 1.005), (2, 1, T0 + dt.timedelta(hours=2), 1.0)]
    out = {r["bucket"]: r["filled_value"]
           for r in gapfill_locf(_ev(spark, rows), "user_id", "ts", "value").collect()}
    assert out[T0] == out[T0 + dt.timedelta(hours=1)]


def test_scd2_collapses_runs_and_closes_intervals(spark):
    df = spark.createDataFrame(
        [
            (1, 1, T0, "a"),
            (2, 1, T0 + dt.timedelta(hours=1), "a"),   # same -> collapsed
            (3, 1, T0 + dt.timedelta(hours=2), "b"),   # change
            (4, 1, T0 + dt.timedelta(hours=3), "a"),   # change back -> new version
        ],
        "event_id bigint, user_id bigint, ts timestamp, attr string",
    )
    out = sorted(
        scd2_history(df, "user_id", "attr", "ts", "event_id").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["attr"] for r in out] == ["a", "b", "a"]
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert out[2]["valid_to"] is None and out[2]["is_current"]
    assert not out[0]["is_current"] and not out[1]["is_current"]


def test_scd2_equal_ts_ties_break_on_tiebreaker(spark):
    """Two changes at the identical timestamp order by the tiebreaker
    deterministically."""
    df = spark.createDataFrame(
        [(2, 1, T0, "b"), (1, 1, T0, "a")],
        "event_id bigint, user_id bigint, ts timestamp, attr string",
    )
    out = sorted(
        scd2_history(df, "user_id", "attr", "ts", "event_id").collect(),
        key=lambda r: (r["valid_from"], r["attr"]),
    )
    assert [r["attr"] for r in out] == ["a", "b"]
    assert out[0]["valid_to"] == T0  # closed by the same-ts successor
    assert out[1]["is_current"]


def test_session_window_runs_under_structured_streaming(spark, tmp_path):
    """The st8 operator's claim is that F.session_window is the
    STREAMING session machinery run in batch; pin the streaming half:
    the same groupBy(session_window) aggregation executes as a
    watermarked streaming query (state-store session merging) and
    yields the same sessions as the batch run over the same input."""
    import datetime as dt

    from pyspark.sql import functions as F

    T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, 1, T0, 1.0),
        (2, 1, T0 + dt.timedelta(minutes=5), 2.0),
        (3, 1, T0 + dt.timedelta(hours=2), 3.0),   # new session
        (4, 2, T0, 4.0),
    ]
    src = str(tmp_path / "events_src")
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_window"]["start"], r["n_events"], r["sum_value"])
        for r in spark.table("sess_stream").collect()
    }
    from dot_spark.operators.timeseries import session_window_agg

    want = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in session_window_agg(df, "user_id", "ts", "30 minutes").collect()
    }
    assert got == want
    assert len(got) == 3
