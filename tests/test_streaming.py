"""Streaming semantics tests (ST1-ST7): fan-out routing, dedup,
windowed aggregation, superseded latest-wins, drain state machine.

All queries are driven synchronously: file/parquet source +
processAllAvailable() + memory sink, per the harness contract (no
live bus in the container).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dot_spark.streaming import (
    delayed_retries,
    drain_actions,
    fan_out,
    route_events,
    stream_dedup,
    stream_events,
    superseded_latest,
    windowed_counts,
)


def drive(query):
    query.processAllAvailable()
    query.stop()


def write_parquet(pdf, path):
    """Write with microsecond timestamps: the session reads parquet
    TIMESTAMP(NANOS) as bigint (nanosAsLong), so fixture files must
    use MICROS for TIMESTAMP-typed stream schemas."""
    pdf.to_parquet(path, coerce_timestamps="us", allow_truncated_timestamps=True)


def start_memory(df, name, checkpoint, mode="append"):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .start()
    )


@pytest.fixture()
def events_stream(spark, sf_dir):
    return stream_events(spark, sf_dir)


def test_stream_matches_batch_scan(spark, sf_dir, events_stream, tmp_path):
    """Counts AND timestamp values: the r4/r5 ingress bug (micros
    read as BIGINT, ÷1000 → everything lands in 1970) was invisible
    to a count-only comparison. min/max/sum-of-epoch pins the streamed
    ts to be value-identical to the batch registry read."""
    q = start_memory(events_stream, "all_events", str(tmp_path / "cp"))
    drive(q)
    from dot_spark.sources.registry import load_table

    probe = "COUNT(*) c, COUNT(DISTINCT event_id) d, MIN(ts) lo, MAX(ts) hi, SUM(unix_micros(ts)) s"
    got = spark.sql(f"SELECT {probe} FROM all_events").collect()[0]
    want = load_table(spark, "events", sf_dir).selectExpr(probe.split(", ")).collect()[0]
    assert tuple(got) == tuple(want)
    # sanity: the fixture's events are modern, not 1970 collapse
    assert got.lo.year >= 2000, got.lo


def test_stream_events_handles_both_physical_ts_formats(spark, tmp_path):
    """stream_events must yield identical ts values whether the file
    stores naive-micros TIMESTAMP (the current testdata contract,
    reads as TIMESTAMP_NTZ) or legacy TIMESTAMP(NANOS) (reads as
    bigint under nanosAsLong) — same per-file dispatch as the batch
    registry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2026-02-01 00:00:01", "2026-02-01 12:34:56.789012"], format="ISO8601"
    )
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": ts,
            "user_id": [10, 20],
            "event_type": ["click", "view"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    got = {}
    for fmt in ("us", "ns"):
        d = tmp_path / fmt
        d.mkdir()
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        if fmt == "us":
            table = table.set_column(
                1, "ts", table.column("ts").cast(pa.timestamp("us"))
            )
        # version=2.6 keeps ns as TIMESTAMP(NANOS) instead of
        # silently coercing to micros
        pq.write_table(table, d / "events.parquet", version="2.6")
        stream = stream_events(spark, str(d))
        assert dict(stream.dtypes)["ts"] == "timestamp"
        q = start_memory(stream, f"fmt_{fmt}", str(tmp_path / f"cp_{fmt}"))
        drive(q)
        got[fmt] = sorted(
            (r.event_id, r.ts) for r in spark.table(f"fmt_{fmt}").collect()
        )
    expect = sorted(zip(pdf.event_id, ts.to_pydatetime()))
    assert got["us"] == got["ns"] == expect


def test_fanout_routes_partition_the_stream(spark, sf_dir, events_stream, tmp_path):
    routed = route_events(events_stream)
    qs = fan_out(
        routed,
        {
            "retry": F.col("route") == "retry",
            "completed": F.col("route") == "completed",
            "ignored": F.col("route") == "ignore",
        },
        str(tmp_path / "cp"),
        name_prefix="rt",
    )
    for q in qs.values():
        drive(q)
    n_retry = spark.table("rt_retry").count()
    n_done = spark.table("rt_completed").count()
    n_ign = spark.table("rt_ignored").count()
    from dot_spark.sources.registry import load_table

    ev = load_table(spark, "events", sf_dir)
    assert n_retry == ev.filter(F.col("event_type") == "error").count()
    assert n_done == ev.filter(F.col("event_type") == "purchase").count()
    assert n_retry + n_done + n_ign == ev.count()
    # every routed consumer saw only its own attribute value (ST4)
    assert spark.table("rt_retry").filter(F.col("route") != "retry").count() == 0


def test_stream_dedup_drops_duplicate_deliveries(spark, tmp_path):
    # duplicate deliveries of event 1 (at-least-once), one clean event
    pdf = pd.DataFrame(
        {
            "event_id": [1, 1, 2],
            "ts": pd.to_datetime(["2026-01-01 00:00:00"] * 2 + ["2026-01-01 00:01:00"]),
            "event_type": ["error", "error", "purchase"],
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    write_parquet(pdf, src / "b0.parquet")
    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
        .format("parquet")
        .load(str(src))
    )
    deduped = stream_dedup(stream, ["event_id"])
    q = start_memory(deduped, "dedup_out", str(tmp_path / "cp"))
    drive(q)
    rows = spark.table("dedup_out").collect()
    assert sorted(r.event_id for r in rows) == [1, 2]


def test_windowed_counts_by_event_time(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:10", "2026-01-01 00:02:00",
                 "2026-01-01 00:07:00", "2026-01-01 00:07:30"]
            ),
            "event_type": ["click", "click", "click", "view"],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    write_parquet(pdf, src / "b0.parquet")
    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE")
        .format("parquet")
        .load(str(src))
    )
    agg = windowed_counts(stream, window="5 minutes")
    # append mode only emits finalized windows; drive twice with a
    # late watermark-advancing file to close them
    q = start_memory(agg, "win_out", str(tmp_path / "cp"))
    q.processAllAvailable()
    late = pd.DataFrame(
        {
            "event_id": [99],
            "ts": pd.to_datetime(["2026-01-01 01:00:00"]),
            "event_type": ["click"],
            "value": [0.0],
        }
    )
    write_parquet(late, src / "b1.parquet")
    q.processAllAvailable()
    q.stop()
    rows = {(r.win_start.minute, r.event_type): (r.n, r.sum_value)
            for r in spark.table("win_out").collect()}
    assert rows[(0, "click")] == (2, 3.0)
    assert rows[(5, "click")] == (1, 3.0)
    assert rows[(5, "view")] == (1, 4.0)


def test_superseded_latest_wins(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "event_id": [10, 11, 20],
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:00", "2026-01-01 00:05:00", "2026-01-01 00:01:00"]
            ),
            "user_id": [7, 7, 8],
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    write_parquet(pdf, src / "b0.parquet")
    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .format("parquet")
        .load(str(src))
    )
    q = start_memory(superseded_latest(stream), "sup_out", str(tmp_path / "cp"), mode="update")
    drive(q)
    rows = {r.user_id: r for r in spark.table("sup_out").collect()}
    assert rows[7].latest_event_id == 11 and rows[7].n_seen == 2
    assert rows[8].latest_event_id == 20 and rows[8].n_seen == 1


def test_drain_machine_transitions(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "connector_id": ["c1", "c1", "c2", "c3", "c3"],
            "seq": [1, 2, 1, 1, 2],
            "status": ["paused", "running", "healthy", "broken", "healthy"],
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    write_parquet(pdf, src / "b0.parquet")
    stream = (
        spark.readStream.schema("connector_id STRING, seq BIGINT, status STRING")
        .format("parquet")
        .load(str(src))
    )
    q = start_memory(drain_actions(stream), "drain_out", str(tmp_path / "cp"))
    drive(q)
    rows = spark.table("drain_out").collect()
    by_conn = {}
    for r in sorted(rows, key=lambda r: (r.connector_id, r.n_events)):
        by_conn.setdefault(r.connector_id, []).append(r.action)
    assert by_conn["c1"] == ["resume", "sync", "noop"]
    assert by_conn["c2"] == ["force-sync"]
    # broken latches: the later 'healthy' event cannot un-stop it
    assert by_conn["c3"] == ["stop", "signal", "noop"]
    phases = {r.connector_id: r.phase for r in rows if r.n_events == max(
        x.n_events for x in rows if x.connector_id == r.connector_id)}
    assert phases["c3"] == "stopped"


def test_drain_batch_twin_matches_streaming_machine(spark, tmp_path):
    """drain_actions_batch (the ST7 oracle-checkable form) must equal
    the applyInPandasWithState machine when the stream delivers rows
    in order — same transition table, same latch, same phases."""
    from dot_spark.streaming.state import drain_actions_batch

    rng_statuses = ["running", "paused", "broken", "healthy", "bogus"]
    pdf = pd.DataFrame(
        {
            "connector_id": [f"c{i % 4}" for i in range(40)],
            "seq": list(range(40)),
            "status": [rng_statuses[(i * 7 + i // 5) % 5] for i in range(40)],
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    # one file per connector, rows in seq order, so each group's
    # micro-batch arrives exactly in the batch twin's sort order
    for cid, grp in pdf.groupby("connector_id"):
        write_parquet(grp.sort_values("seq"), src / f"{cid}.parquet")
    stream = (
        spark.readStream.schema("connector_id STRING, seq BIGINT, status STRING")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    q = start_memory(drain_actions(stream), "drain_twin_out", str(tmp_path / "cp"))
    drive(q)
    streamed = sorted(
        spark.table("drain_twin_out").collect(),
        key=lambda r: (r.connector_id, r.n_events, r.action),
    )
    batch = sorted(
        drain_actions_batch(
            spark.createDataFrame(pdf), order_cols=("seq",)
        ).collect(),
        key=lambda r: (r.connector_id, r.n_events, r.action),
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_delayed_retry_fires_after_delay_with_loop_guard(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # job 1 fails (retry due after the delay); job 2 fails then
    # succeeds (superseded -> cancelled); job 3's failure is itself
    # an auto-retry (loop guard -> never re-queued)
    b0 = pd.DataFrame(
        {
            "job_id": [1, 2, 2, 3],
            "status": ["failure", "failure", "success", "failure"],
            "cause": ["oom", "disk", "", "Auto-retry: oom"],
        }
    )
    write_parquet(b0, src / "b0.parquet")
    stream = (
        spark.readStream.schema("job_id BIGINT, status STRING, cause STRING")
        .format("parquet")
        .load(str(src))
    )
    q = start_memory(
        delayed_retries(stream, delay_ms=700), "retry_out", str(tmp_path / "cp")
    )
    # processAllAvailable never settles while a processing-time timer
    # is registered (the engine keeps scheduling timeout-check
    # batches), so drive by polling the sink
    import time

    deadline = time.time() + 60
    rows = []
    while time.time() < deadline:
        if q.exception():
            raise AssertionError(q.exception())
        rows = spark.table("retry_out").collect()
        if rows:
            break
        time.sleep(0.5)
    # give job 3's guard a chance to (wrongly) fire before stopping
    time.sleep(1.5)
    rows = spark.table("retry_out").collect()
    q.stop()
    assert [(r.job_id, r.action, r.cause) for r in rows] == [
        (1, "retry", "Auto-retry: oom")
    ]


def test_delayed_retries_batch_twin_matches_machine_semantics(spark, tmp_path):
    """The batch twin (st5's oracle-checkable form) must land the
    same decisions as the timer machine's fold: job 1's qualifying
    failure retries with the guard-prefixed cause and a ts+delay
    due time; job 2 is superseded by the later success; job 3's
    guard-prefixed failure never re-queues (loop guard); job 4's
    later guard failure is INVISIBLE to the fold, so the earlier
    qualifying failure still retries; job 5 fails AFTER a success
    (last relevant wins -> retry)."""
    from datetime import datetime

    from dot_spark.streaming.state import delayed_retries_batch

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        (1, 1, t(0), "failure", "oom"),
        (2, 2, t(0), "failure", "disk"),
        (2, 3, t(1), "success", ""),
        (3, 4, t(0), "failure", "Auto-retry: oom"),
        (4, 5, t(0), "failure", "quota"),
        (4, 6, t(1), "failure", "Auto-retry: quota"),
        (5, 7, t(0), "success", ""),
        (5, 8, t(1), "failure", "net"),
    ]
    df = spark.createDataFrame(
        rows, "job_id bigint, event_id bigint, ts timestamp, status string, cause string"
    )
    got = sorted(
        (r.job_id, r.action, r.cause, r.retry_at)
        for r in delayed_retries_batch(df).collect()
    )
    assert got == [
        (1, "retry", "Auto-retry: oom", t(5)),
        (4, "retry", "Auto-retry: quota", t(5)),
        (5, "retry", "Auto-retry: net", t(6)),
    ]
    # parity with the streaming machine's verdict on the SAME input
    # (the machine's test above pins the timer/loop-guard behavior;
    # here: the set of jobs the machine would retry at quiescence)
    machine_expect = {1, 4, 5}
    assert {j for j, *_ in got} == machine_expect


def test_idempotent_batch_sink_survives_redelivery(spark, tmp_path):
    """ST3: at-least-once delivery with downstream idempotence. The
    stream writes each micro-batch through the per-batch-overwrite
    sink; re-invoking the sink with the same batch_id and payload (a
    redelivered/replayed batch) must leave the table unchanged, and a
    replay carrying a PARTIAL payload must not leave a second copy of
    anything."""
    from dot_spark.loads import Warehouse

    src = tmp_path / "src"
    src.mkdir()
    pdf = pd.DataFrame({"job_id": [1, 2, 3], "status": ["ok", "ok", "err"]})
    write_parquet(pdf, src / "b0.parquet")

    wh = Warehouse(spark, str(tmp_path / "wh"))
    sink = wh.idempotent_batch_sink("jobs")
    stream = (
        spark.readStream.schema("job_id BIGINT, status STRING")
        .format("parquet")
        .load(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    drive(q)
    assert wh.read("jobs").count() == 3

    # redeliver batch 0 verbatim -> no duplicates
    sink(spark.createDataFrame(pdf), 0)
    assert wh.read("jobs").count() == 3
    # replay a partial batch 0 (failure mid-write happened upstream):
    # the overwrite replaces, never appends
    sink(spark.createDataFrame(pdf.iloc[:1]), 0)
    got = wh.read("jobs").collect()
    assert len(got) == 1 and got[0].job_id == 1


def test_session_windows_split_on_gap(spark, tmp_path):
    """Two bursts for u1 separated by > gap become two sessions; u2's
    single event is its own session. Watermark far past the data so
    all sessions finalize in append mode."""
    from dot_spark.streaming import session_counts

    src = tmp_path / "src"
    src.mkdir()
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        (1, t0, 1.0), (1, t0 + pd.Timedelta("1 min"), 2.0),          # session A
        (1, t0 + pd.Timedelta("30 min"), 3.0),                        # session B
        (2, t0 + pd.Timedelta("2 min"), 4.0),                         # session C
        (9, t0 + pd.Timedelta("10 hours"), 0.0),                      # watermark push
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    write_parquet(pdf, src / "b0.parquet")
    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
        .format("parquet")
        .load(str(src))
    )
    q = start_memory(
        session_counts(stream, gap="5 minutes"), "sessions", str(tmp_path / "cp")
    )
    drive(q)
    got = {
        (r.user_id, r.n_events, r.sum_value)
        for r in spark.table("sessions").filter("user_id < 9").collect()
    }
    assert got == {(1, 2, 3.0), (1, 1, 3.0), (2, 1, 4.0)}
    # session end = last event + gap
    ends = {r.sess_end for r in spark.table("sessions").filter(
        "user_id = 2").collect()}
    assert ends == {t0 + pd.Timedelta("7 min")}


def test_stream_stream_join_attribution_window(spark, tmp_path):
    """Clicks joined to purchases of the same user within the
    preceding 10 minutes. p1@t0 matches c1@t0+5m (inside) but not
    c2@t0+20m (outside); u2's click has no purchase at all."""
    from dot_spark.streaming import stream_stream_join

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    clicks_dir.mkdir(); buys_dir.mkdir()
    write_parquet(
        pd.DataFrame({
            "user_id": [1, 1, 2],
            "ts": [t0 + pd.Timedelta("5 min"), t0 + pd.Timedelta("20 min"), t0],
            "click_id": [101, 102, 103],
        }),
        clicks_dir / "b0.parquet",
    )
    write_parquet(
        pd.DataFrame({"user_id": [1], "ts": [t0], "purchase_id": [900]}),
        buys_dir / "b0.parquet",
    )
    clicks = (spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, click_id BIGINT")
              .format("parquet").load(str(clicks_dir)))
    buys = (spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, purchase_id BIGINT")
            .format("parquet").load(str(buys_dir)))
    q = start_memory(
        stream_stream_join(clicks, buys, within="10 minutes"),
        "attributed", str(tmp_path / "cp"),
    )
    drive(q)
    got = [(r.user_id, r.click_id, r.r_purchase_id)
           for r in spark.table("attributed").collect()]
    assert got == [(1, 101, 900)]


def test_stream_stream_join_shared_payload_names(spark, tmp_path):
    """Both sides carry an identically-named payload column
    ('event_id'): the right one must come back as r_event_id, not an
    ambiguous-column AnalysisException."""
    from dot_spark.streaming import stream_stream_join

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    l_dir, r_dir = tmp_path / "l", tmp_path / "r"
    l_dir.mkdir(); r_dir.mkdir()
    write_parquet(
        pd.DataFrame({"user_id": [1], "ts": [t0 + pd.Timedelta("2 min")],
                      "event_id": [11]}),
        l_dir / "b0.parquet",
    )
    write_parquet(
        pd.DataFrame({"user_id": [1], "ts": [t0], "event_id": [77]}),
        r_dir / "b0.parquet",
    )
    schema = "user_id BIGINT, ts TIMESTAMP, event_id BIGINT"
    left = spark.readStream.schema(schema).format("parquet").load(str(l_dir))
    right = spark.readStream.schema(schema).format("parquet").load(str(r_dir))
    q = start_memory(
        stream_stream_join(left, right, within="10 minutes"),
        "shared_names", str(tmp_path / "cp2"),
    )
    drive(q)
    got = [(r.user_id, r.event_id, r.r_event_id)
           for r in spark.table("shared_names").collect()]
    assert got == [(1, 11, 77)]


def test_full_streaming_path_ingress_route_window_sink(spark, tmp_path):
    """§3.3 streaming end-to-end in one query: file ingress ->
    routing stamp -> watermarked tumbling aggregation per route ->
    effectively-once foreachBatch sink. Replaying the final batch
    must not change the landed table."""
    from dot_spark.loads import Warehouse
    from dot_spark.streaming import route_events, windowed_counts

    src = tmp_path / "src"
    src.mkdir()
    t0 = pd.Timestamp("2026-03-01 00:00:00")
    pdf = pd.DataFrame({
        "event_id": range(6),
        "ts": [t0 + pd.Timedelta(minutes=m) for m in (0, 1, 2, 6, 7, 600)],
        "user_id": [1, 2, 1, 2, 1, 9],
        "event_type": ["error", "purchase", "error", "click", "error", "click"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 0.0],
    })
    write_parquet(pdf, src / "b0.parquet")
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
        ).format("parquet").load(str(src))
    )
    routed = route_events(stream)
    agg = windowed_counts(
        routed.drop("event_type").withColumnRenamed("route", "event_type"),
        window="5 minutes",
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sink = wh.idempotent_batch_sink("routed_counts")
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    drive(q)
    got = {
        (r.event_type, str(r.win_start)[11:16], r.n): r.sum_value
        for r in wh.read("routed_counts").filter("event_type <> 'ignore'").collect()
    }
    # window [00:00,00:05): 2 errors (1+3) and 1 completed purchase;
    # window [00:05,00:10): 1 error (5); clicks route to ignore
    assert got == {
        ("retry", "00:00", 2): 4.0,
        ("completed", "00:00", 1): 2.0,
        ("retry", "00:05", 1): 5.0,
    }
    # redelivery of a batch with identical payload leaves the landed
    # table unchanged (per-batch overwrite; see the dedicated
    # idempotent-sink test for the partial-replay case)
    before = sorted(map(tuple, wh.read("routed_counts").collect()))
    batches = [int(p.name.split("=")[1])
               for p in (tmp_path / "wh" / "routed_counts").iterdir()]
    bid = max(batches)
    batch_dir = str(tmp_path / "wh" / "routed_counts" / f"batch={bid}")
    lazy = wh.spark.read.parquet(batch_dir)
    # materialize before the overwrite: a lazy self-read would race
    # the directory replacement (the same reason Warehouse.rewrite
    # stages through a temp table)
    payload = wh.spark.createDataFrame(lazy.collect(), lazy.schema)
    sink(payload, bid)
    assert sorted(map(tuple, wh.read("routed_counts").collect())) == before


def test_attributed_publish_stream_and_filtered_subscribe(spark, tmp_path):
    """S11 streaming form: envelope publish with checkpoint, then a
    subscriber filters on a message attribute."""
    from dot_spark.streaming.fanout import publish_stream, subscribe_batch

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    write_parquet(
        pd.DataFrame({"event_id": [1, 2, 3], "kind": ["a", "b", "a"]}),
        src_dir / "b0.parquet",
    )
    stream = (
        spark.readStream.schema("event_id BIGINT, kind STRING")
        .format("parquet").load(str(src_dir))
    )
    q = publish_stream(
        stream, "t1", str(tmp_path / "broker"), str(tmp_path / "cp"),
        attr_cols=["kind"], payload_cols=["event_id"],
    )
    drive(q)
    got = subscribe_batch(spark, "t1", str(tmp_path / "broker"), {"kind": "a"}).collect()
    assert sorted(r.payload for r in got) == ['{"event_id":1}', '{"event_id":3}']
    assert all(r.attributes["kind"] == "a" and r.topic == "t1" for r in got)


def test_enrich_stream_matches_batch_join(spark, sf_dir, events_stream, tmp_path):
    """Stream-static dimension enrichment: every micro-batch probes
    the broadcast dim map-side; the absorbed result must equal the
    batch join of the same tables — including left-join rows whose
    key has no dim match."""
    from dot_spark.sources.registry import load_table
    from dot_spark.streaming import enrich_stream

    dim = (
        load_table(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        .filter(F.col("user_id") % 2 == 0)  # force unmatched stream keys
    )
    q = start_memory(
        enrich_stream(events_stream.select("event_id", "user_id"), dim, "user_id"),
        "enr",
        str(tmp_path / "cp"),
    )
    drive(q)
    got = spark.table("enr")
    want = (
        load_table(spark, "events", sf_dir)
        .select("event_id", "user_id")
        .join(dim, "user_id", "left")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.filter(F.col("c_mktsegment").isNull()).count() > 0


def test_jsonl_stream_bounded_triggers(spark, tmp_path):
    """maxFilesPerTrigger=1: a 3-drop backlog must drain as >= 3
    micro-batches (bounded ingestion), never one giant catch-up
    batch, and absorb every row exactly once."""
    import json

    from dot_spark.streaming import stream_jsonl_corpus

    src = tmp_path / "corpus"
    src.mkdir()
    ddl = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    for d in range(3):
        (src / f"drop{d}.jsonl").write_text(
            json.dumps(
                {"doc_id": d, "text": f"t{d}", "lang": "en", "source": "s",
                 "n_chars": 2}
            )
            + "\n"
        )
    batches = []
    q = (
        stream_jsonl_corpus(spark, str(src), ddl, max_files_per_trigger=1)
        .writeStream.foreachBatch(
            lambda df, bid: batches.append((bid, df.count()))
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(batches) >= 3, batches
    assert sum(n for _, n in batches) == 3


def test_streaming_corpus_dedup_matches_batch_pl5(spark, tmp_path):
    """The continuous-ingest twin of pl5: two JSONL drops streamed
    through foreachBatch cross-batch exact dedup, then the
    canonical_corpus compaction pass — the surviving doc set must
    equal the ONE-SHOT batch pipeline (dedup_corpus) over the same
    corpus. Drops carry exact dups (within a drop AND across drops)
    and a near-dup chain bridging the two drops, so both dedup
    stages and the cross-batch membership check are load-bearing.
    Ids grow with arrival order, so first-arrival == global-min-id
    and parity is exact."""
    import json

    from dot_spark.loads import Warehouse
    from dot_spark.operators.textdedup import dedup_corpus
    from dot_spark.pipelines import canonical_corpus, streaming_corpus_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs0 = [
        (1, base),  # canonical of the near-dup chain
        (2, base + " extra"),  # near-dup of 1
        (3, base),  # exact dup of 1, same drop
        (4, "completely different text about spark streaming micro batches"),
    ]
    docs1 = [
        (5, base),  # exact dup of 1, LATER drop (cross-batch member)
        (6, base + " extra words"),  # near-dup bridging into 1's cluster
        (7, "another unrelated document with its own unique content here"),
    ]
    src = tmp_path / "corpus"
    src.mkdir()
    for name, docs in (("drop0.jsonl", docs0), ("drop1.jsonl", docs1)):
        (src / name).write_text(
            "".join(
                json.dumps(
                    {
                        "doc_id": i,
                        "text": t,
                        "lang": "en",
                        "source": "s",
                        "n_chars": len(t),
                    }
                )
                + "\n"
                for i, t in docs
            )
        )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    (src / "drop1.jsonl").rename(tmp_path / "drop1.jsonl")  # stage drop 2
    q = streaming_corpus_dedup(spark, str(src), wh, str(tmp_path / "cp"))
    q.processAllAvailable()
    (tmp_path / "drop1.jsonl").rename(src / "drop1.jsonl")
    q.processAllAvailable()
    q.stop()

    got = sorted(r.doc_id for r in canonical_corpus(wh).select("doc_id").collect())

    ddl = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    batch_docs = spark.read.schema(ddl).json(str(src))
    want = sorted(r.doc_id for r in dedup_corpus(batch_docs).select("doc_id").collect())
    assert got == want
    # and the semantics are right, not just self-consistent: the
    # near-dup chain {1,2,6} collapses to 1; exact dups 3/5 are gone
    assert got == [1, 4, 7]


def test_jsonl_corpus_stream_absorbs_drops(spark, tmp_path):
    """stream_jsonl_corpus: each JSONL drop (gzip or plain, mixed in
    one directory) arrives as a micro-batch; the absorbed corpus
    equals the batch read of the same directory."""
    import gzip

    from dot_spark.streaming import stream_jsonl_corpus

    src = tmp_path / "corpus"
    src.mkdir()
    ddl = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    with gzip.open(src / "drop0.jsonl.gz", "wt") as f:
        f.write('{"doc_id": 1, "text": "a \\" b", "lang": "en", "source": "s", "n_chars": 5}\n')
        f.write('{"doc_id": 2, "text": "t2", "lang": "de", "source": "s", "n_chars": 2}\n')
    q = start_memory(stream_jsonl_corpus(spark, str(src), ddl), "jl", str(tmp_path / "cp"))
    q.processAllAvailable()
    (src / "drop1.jsonl").write_text('{"doc_id": 3, "text": "late", "lang": "en", "source": "s2", "n_chars": 4}\n')
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.table("jl").collect())
    want = sorted(tuple(r) for r in spark.read.schema(ddl).json(str(src)).collect())
    assert got == want and len(got) == 3
    assert got[0][1] == 'a " b'  # escaping round-trips


def test_stream_stream_join_parity_with_batch_attribution(spark, tmp_path):
    """The watermarked stream-stream join must produce exactly the
    batch j14 attribution pairs (inner subset) over the same events —
    including a pair at EXACTLY the 10-minute boundary (both are
    closed-interval)."""
    from dot_spark.streaming import stream_stream_join

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    c_dir, p_dir = tmp_path / "c", tmp_path / "p"
    c_dir.mkdir(); p_dir.mkdir()
    clicks = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": [t0, t0 + pd.Timedelta("10 min"), t0 + pd.Timedelta("25 min"), t0],
        "click_id": [1, 2, 3, 4],
    })
    buys = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": [t0 + pd.Timedelta("10 min"), t0 + pd.Timedelta("26 min"),
               t0 + pd.Timedelta("11 min")],
        "purchase_id": [90, 91, 92],
    })
    write_parquet(clicks, c_dir / "b0.parquet")
    write_parquet(buys, p_dir / "b0.parquet")

    c_stream = (spark.readStream
                .schema("user_id BIGINT, ts TIMESTAMP, click_id BIGINT")
                .format("parquet").load(str(c_dir)))
    p_stream = (spark.readStream
                .schema("user_id BIGINT, ts TIMESTAMP, purchase_id BIGINT")
                .format("parquet").load(str(p_dir)))
    # left = purchases, right = clicks: right ts in [l_ts - 10m, l_ts]
    q = start_memory(
        stream_stream_join(p_stream, c_stream, within="10 minutes"),
        "parity_attr", str(tmp_path / "cp"),
    )
    drive(q)
    streamed = {(r.user_id, r.purchase_id, r.r_click_id)
                for r in spark.table("parity_attr").collect()}

    # batch twin with the same closed-interval rule
    want = set()
    for _, b in buys.iterrows():
        for _, c in clicks.iterrows():
            if (c.user_id == b.user_id
                    and c.ts <= b.ts
                    and c.ts >= b.ts - pd.Timedelta("10 min")):
                want.add((int(b.user_id), int(b.purchase_id), int(c.click_id)))
    assert streamed == want
    # boundary pair present: click@t0 attributed to purchase@t0+10m
    assert (1, 90, 1) in streamed


def test_restart_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    """Checkpoint recovery, stateless path: two separate query
    INSTANCES share one checkpoint + parquet sink. The restart must
    resume at the committed offset — drop 1 is not reprocessed (no
    duplicate rows in the sink), drop 2 is not lost. This is the
    kill-and-redeploy story every production stream lives on."""
    src = tmp_path / "in"
    src.mkdir()
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")

    def run_instance():
        s = (
            spark.readStream.schema("event_id BIGINT, v BIGINT")
            .format("parquet")
            .load(str(src))
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .start()
        )
        drive(q)

    write_parquet(
        pd.DataFrame({"event_id": range(100), "v": [1] * 100}), src / "d1.parquet"
    )
    run_instance()
    write_parquet(
        pd.DataFrame({"event_id": range(100, 150), "v": [2] * 50}), src / "d2.parquet"
    )
    run_instance()
    got = spark.read.parquet(out)
    assert got.count() == 150
    assert got.select("event_id").distinct().count() == 150


def test_stateful_restart_merges_window_state_across_instances(spark, tmp_path):
    """Checkpoint recovery, STATEFUL path: an open event-time window
    must survive a stop/restart and keep absorbing rows. Drop 1
    leaves window W2 open in state (watermark hasn't passed it); the
    RESTARTED instance adds a late-but-in-watermark W2 row from drop
    2 and then closes the window — the emitted count must combine
    rows from both sides of the restart boundary, proving the state
    store was recovered, not rebuilt."""
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    src = tmp_path / "in"
    src.mkdir()
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")

    def run_instance():
        s = (
            spark.readStream.schema("ts TIMESTAMP, event_id BIGINT")
            .format("parquet")
            .load(str(src))
        )
        agg = (
            s.withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .count()
            .select(F.col("w.start").alias("w_start"), "count")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .start()
        )
        drive(q)

    # drop 1: 3 rows in W1 [10:00, 10:10), 2 rows in W2 [10:10, 10:20);
    # max ts 10:19 -> watermark 10:18 -> W1 emits, W2 stays OPEN state
    write_parquet(
        pd.DataFrame(
            {
                "ts": [
                    t0,
                    t0 + pd.Timedelta("2 min"),
                    t0 + pd.Timedelta("9 min"),
                    t0 + pd.Timedelta("12 min"),
                    t0 + pd.Timedelta("19 min"),
                ],
                "event_id": [1, 2, 3, 4, 5],
            }
        ),
        src / "d1.parquet",
    )
    run_instance()
    mid = spark.read.parquet(out)
    assert [(r["w_start"], r["count"]) for r in mid.collect()] == [
        (t0.to_pydatetime(), 3)
    ]
    # drop 2 (new instance): one MORE W2 row at 10:18 (any row whose
    # WINDOW-END is above the recovered watermark 10:18 is absorbed —
    # windowed aggregation evicts by window end, not row timestamp,
    # so even a 10:15 row would merge into the open W2 state) and a
    # 10:35 row that advances the watermark past W2 so it finally
    # emits.
    write_parquet(
        pd.DataFrame(
            {
                "ts": [t0 + pd.Timedelta("18 min"), t0 + pd.Timedelta("35 min")],
                "event_id": [6, 7],
            }
        ),
        src / "d2.parquet",
    )
    run_instance()
    got = {
        r["w_start"]: r["count"] for r in spark.read.parquet(out).collect()
    }
    # W2's count = 2 rows from before the restart + 1 after = 3
    assert got[(t0 + pd.Timedelta("10 min")).to_pydatetime()] == 3
    assert got[t0.to_pydatetime()] == 3


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter stream-stream join: a left row with no right match
    inside its window must emit with NULL right columns — but only
    after the watermark proves no future right row can still land in
    the window (outer results cannot emit eagerly). Driven as two
    micro-batches: batch 1 carries the data, batch 2 a far-future
    row that advances the watermark past every batch-1 window."""
    from dot_spark.streaming import stream_stream_join

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    clicks_dir.mkdir(); buys_dir.mkdir()
    write_parquet(
        pd.DataFrame({
            "user_id": [1, 2],
            "ts": [t0 + pd.Timedelta("5 min"), t0 + pd.Timedelta("6 min")],
            "click_id": [101, 102],
        }),
        clicks_dir / "b0.parquet",
    )
    # only user 1 purchased inside the window
    write_parquet(
        pd.DataFrame({"user_id": [1], "ts": [t0], "purchase_id": [900]}),
        buys_dir / "b0.parquet",
    )
    clicks = (spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, click_id BIGINT")
              .format("parquet").load(str(clicks_dir)))
    buys = (spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, purchase_id BIGINT")
            .format("parquet").load(str(buys_dir)))
    q = start_memory(
        stream_stream_join(clicks, buys, within="10 minutes", how="leftOuter"),
        "attributed_outer", str(tmp_path / "cp"),
    )
    q.processAllAvailable()
    # batch 1 emitted only the INNER match — the unmatched click is
    # still in state, because a qualifying purchase could still come
    inner_only = [(r.user_id, r.click_id, r.r_purchase_id)
                  for r in spark.table("attributed_outer").collect()]
    assert inner_only == [(1, 101, 900)]
    # advance event time far past every batch-1 window on BOTH sides
    # (the join watermark is the min of the two input watermarks)
    far = t0 + pd.Timedelta("3 hours")
    write_parquet(
        pd.DataFrame({"user_id": [99], "ts": [far], "click_id": [999]}),
        clicks_dir / "b1.parquet",
    )
    write_parquet(
        pd.DataFrame({"user_id": [98], "ts": [far], "purchase_id": [998]}),
        buys_dir / "b1.parquet",
    )
    q.processAllAvailable()
    # one more empty-ish trigger lets the new watermark evict + emit
    q.processAllAvailable()
    drive(q)
    got = {(r.user_id, r.click_id, r.r_purchase_id)
           for r in spark.table("attributed_outer").collect()}
    assert (2, 102, None) in got, got  # the outer row, nulls on the right
    assert (1, 101, 900) in got


def test_delayed_retry_twins_agree_on_null_and_lookalike_causes(spark, tmp_path):
    """The edge inputs where the twins used to diverge: a failure
    with NULL cause is STILL a qualifying failure (retries with
    cause 'Auto-retry: unknown'), and a cause that merely starts
    with 'Auto-retry' without the colon marker ('Auto-retryable:
    disk') is a real failure, not the loop guard. Batch and
    streaming must return the same verdicts."""
    import time

    from dot_spark.streaming.state import delayed_retries_batch

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "job_id": [1, 2, 3],
            "status": ["failure", "failure", "failure"],
            "cause": [None, "Auto-retryable: disk", "Auto-retry: oom"],
            "ts": [t0, t0, t0],
            "event_id": [1, 2, 3],
        }
    )
    batch = {
        r.job_id: r.cause
        for r in delayed_retries_batch(spark.createDataFrame(pdf)).collect()
    }
    assert batch == {
        1: "Auto-retry: unknown",
        2: "Auto-retry: Auto-retryable: disk",
    }  # job 3 is the guard: no retry

    src = tmp_path / "src"
    src.mkdir()
    write_parquet(pdf[["job_id", "status", "cause"]], src / "b0.parquet")
    stream = (
        spark.readStream.schema("job_id BIGINT, status STRING, cause STRING")
        .format("parquet")
        .load(str(src))
    )
    q = start_memory(
        delayed_retries(stream, delay_ms=700), "retry_twins", str(tmp_path / "cp")
    )
    deadline = time.time() + 60
    rows = []
    while time.time() < deadline:
        if q.exception():
            raise AssertionError(q.exception())
        rows = spark.table("retry_twins").collect()
        if len(rows) >= 2:
            break
        time.sleep(0.5)
    time.sleep(1.5)
    rows = spark.table("retry_twins").collect()
    q.stop()
    streamed = {r.job_id: r.cause for r in rows}
    assert streamed == batch


# --- pl14 crash-replay matrix: the streaming MV's exactly-once claim
# tested at BOTH crash windows of the stage->claim protocol
# (txlog.exactly_once_sink docstring; pipelines.streaming_mv_maintain).

def _mv_drops(tmp_path, n_drops=2, rows_per=3):
    """JSONL drops: drop d, row r -> user_id r, value 10*d+r, ts d*100+r."""
    import json as _json

    import os as _os
    import time as _time

    src = tmp_path / "mv_in"
    src.mkdir()
    base = _time.time() - 3600
    for d in range(n_drops):
        lines = [
            _json.dumps({"user_id": r, "value": 10.0 * d + r, "ts_us": d * 100 + r})
            for r in range(rows_per)
        ]
        f = src / f"{d:04d}.jsonl"
        f.write_text("\n".join(lines) + "\n")
        # FileStreamSource orders drops by mtime: pin it so drop d IS
        # micro-batch d (same-instant writes would tie)
        _os.utime(f, (base + d, base + d))
    return str(src)


def _mv_expected(n_drops=2, rows_per=3):
    """One-shot aggregate of every drop, applied exactly once."""
    out = {}
    for d in range(n_drops):
        for r in range(rows_per):
            n, s, lo, hi = out.get(r, (0, 0.0, None, None))
            v, t = 10.0 * d + r, d * 100 + r
            out[r] = (
                n + 1,
                s + v,
                t if lo is None else min(lo, t),
                t if hi is None else max(hi, t),
            )
    return out


def _run_mv(spark, src, mv_table, cp):
    from dot_spark.pipelines import streaming_mv_maintain

    return streaming_mv_maintain(
        spark, src, mv_table, cp,
        keys=["user_id"], value_col="value", ts_col="ts_us",
        schema="user_id BIGINT, value DOUBLE, ts_us BIGINT",
    )


def _mv_state(mv_table):
    return {
        r.user_id: (r.mv_n, r.mv_sum, r.mv_min_ts, r.mv_max_ts)
        for r in mv_table.read().collect()
    }


def test_streaming_mv_crash_between_stage_and_claim(spark, tmp_path):
    """Crash window 1: the process dies AFTER the merged MV state is
    staged but BEFORE the manifest claim. The staged files must stay
    invisible (readers still see the pre-crash version), and the
    restarted stream — foreachBatch is at-least-once, so the engine
    re-delivers the batch — must re-apply it fully. Final MV ==
    one-shot aggregate: nothing lost, nothing double-counted."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from dot_spark.txlog import TxTable

    src = _mv_drops(tmp_path)
    cp = str(tmp_path / "cp")
    mv_table = TxTable(spark, str(tmp_path / "mv_tx"))

    real_claim = mv_table._try_claim
    crashed = {"n": 0}

    def dying_claim(version, manifest):
        # batch 0 commits normally; batch 1 dies between stage and claim
        if manifest.get("mv_batch_id") == 1:
            crashed["n"] += 1
            raise RuntimeError("injected crash: post-stage, pre-claim")
        return real_claim(version, manifest)

    mv_table._try_claim = dying_claim
    q = _run_mv(spark, src, mv_table, cp)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    assert crashed["n"] == 1

    # pre-restart: the orphaned staged files are INVISIBLE — the MV
    # reads as batch 0 only (snapshot isolation across the crash)
    assert _mv_state(mv_table) == {
        r: (1, float(r), r, r) for r in range(3)
    }

    # restart with the SAME checkpoint: the engine re-delivers batch 1
    mv_table._try_claim = real_claim
    q2 = _run_mv(spark, src, mv_table, cp)
    q2.awaitTermination()
    want = _mv_expected()
    assert _mv_state(mv_table) == want

    # and the crash left recoverable garbage, not corruption: vacuum
    # reclaims the orphaned stage dir without touching live state
    mv_table.vacuum(grace_seconds=0)
    assert _mv_state(mv_table) == want


def test_streaming_mv_crash_after_claim_skips_replay(spark, tmp_path):
    """Crash window 2: the process dies AFTER the manifest claim
    landed (the batch IS committed) but before foreachBatch returns,
    so the engine checkpoint never records the batch and the restart
    re-delivers it. The replay must find the batch id in the manifest
    scan and SKIP — the non-idempotent merge runs once, no double
    count, and no new version is claimed for the replayed batch."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from dot_spark.txlog import TxTable

    src = _mv_drops(tmp_path)
    cp = str(tmp_path / "cp")
    mv_table = TxTable(spark, str(tmp_path / "mv_tx"))

    real_claim = mv_table._try_claim

    def claim_then_die(version, manifest):
        ok = real_claim(version, manifest)
        if ok and manifest.get("mv_batch_id") == 1:
            raise RuntimeError("injected crash: post-claim, pre-ack")
        return ok

    mv_table._try_claim = claim_then_die
    q = _run_mv(spark, src, mv_table, cp)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()

    # the claim landed: the MV already holds both batches
    want = _mv_expected()
    assert _mv_state(mv_table) == want
    v_before = mv_table.latest_version()

    # restart: batch 1 is re-delivered, found committed, skipped
    mv_table._try_claim = real_claim
    q2 = _run_mv(spark, src, mv_table, cp)
    q2.awaitTermination()
    assert _mv_state(mv_table) == want          # no double count
    assert mv_table.latest_version() == v_before  # no replay version
