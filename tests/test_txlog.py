"""Transactional commit-log tests: atomic version claims, optimistic
concurrency, snapshot isolation, time travel, vacuum — the multi-writer
contract loads.py's single-writer promote/merge cannot give."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from dot_spark.txlog import CommitConflict, TxTable


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_append_snapshots_accumulate_and_time_travel(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.append(_df(spark, 0, 10, "a"))
    v2 = t.append(_df(spark, 10, 30, "b"))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 30
    assert t.read(version=1).count() == 10  # time travel
    assert sorted(r.id for r in t.read(version=1).collect()) == list(range(10))


def test_overwrite_replaces_and_validates_read_snapshot(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 10, "a"))
    v = t.latest_version()
    # concurrent writer advances the table past our read snapshot
    t.append(_df(spark, 10, 20, "b"))
    with pytest.raises(CommitConflict):
        t.overwrite(_df(spark, 100, 105, "c"), read_version=v)
    # the losing writer re-reads and retries against the new snapshot
    v2 = t.latest_version()
    t.overwrite(_df(spark, 100, 105, "c"), read_version=v2)
    assert sorted(r.id for r in t.read().collect()) == list(range(100, 105))


def test_concurrent_appends_serialize_without_loss(spark, tmp_path):
    """4 threads x 5 appends racing on the claim: every version number
    is won exactly once (contiguous log, no gaps or duplicates) and
    the final snapshot contains every batch — the property the
    os.link CAS exists to provide."""
    t = TxTable(spark, str(tmp_path / "t"))
    n_threads, n_batches, rows_per = 4, 5, 7
    errs = []

    def worker(i):
        try:
            for b in range(n_batches):
                lo = (i * n_batches + b) * rows_per
                t.append(_df(spark, lo, lo + rows_per, f"w{i}"))
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs
    total = n_threads * n_batches
    assert t.versions() == list(range(1, total + 1))
    got = sorted(r.id for r in t.read().collect())
    assert got == list(range(total * rows_per))
    # snapshots are monotone: every resolved file set contains its
    # predecessor's (appends never drop files)
    prev: set = set()
    for v in t.versions():
        cur = set(t.files_at(v))
        assert prev <= cur, v
        prev = cur


def test_vacuum_drops_unreferenced_files_keeps_latest_readable(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 10, "a"))
    t.append(_df(spark, 10, 20, "b"))
    t.overwrite(_df(spark, 50, 55, "c"))
    # default grace protects fresh (possibly in-flight) stages
    assert t.vacuum(retain_last=1) == 0
    removed = t.vacuum(retain_last=1, grace_seconds=0)
    assert removed >= 2  # both append stages became unreferenced
    assert sorted(r.id for r in t.read().collect()) == list(range(50, 55))
    # time travel outside the retained window is gone
    assert t.versions() == [3]


def test_staged_but_uncommitted_files_are_invisible(spark, tmp_path):
    """A writer that stages data but dies before claiming leaves the
    table exactly as it was: readers resolve manifests, never
    directory listings."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 10, "a"))
    t._stage(_df(spark, 90, 99, "ghost"))  # crash before commit
    assert t.read().count() == 10
    # within the grace window the orphan is indistinguishable from an
    # in-flight writer's stage — vacuum must NOT touch it
    assert t.vacuum(retain_last=1) == 0
    # offline GC (grace 0) reclaims it
    assert t.vacuum(retain_last=1, grace_seconds=0) >= 1
    assert t.read().count() == 10


def test_exactly_once_sink_under_stream_and_replay(spark, tmp_path):
    """The transactional foreachBatch sink: a real stream commits one
    manifest per micro-batch; re-invoking the sink with an already-
    committed batch id (at-least-once redelivery, including a
    DIFFERENT partial payload for the same id) must change nothing —
    the log, not the payload, decides."""
    import pandas as pd

    from dot_spark.txlog import TxTable, exactly_once_sink
    from tests.test_streaming import drive, write_parquet

    src = tmp_path / "src"
    src.mkdir()
    pdf = pd.DataFrame({"job_id": [1, 2, 3], "status": ["ok", "ok", "err"]})
    write_parquet(pdf, src / "b0.parquet")

    t = TxTable(spark, str(tmp_path / "tx"))
    sink = exactly_once_sink(t)
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
    assert t.read().count() == 3
    v_after_stream = t.latest_version()

    # redeliver batch 0 verbatim, then as a partial payload: no-op both
    sink(spark.createDataFrame(pdf), 0)
    sink(spark.createDataFrame(pdf.head(1)), 0)
    assert t.latest_version() == v_after_stream
    assert t.read().count() == 3

    # a NEW batch id commits exactly once
    sink(spark.createDataFrame(pdf.head(2)), 1)
    assert t.latest_version() == v_after_stream + 1
    assert t.read().count() == 5
    # manifest carries the batch provenance
    assert t.manifest(t.latest_version())["batch_id"] == 1


def test_vacuum_carries_batch_ids_forward_for_replay_skip(spark, tmp_path):
    """Vacuum must not open a double-append window: dropping the
    manifest that RECORDS a batch id folds the id into the
    _committed_ids.json sidecar, so a fresh sink (crash recovery —
    new process, new scanner closure) redelivering that batch still
    skips it."""
    import pandas as pd

    from dot_spark.txlog import exactly_once_sink

    t = TxTable(spark, str(tmp_path / "tx"))
    sink = exactly_once_sink(t)
    pdf = pd.DataFrame({"k": [1, 2]})
    sink(spark.createDataFrame(pdf), 0)
    sink(spark.createDataFrame(pdf), 1)
    sink(spark.createDataFrame(pdf), 2)
    # vacuum truncates the log to the latest manifest only — the
    # manifests recording batch 0 and 1 are gone...
    t.vacuum(retain_last=1, grace_seconds=0)
    assert t.versions() == [3]
    # ...but their ids survive in the sidecar
    assert sorted(t.retired_ids()["batch_id"]) == [0, 1]
    # a FRESH sink (recovery restarts the process) replaying batch 0
    # is still a no-op
    fresh = exactly_once_sink(t)
    v = t.latest_version()
    fresh(spark.createDataFrame(pdf), 0)
    fresh(spark.createDataFrame(pdf), 1)
    assert t.latest_version() == v
    assert t.read().count() == 6
    # a second vacuum keeps the carried ids (no forgetting)
    t.append(spark.createDataFrame(pdf))
    t.vacuum(retain_last=1, grace_seconds=0)
    assert sorted(t.retired_ids()["batch_id"]) == [0, 1, 2]


def test_vacuum_reclaims_zero_data_stage_dirs(spark, tmp_path):
    """An aborted executor write can leave a stage dir holding only
    _SUCCESS/metadata files; once grace-expired and unreferenced it
    is garbage and must be reclaimed, not leak forever."""
    import os

    t = TxTable(spark, str(tmp_path / "tx"))
    t.append(_df(spark, 0, 5, "a"))
    ghost = os.path.join(t.data_dir, "deadbeefcafe")
    os.makedirs(ghost)
    open(os.path.join(ghost, "_SUCCESS"), "w").close()
    # grace window protects it (could be an in-flight writer)
    t.vacuum(retain_last=1)
    assert os.path.isdir(ghost)
    # offline GC reclaims it even though it holds zero parquet parts
    t.vacuum(retain_last=1, grace_seconds=0)
    assert not os.path.isdir(ghost)
    assert t.read().count() == 5  # referenced data untouched


def test_scanner_tolerates_concurrently_vacuumed_manifest(spark, tmp_path):
    """A manifest unlinked between versions() and manifest() (vacuum
    racing the scanner) is skipped, not fatal — its id, if any, is in
    the sidecar."""
    import os

    from dot_spark.txlog import committed_ids_scanner

    t = TxTable(spark, str(tmp_path / "tx"))
    t.append(_df(spark, 0, 5, "a"))
    t.append(_df(spark, 5, 9, "b"))
    # simulate the race: v1 vanishes after versions() would list it
    os.unlink(t._manifest_path(1))
    committed = committed_ids_scanner(t)
    assert committed() == set()  # no ids anywhere; and no crash


def test_append_manifests_are_deltas_with_checkpoint_anchors(spark, tmp_path):
    """Commit cost is O(new files): append manifests carry only their
    own `add` list (never the full table file set), and every
    checkpoint_interval-th commit lands a ckpt anchor holding the
    full resolved state — the Delta checkpoint pattern."""
    import os

    t = TxTable(spark, str(tmp_path / "tx"), checkpoint_interval=3)
    for i in range(7):
        t.append(_df(spark, i * 5, i * 5 + 5, f"b{i}"))
    # deltas: each manifest's add is its own files only
    for v in t.versions():
        m = t.manifest(v)
        assert "files" not in m and len(m["add"]) >= 1
    # anchors at v3 and v6
    assert os.path.exists(t._ckpt_path(3))
    assert os.path.exists(t._ckpt_path(6))
    assert not os.path.exists(t._ckpt_path(7))
    # resolution equals the cumulative union at every version
    seen: list[str] = []
    for v in t.versions():
        seen += t.manifest(v)["add"]
        assert t.files_at(v) == seen
    assert sorted(r.id for r in t.read().collect()) == list(range(35))
    assert sorted(r.id for r in t.read(version=2).collect()) == list(range(10))


def test_vacuum_compaction_keeps_retained_snapshots_resolvable(spark, tmp_path):
    """The checkpoint+vacuum+time-travel law the log needs at 1e6+
    files: after vacuum truncates the log prefix, every RETAINED
    version still resolves to exactly the file set it had before —
    a reader pinned inside the window survives compaction."""
    t = TxTable(spark, str(tmp_path / "tx"), checkpoint_interval=100)  # no auto-ckpt
    for i in range(6):
        t.append(_df(spark, i * 3, i * 3 + 3, f"b{i}"))
    before = {v: t.files_at(v) for v in t.versions()}
    t.vacuum(retain_last=3, grace_seconds=0)
    assert t.versions() == [4, 5, 6]
    for v in (4, 5, 6):
        assert t.files_at(v) == before[v], v
    assert sorted(r.id for r in t.read(version=4).collect()) == list(range(12))
    # and the table keeps working: new appends resolve on top
    t.append(_df(spark, 100, 103, "post"))
    assert t.read().count() == 21
    # a second compaction over the post-vacuum log also holds
    t.vacuum(retain_last=1, grace_seconds=0)
    assert t.read().count() == 21


def test_checkpoint_vacuum_time_travel_law_property(spark, tmp_path):
    """Property over random op sequences: any mix of appends and
    overwrites, any checkpoint cadence, any retention — retained
    snapshots resolve identically before and after vacuum, and the
    head of the table never changes. (Driven as a seeded loop rather
    than @given: a SparkSession inside hypothesis shrinking is too
    slow, and the row payloads don't matter — only the op/file-list
    algebra does, which the seeds cover.)"""
    import random

    for seed in (7, 19, 23):
        rng = random.Random(seed)
        t = TxTable(
            spark,
            str(tmp_path / f"tx{seed}"),
            checkpoint_interval=rng.choice([1, 2, 5, 100]),
        )
        lo = 0
        for _ in range(rng.randint(4, 9)):
            if rng.random() < 0.3:
                t.overwrite(_df(spark, lo, lo + 2, "o"))
            else:
                t.append(_df(spark, lo, lo + 2, "a"))
            lo += 2
        retain = rng.randint(1, t.latest_version())
        before = {v: t.files_at(v) for v in t.versions()[-retain:]}
        head_rows = sorted(r.id for r in t.read().collect())
        t.vacuum(retain_last=retain, grace_seconds=0)
        assert t.versions() == sorted(before)
        for v, files in before.items():
            assert t.files_at(v) == files, (seed, v)
        assert sorted(r.id for r in t.read().collect()) == head_rows, seed


def test_manifest_stats_prune_files_never_changes_results(spark, tmp_path):
    """Per-file min/max stats recorded at write time let prune_files
    drop files from the manifest alone; the laws: (a) every row
    matching the range survives pruning, (b) files without stats are
    conservatively read, (c) stats survive checkpoint + vacuum."""
    t = TxTable(spark, str(tmp_path / "tx"), checkpoint_interval=100)
    # split on a range-correlated column -> tight per-file envelopes
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") / 100).cast("long").alias("bucket")
    )
    t.append(df, stats_cols=["k"], split_col="bucket")
    kept, total = t.prune_files({"k": (250, 449)})
    assert total == 10 and len(kept) == 3  # buckets 2, 3, 4
    got = sorted(r.k for r in t.read_pruned({"k": (250, 449)}).collect())
    assert got == list(range(250, 450))
    # (b) a stats-less append is always read
    t.append(
        spark.range(5000, 5010)
        .coalesce(1)
        .select(F.col("id").alias("k"), F.lit(99).alias("bucket"))
    )
    kept2, total2 = t.prune_files({"k": (250, 449)})
    assert total2 == 11 and len(kept2) == len(kept) + 1
    assert t.read_pruned({"k": (250, 449)}).count() == 200
    # (c) checkpoint + vacuum keep the stats (prune still works on
    # the compacted log)
    t.append(df.withColumn("k", F.col("k") + 10_000), stats_cols=["k"], split_col="bucket")
    t.vacuum(retain_last=1, grace_seconds=0)
    kept3, total3 = t.prune_files({"k": (10_250, 10_449)})
    # 3 stat-pruned buckets of the new batch + the stats-less file
    # (conservatively read forever)
    assert total3 == 21 and len(kept3) == 4
    assert t.read_pruned({"k": (10_250, 10_449)}).count() == 200


def test_concurrent_appends_during_vacuum_lose_nothing(spark, tmp_path):
    """Vacuum is single-maintenance-process but must be safe AGAINST
    concurrent commits: appenders race a vacuum loop (default grace —
    fresh stages are protected even while unreferenced) and every
    appended row must survive, with the log still contiguous."""
    import threading

    t = TxTable(spark, str(tmp_path / "tx"))
    t.append(_df(spark, 0, 5, "seed"))
    errs = []

    def appender(i):
        try:
            for b in range(3):
                lo = 100 + (i * 3 + b) * 10
                t.append(_df(spark, lo, lo + 10, f"w{i}"))
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    def vacuumer():
        try:
            for _ in range(5):
                t.vacuum(retain_last=1)  # default grace protects stages
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    ts = [threading.Thread(target=appender, args=(i,)) for i in range(2)]
    ts.append(threading.Thread(target=vacuumer))
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs
    got = sorted(r.id for r in t.read().collect())
    expect = sorted(list(range(0, 5)) + [v for i in range(2) for b in range(3) for v in range(100 + (i * 3 + b) * 10, 110 + (i * 3 + b) * 10)])
    assert got == expect
    vs = t.versions()
    assert vs == list(range(vs[0], vs[0] + len(vs)))  # contiguous tail


def test_state_at_survives_vacuum_racing_the_walk(spark, tmp_path, monkeypatch):
    """Injected race (the r10 scanner-TOCTOU pattern applied to the
    OTHER read paths): a vacuum completes in the middle of a snapshot
    resolution walk — after the walk checked the latest version's
    (absent) checkpoint but before it opened a lower manifest that
    vacuum unlinks. Resolution must RESTART and meet the anchor
    checkpoint vacuum wrote before unlinking, returning exactly the
    pre-vacuum file set; prune_files and read() ride the same
    machinery."""
    from dot_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "tx"), checkpoint_interval=10_000)
    for i in range(4):
        t.append(_df(spark, i * 5, i * 5 + 5, f"b{i}"))
    latest = t.latest_version()
    want_files = t.files_at(latest)

    orig = TxTable.manifest
    state = {"armed": True}

    def hooked(self, v):
        if state["armed"] and v == latest - 1:
            # the walk is between versions: fire the racing vacuum NOW
            state["armed"] = False
            t.vacuum(retain_last=1, grace_seconds=0)
        return orig(self, v)

    monkeypatch.setattr(TxTable, "manifest", hooked)
    files, _ = t._state_at(latest)
    assert files == want_files
    assert not state["armed"], "race was not actually injected"
    # and the full read path still returns every row
    assert sorted(r.id for r in t.read().collect()) == list(range(20))


def test_prune_files_survives_vacuum_racing_the_walk(spark, tmp_path, monkeypatch):
    """Same injected race through prune_files: the stats-pruning scan
    resolves a snapshot mid-vacuum and must come back with the
    anchored state, not a FileNotFoundError."""
    from dot_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "tx"), checkpoint_interval=10_000)
    for i in range(4):
        t.append(_df(spark, i * 5, i * 5 + 5, f"b{i}"))
    latest = t.latest_version()
    n_before = t.prune_files({"id": (0, 100)}, version=latest)[1]

    orig = TxTable.manifest
    state = {"armed": True}

    def hooked(self, v):
        if state["armed"] and v == latest - 1:
            state["armed"] = False
            t.vacuum(retain_last=1, grace_seconds=0)
        return orig(self, v)

    monkeypatch.setattr(TxTable, "manifest", hooked)
    kept, total = t.prune_files({"id": (0, 4)}, version=latest)
    assert total == n_before
    assert not state["armed"]
    assert len(kept) >= 1  # the id<=4 file survives pruning


def test_state_at_raises_cleanly_for_version_dropped_mid_walk(
    spark, tmp_path, monkeypatch
):
    """If the version being resolved itself LEAVES the retention
    window during the walk (reader asked for v1, vacuum retained only
    the latest), resolution must raise a contextual error after its
    bounded restarts — never loop forever, never return a guessed
    state."""
    import pytest

    from dot_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "tx"), checkpoint_interval=10_000)
    for i in range(4):
        t.append(_df(spark, i * 5, i * 5 + 5, f"b{i}"))

    orig = TxTable.manifest
    state = {"armed": True}

    def hooked(self, v):
        if state["armed"] and v == 2:
            state["armed"] = False
            t.vacuum(retain_last=1, grace_seconds=0)  # drops v1-v3
        return orig(self, v)

    monkeypatch.setattr(TxTable, "manifest", hooked)
    with pytest.raises(FileNotFoundError, match="retention window"):
        t._state_at(2)
    assert not state["armed"]
