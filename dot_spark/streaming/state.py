"""Stateful streaming operators: dedup, superseded-run latest-wins,
windowed aggregation, and the connector drain state machine.

Reference semantics:
- ST3: at-least-once delivery tolerated via downstream dedup
  (docs/ARCHITECTURE.md:94,107) -> watermarked dropDuplicates.
- W4:  a retry is skipped when a newer run exists for the job
  ("superseded") -> per-key latest-wins state machine.
- ST7: Fivetran connector drain machine (running -> no-op, paused ->
  resume+sync, broken -> stop+signal, healthy -> force-sync;
  docs/DESIGN_fivetran_slot_safety_valve.md:85-108) ->
  applyInPandasWithState keyed by connector.

Scale: all state is per-key and watermark-evicted; the state store
shards with the shuffle partitioning, so 10^8 keys spread across
executors instead of a driver dict like the reference's in-process
maps.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once -> effectively-once: drop duplicate deliveries
    by key within the watermark horizon (ST3). State is the seen-key
    set, bounded by watermark eviction."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type —
    the streaming aggregation shape (late rows beyond the watermark
    are dropped; windows finalize exactly once in append mode)."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "5 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session-window aggregation per key: a session is a run of
    events with < `gap` between consecutive ones; the window closes
    when the watermark passes last_event + gap.

    Beyond-reference surface (the reference has no event-time
    windows at all): F.session_window keeps this fully declarative —
    state is per open session per key, bounded by the watermark, and
    merges are handled by the engine (sessions are merge-able state,
    unlike fixed windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


_SUPERSEDED_OUT = "user_id BIGINT, latest_event_id BIGINT, latest_ts TIMESTAMP, n_seen BIGINT"
_SUPERSEDED_STATE = "latest_event_id BIGINT, latest_ts_us BIGINT, n_seen BIGINT"


def _superseded_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    latest_id, latest_us, n_seen = (
        state.get if state.exists else (None, None, 0)
    )
    # per-batch work is VECTORIZED (lexicographic argmax over
    # (ts, event_id)); only the cross-batch state transition is
    # scalar Python — the no-row-at-a-time rule applies inside
    # applyInPandasWithState too
    for pdf in pdfs:
        if not len(pdf):
            continue
        us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        eid = pdf["event_id"].to_numpy().astype("int64")
        n_seen += len(pdf)
        # latest wins; event_id breaks ts ties (W4 determinism)
        i = np.lexsort((eid, us))[-1]
        if latest_us is None or (int(us[i]), int(eid[i])) > (latest_us, latest_id):
            latest_us, latest_id = int(us[i]), int(eid[i])
    state.update((latest_id, latest_us, n_seen))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "latest_event_id": [latest_id],
            "latest_ts": [pd.Timestamp(latest_us, unit="us")],
            "n_seen": [n_seen],
        }
    )


def superseded_latest(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Latest-run-wins per key as an incremental state machine (W4 /
    ST3: "skip the retry if a newer run exists"). Emits the current
    winner per key each batch; a retry consumer joins against this to
    drop superseded work."""
    return events.groupBy(key_col).applyInPandasWithState(
        _superseded_fn,
        _SUPERSEDED_OUT,
        _SUPERSEDED_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- ST5: delayed retry with loop guard -------------------------------------

_RETRY_OUT = "job_id BIGINT, action STRING, cause STRING"
_RETRY_STATE = "pending_cause STRING"


def _make_retry_fn(delay_ms: int):
    def _retry_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (cause,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "job_id": [key[0]],
                    "action": ["retry"],
                    "cause": [f"Auto-retry: {cause}"],
                }
            )
            return
        pending = state.get[0] if state.exists else None
        # vectorized per batch: the fold (failure sets pending,
        # success clears it, Auto-retry-prefixed failures are the
        # loop guard and no-op) depends only on the LAST relevant row
        for pdf in pdfs:
            if not len(pdf):
                continue
            status = pdf["status"].astype(str)
            # NULL cause: still a failure (qualifies; the stored
            # cause becomes 'unknown'); the loop guard matches the
            # EXACT emitted marker prefix 'Auto-retry:' — a cause
            # that merely starts with 'Auto-retry' (e.g.
            # 'Auto-retryable: disk') is a real failure, not our
            # marker. Both rules mirrored by delayed_retries_batch.
            cause = pdf["cause"].fillna("unknown").astype(str)
            qual_fail = (status == "failure") & ~cause.str.startswith("Auto-retry:")
            relevant = qual_fail | (status == "success")
            if relevant.any():
                i = np.flatnonzero(relevant.to_numpy())[-1]
                pending = str(cause.iloc[i]) if bool(qual_fail.iloc[i]) else None
        if pending is not None:
            state.update((pending,))
            state.setTimeoutDuration(delay_ms)
        elif state.exists:
            state.remove()

    return _retry_fn


def delayed_retries(
    failure_events: DataFrame,
    key_col: str = "job_id",
    delay_ms: int = 300_000,
) -> DataFrame:
    """Delayed single-retry machine (ST5): a failed job is retried
    once after `delay_ms` (the reference's 5-minute base delay,
    docs/ARCHITECTURE.md:93,109), unless a newer success for the same
    job arrives first (superseded, ARCHITECTURE.md:94,107).

    The loop guard is encoded in data, not a counter, exactly as the
    reference does it (dbt-classify/classifier.py:39-47): the emitted
    retry carries an "Auto-retry: " cause prefix, and failures
    already carrying that prefix are never re-queued — so the retry
    storm is structurally bounded at one per failure.

    Timers are processing-time GroupState timeouts: the pending
    retry lives in the state store (sharded by key, watermark-free —
    state size is bounded by in-flight failures), and fires on the
    first micro-batch after the delay elapses.
    """
    return failure_events.groupBy(key_col).applyInPandasWithState(
        _make_retry_fn(delay_ms),
        _RETRY_OUT,
        _RETRY_STATE,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def delayed_retries_batch(
    status_events: DataFrame,
    key_col: str = "job_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    delay: str = "5 minutes",
) -> DataFrame:
    """Batch twin of the ST5 delayed-retry machine (`delayed_retries`
    above), built from the SAME fold semantics as pure window
    expressions — the oracle-checkable transition table
    (docs/ARCHITECTURE.md:93,104; the data-encoded loop guard is
    dbt-classify/classifier.py:39-47).

    The streaming fold per job is: a QUALIFYING failure (cause not
    already "Auto-retry: "-prefixed — the loop guard) sets the
    pending retry; a success clears it; guard-prefixed failures are
    no-ops. At quiescence a job retries iff its LAST relevant event
    is a qualifying failure — so the batch form is keep-latest over
    relevant rows, emitting (job, 'retry', guarded cause,
    failure_ts + delay). Superseded jobs (success after the failure)
    and guard-only jobs emit nothing, exactly as the timer machine's
    state.remove() paths.

    Scale shape: ONE keyed window exchange over the pre-filtered
    relevant rows (failures+successes are a sliver of the event
    stream); everything else is row-local expressions.
    """
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in (ts_col, *order_cols)]
    )
    # NULL-cause failures qualify (coalesce the guard test to False),
    # mirroring the streaming fold's fillna('unknown')
    qualifying = (F.col("status") == "failure") & ~F.coalesce(
        F.col("cause").startswith("Auto-retry:"), F.lit(False)
    )
    return (
        status_events.filter(qualifying | (F.col("status") == "success"))
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("status") == "failure"))
        .select(
            key_col,
            F.lit("retry").alias("action"),
            F.concat(
                F.lit("Auto-retry: "), F.coalesce(F.col("cause"), F.lit("unknown"))
            ).alias("cause"),
            (F.col(ts_col) + F.expr(f"INTERVAL {delay}")).alias("retry_at"),
        )
    )


# --- ST7: connector drain state machine ------------------------------------

# status -> (actions, next_phase); reference semantics from
# docs/DESIGN_fivetran_slot_safety_valve.md:85-108.
_DRAIN_TRANSITIONS: dict[str, tuple[list[str], str]] = {
    "running": (["noop"], "draining"),
    "paused": (["resume", "sync"], "draining"),
    "broken": (["stop", "signal"], "stopped"),
    "healthy": (["force-sync"], "draining"),
}

_DRAIN_OUT = "connector_id STRING, status STRING, action STRING, phase STRING, n_events BIGINT"
_DRAIN_STATE = "phase STRING, n_events BIGINT"


def _drain_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    phase, n_events = state.get if state.exists else ("idle", 0)
    parts: list[pd.DataFrame] = []
    phase_map = {s: p for s, (_, p) in _DRAIN_TRANSITIONS.items()}
    for pdf in pdfs:
        if not len(pdf):
            continue
        status = pdf["status"].astype(str).reset_index(drop=True)
        # the stopped latch, vectorized: a connector is stopped for
        # row i iff it entered the batch stopped or some EARLIER row
        # was 'broken' (the broken row itself still emits stop+signal)
        broken_before = np.zeros(len(pdf), dtype=bool)
        broken_before[1:] = np.cumsum((status == "broken").to_numpy())[:-1] > 0
        stopped = broken_before | (phase == "stopped")
        # phase after each row: known statuses map through the
        # transition table, unknown ones carry the previous phase
        # forward (ffill seeded with the entering phase)
        phase_after = (
            status.map(phase_map).ffill().fillna(phase).where(~stopped, "stopped")
        )
        batch = pd.DataFrame(
            {
                "connector_id": key[0],
                "status": status,
                # plain-string list build + explode replaces the old
                # iterrows loop (no per-row pandas objects)
                "action": [
                    ["noop"] if stop else _DRAIN_TRANSITIONS.get(s, (["noop"], None))[0]
                    for s, stop in zip(status.to_numpy(), stopped)
                ],
                "phase": phase_after,
                "n_events": n_events + np.arange(1, len(pdf) + 1),
            }
        ).explode("action")[["connector_id", "status", "action", "phase", "n_events"]]
        parts.append(batch)
        phase = str(phase_after.iloc[-1])
        n_events += len(pdf)
    state.update((phase, n_events))
    yield pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        {c: [] for c in ("connector_id", "status", "action", "phase", "n_events")}
    )


def drain_actions(status_events: DataFrame, key_col: str = "connector_id") -> DataFrame:
    """The connector drain machine (ST7) as a keyed stateful stream:
    input rows (connector_id, status, ts...), output action rows.

    running -> no-op; paused -> resume + sync; broken -> stop +
    signal (and the connector latches in 'stopped'); healthy ->
    force-sync. Per-connector phase lives in the state store, sharded
    by key — the distributed form of the reference's per-connector
    orchestration loop.
    """
    return status_events.groupBy(key_col).applyInPandasWithState(
        _drain_fn,
        _DRAIN_OUT,
        _DRAIN_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def drain_actions_batch(
    status_events: DataFrame,
    key_col: str = "connector_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Batch twin of the ST7 drain machine, built from the SAME
    transition table (_DRAIN_TRANSITIONS) as pure window + explode
    expressions — the oracle-checkable form of the state machine
    (the streaming form's output depends on arrival order, which a
    distributed stream cannot pin; this twin pins it with an explicit
    deterministic (ts, id) ordering per connector).

    Semantics per row, identical to _drain_fn over in-order arrival:
    - stopped latch: TRUE iff a strictly earlier row for the same
      connector was 'broken' (the broken row itself still emits its
      stop+signal actions);
    - actions/phase from the shared transition table, with unknown
      statuses carrying the last known phase forward ('idle' seed);
    - n_events = running per-connector event count.

    Scale shape: ONE keyed window exchange (all four window
    expressions share the same partitioning/ordering), then a
    zero-shuffle explode of ≤2-element literal arrays.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prior = w.rowsBetween(Window.unboundedPreceding, -1)

    stopped = F.coalesce(
        F.sum(F.when(F.col("status") == "broken", 1).otherwise(0)).over(prior) > 0,
        F.lit(False),
    )

    acts: F.Column = F.array(F.lit("noop"))
    phase_known: F.Column = F.lit(None).cast("string")
    for status, (actions, next_phase) in _DRAIN_TRANSITIONS.items():
        acts = F.when(F.col("status") == status, F.array(*[F.lit(a) for a in actions])).otherwise(
            acts
        )
        phase_known = F.when(F.col("status") == status, F.lit(next_phase)).otherwise(phase_known)

    phase = F.when(stopped, F.lit("stopped")).otherwise(
        F.coalesce(F.last(phase_known, ignorenulls=True).over(w), F.lit("idle"))
    )

    return (
        status_events.select(
            F.col(key_col).alias("connector_id"),
            "status",
            F.when(stopped, F.array(F.lit("noop"))).otherwise(acts).alias("_acts"),
            phase.alias("phase"),
            F.row_number().over(w).cast("bigint").alias("n_events"),
        )
        .withColumn("action", F.explode("_acts"))
        .select("connector_id", "status", "action", "phase", "n_events")
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream inner join: left events matched to
    right events for the same key with right_ts in
    [left_ts - within, left_ts] (the attribution-window shape:
    "which purchase preceded this click by at most N minutes").

    Beyond-reference surface. State honesty at scale: BOTH sides are
    buffered in the state store keyed by `key_col`; the watermark +
    the time-range condition bound how long each row is retained
    (left rows expire `within` past their ts, right rows when no
    future left row can match). Without the range condition the
    state would grow forever — the constraint is what makes the join
    runnable on an unbounded stream.
    """
    # right residuals come back prefixed r_ (as asof_join prefixes
    # asof_) so two streams sharing payload column names (both
    # carrying 'value', 'event_id', ...) never collide in the select
    l_res = [c for c in left.columns if c not in (key_col, left_ts)]
    r_res = [c for c in right.columns if c not in (key_col, right_ts)]
    l = left.select(
        F.col(key_col).alias("__k"),
        F.col(left_ts).alias("l_ts"),
        *l_res,
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key_col).alias("__k"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in r_res],
    ).withWatermark("r_ts", watermark)
    cond = (
        (l["__k"] == r["__k"])
        & (r["r_ts"] <= l["l_ts"])
        & (r["r_ts"] >= F.expr(f"l_ts - INTERVAL {within}"))
    )
    # leftOuter: unmatched left rows are held in state until the
    # watermark proves no future right row can land inside their
    # window, THEN emit with null right columns — the state-eviction
    # semantics that make outer results correct on an unbounded
    # stream (they cannot emit eagerly; a match may still arrive).
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    return l.join(r, cond, how).select(
        l["__k"].alias(key_col), "l_ts", "r_ts",
        *l_res,
        *[f"r_{c}" for c in r_res],
    )
