"""Rule-per-test suite for the run classifier + webhook routing,
ported from the reference's dbt-classify/main_test.py:31-137 (same
rules, set-oriented engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dot_spark.routing import (
    classify_runs,
    gate_completed,
    parse_webhook,
    route_status,
    tally_failed_steps,
    tally_node_results,
)

RUNS_SCHEMA = (
    "run_id BIGINT, cause STRING, created_at STRING, "
    "metadata_available BOOLEAN, results_fetch_failed BOOLEAN"
)
STEPS_SCHEMA = "run_id BIGINT, status INT"
RESULTS_SCHEMA = "run_id BIGINT, unique_id STRING, status STRING, message STRING"


def run_row(run_id=1, cause="Scheduled run", created_at="2026-06-29T00:00:00Z",
            metadata_available=True, results_fetch_failed=False):
    return (run_id, cause, created_at, metadata_available, results_fetch_failed)


def classify_one(spark, runs, steps=None, results=None):
    runs_df = spark.createDataFrame(runs, RUNS_SCHEMA)
    steps_df = spark.createDataFrame(steps, STEPS_SCHEMA) if steps is not None else None
    res_df = spark.createDataFrame(results, RESULTS_SCHEMA) if results is not None else None
    rows = classify_runs(runs_df, steps_df, res_df).collect()
    assert len(rows) == len(runs)
    return rows[0] if len(rows) == 1 else {r.run_id: r for r in rows}


def test_transient_error_is_retryable(spark):
    v = classify_one(
        spark, [run_row()], steps=[(1, 20)],
        results=[(1, "model.a", "error", "Resources exceeded during query execution")],
    )
    assert v.reason == "transient" and v.is_retryable
    assert v.failed_count == 1 and v.nontransient_count == 0


def test_test_failure_is_nontransient(spark):
    v = classify_one(spark, [run_row()], steps=[(1, 20)],
                     results=[(1, "test.a", "fail", "")])
    assert v.reason == "nontransient" and not v.is_retryable
    assert v.nontransient_count == 1


def test_unknown_error_is_nontransient(spark):
    v = classify_one(spark, [run_row()], steps=[(1, 20)],
                     results=[(1, "model.b", "error", "Not found: Table prod.foo was not found")])
    assert v.reason == "nontransient" and not v.is_retryable


def test_mixed_transient_and_nontransient_not_retryable(spark):
    v = classify_one(
        spark, [run_row()], steps=[(1, 20), (1, 20)],
        results=[
            (1, "model.a", "error", "Service Unavailable"),
            (1, "model.b", "error", "Syntax error near SELECT"),
        ],
    )
    assert not v.is_retryable
    assert v.failed_count == 2 and v.nontransient_count == 1


def test_multiple_transient_errors_retryable(spark):
    v = classify_one(
        spark, [run_row()], steps=[(1, 20), (1, 20)],
        results=[
            (1, "model.a", "error", "Could not serialize access"),
            (1, "model.b", "error", "try again later"),
        ],
    )
    assert v.is_retryable
    assert v.failed_count == 2 and v.nontransient_count == 0


def test_no_results_not_retryable(spark):
    v = classify_one(spark, [run_row()], steps=[(1, 20)], results=[])
    assert v.reason == "no_results" and not v.is_retryable


def test_uncovered_step_not_retryable(spark):
    v = classify_one(spark, [run_row()], steps=[(1, 20)],
                     results=[(1, "model.ok", "success", "")])
    assert v.reason == "uncovered_step" and not v.is_retryable
    assert v.failed_step_count == 1 and v.failed_count == 0


def test_already_retried_is_loop_guarded(spark):
    v = classify_one(
        spark,
        [run_row(cause="Auto-retry for transient failure in run 123")],
        steps=[(1, 20)],
        results=[(1, "model.a", "error", "Service Unavailable")],
    )
    assert v.reason == "already_retried" and v.prior_is_retry and not v.is_retryable


def test_metadata_unavailable_fails_closed(spark):
    v = classify_one(spark, [run_row(metadata_available=False)])
    assert v.reason == "metadata_unavailable" and not v.is_retryable
    assert v.run_created_at == ""


def test_results_unavailable_not_retryable(spark):
    v = classify_one(spark, [run_row(results_fetch_failed=True)], steps=[(1, 20)])
    assert v.reason == "results_unavailable" and not v.is_retryable


def test_run_created_at_passed_through(spark):
    v = classify_one(spark, [run_row(created_at="2026-06-29T12:34:56Z")],
                     results=[(1, "model.a", "error", "backend error")])
    assert v.run_created_at == "2026-06-29T12:34:56Z"


def test_count_failed_steps(spark):
    steps = spark.createDataFrame([(1, 10), (1, 20), (1, 20), (2, 10)], STEPS_SCHEMA)
    got = {r.run_id: r.failed_step_count for r in tally_failed_steps(steps).collect()}
    assert got == {1: 2, 2: 0}


def test_classify_results_tallies(spark):
    res = spark.createDataFrame(
        [
            (1, "model.ok", "success", ""),
            (1, "model.t", "error", "deadline exceeded"),
            (1, "model.n", "error", "permission denied"),
            (1, "test.x", "fail", ""),
        ],
        RESULTS_SCHEMA,
    )
    r = tally_node_results(res).collect()[0]
    assert r.failed_count == 3
    assert r.nontransient_count == 2
    assert sorted(r.failed_nodes) == ["model.n", "model.t", "test.x"]
    assert sorted(r.nontransient_nodes) == ["model.n", "test.x"]


def test_classify_many_runs_at_once(spark):
    """Set-orientation: one plan classifies heterogeneous runs."""
    runs = [run_row(run_id=1), run_row(run_id=2),
            run_row(run_id=3, cause="Auto-retry again")]
    steps = [(1, 20), (2, 20), (3, 20)]
    results = [
        (1, "model.a", "error", "backend error"),
        (2, "model.b", "error", "Syntax error"),
        (3, "model.c", "error", "backend error"),
    ]
    vs = classify_one(spark, runs, steps, results)
    assert vs[1].reason == "transient"
    assert vs[2].reason == "nontransient"
    assert vs[3].reason == "already_retried"


# --- webhook parse / gate / route ------------------------------------------


def test_parse_webhook_flattens_payload(spark):
    body = (
        '{"eventType": "job.run.completed", "webhookId": "wh1",'
        ' "data": {"jobId": "85521", "runId": "9", "runStatus": "Error",'
        ' "runStatusCode": 20, "environmentId": "env7", "cause": "Scheduled"}}'
    )
    df = spark.createDataFrame([(1, body)], "id BIGINT, body STRING")
    r = parse_webhook(df).collect()[0]
    assert r.event_type == "job.run.completed"
    assert r.job_id == "85521" and r.run_status_code == 20
    assert r.environment_id == "env7"


def test_gate_and_route(spark):
    df = spark.createDataFrame(
        [
            ("job.run.completed", 20, "Error"),
            ("job.run.completed", 10, "Success"),
            ("job.run.completed", 30, "Cancelled"),
            ("job.run.started", 10, "Success"),
        ],
        "event_type STRING, run_status_code INT, run_status STRING",
    )
    gated = gate_completed(df)
    assert gated.count() == 3
    routed = gated.withColumn(
        "route", route_status(F.col("run_status_code"), F.col("run_status"))
    )
    got = {r.run_status_code: r.route for r in routed.collect()}
    assert got == {20: "retry", 10: "completed", 30: "ignore"}
