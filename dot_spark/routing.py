"""Rule-based run classification + webhook event routing.

Spark-first restatement of the reference's dbt auto-retry pipeline:

- dbt-classify/classifier.py:26-33  — transient-error regex allowlist (F1)
- dbt-classify/classifier.py:50-79  — step/node tallies (A3, A4)
- dbt-classify/classifier.py:98-136 — decision tree -> verdict (P5)
- dbt-webhook/webhook_utils.py:63-99 — camelCase payload -> typed record (N6)
- dbt-webhook/main.py:298-319       — event gate + status routing (P4, P5)

The reference classifies ONE run per HTTP call with Python loops over
run_results.json. Here classification is set-oriented: a single plan
classifies every run in a table at once — conditional aggregations
(map-side partial agg) per run, then one CASE projection for the
decision tree. At 100 TB of run history this is one shuffle on
run_id; nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Transient/infrastructure error allowlist (case-insensitive),
# semantics per dbt-classify/classifier.py:26-33. Default-deny: a
# failure message must match to be retryable.
TRANSIENT_PATTERN = (
    "(?i)already exists: job|ratelimitexceeded|exceeded rate limits"
    "|jobratelimitexceeded|quota exceeded|quotaexceeded"
    "|resources exceeded|resourcesexceeded|service unavailable"
    "|backend error|backenderror|internal error|deadline exceeded"
    "|deadlineexceeded|could not serialize access|connection reset"
    "|connection aborted|connection broken|try again later"
)

# dbt Cloud run-step status: 20 == Error (classifier.py:36).
STEP_STATUS_ERROR = 20

AUTO_RETRY_PATTERN = "(?i)auto-retry"


def is_transient_message(msg: Column) -> Column:
    """True when an error message matches the transient allowlist
    (classifier.py:72). NULL message => not transient (default-deny)."""
    return F.coalesce(msg, F.lit("")).rlike(TRANSIENT_PATTERN)


def tally_node_results(results: DataFrame, run_col: str = "run_id") -> DataFrame:
    """Per-run failed / non-transient tallies over node results
    (classify_results, classifier.py:56-79).

    status 'fail'  -> failed AND non-transient (data problem);
    status 'error' -> failed; non-transient unless the message
    matches the allowlist. Node id lists are sorted so the output is
    deterministic under distributed aggregation.
    """
    is_failed = F.col("status").isin("fail", "error")
    is_nontransient = (F.col("status") == "fail") | (
        (F.col("status") == "error") & ~is_transient_message(F.col("message"))
    )
    return results.groupBy(run_col).agg(
        F.count(F.lit(1)).alias("n_results"),
        F.sum(is_failed.cast("int")).cast("bigint").alias("failed_count"),
        F.sum(is_nontransient.cast("int")).cast("bigint").alias("nontransient_count"),
        F.array_sort(F.collect_list(F.when(is_failed, F.col("unique_id")))).alias(
            "failed_nodes"
        ),
        F.array_sort(
            F.collect_list(F.when(is_nontransient, F.col("unique_id")))
        ).alias("nontransient_nodes"),
    )


def tally_failed_steps(steps: DataFrame, run_col: str = "run_id") -> DataFrame:
    """Per-run count of errored steps (count_failed_steps,
    classifier.py:50-53)."""
    return steps.groupBy(run_col).agg(
        F.sum((F.col("status") == STEP_STATUS_ERROR).cast("int"))
        .cast("bigint")
        .alias("failed_step_count")
    )


def classify_runs(
    runs: DataFrame,
    steps: DataFrame | None = None,
    results: DataFrame | None = None,
    run_col: str = "run_id",
) -> DataFrame:
    """The decision tree (decide, classifier.py:98-136) over a whole
    run table at once.

    `runs` columns: run_id, cause (trigger cause string, NULL ok),
    created_at, metadata_available (bool), results_fetch_failed
    (bool). `steps`: run_id, status. `results`: run_id, unique_id,
    status, message.

    Verdict per run: reason, is_retryable, prior_is_retry,
    failed_count, nontransient_count, failed_nodes,
    nontransient_nodes, failed_step_count, run_created_at — the
    reference's verdict dict as columns, with each early-exit branch
    zeroing the fields the reference's _verdict() defaults.
    """
    joined = runs
    if steps is not None:
        joined = joined.join(tally_failed_steps(steps, run_col), run_col, "left")
    else:
        joined = joined.withColumn("failed_step_count", F.lit(0).cast("bigint"))
    if results is not None:
        joined = joined.join(tally_node_results(results, run_col), run_col, "left")
    else:
        joined = joined.withColumn("n_results", F.lit(0).cast("bigint"))
        for c in ("failed_count", "nontransient_count"):
            joined = joined.withColumn(c, F.lit(0).cast("bigint"))
        for c in ("failed_nodes", "nontransient_nodes"):
            joined = joined.withColumn(c, F.array().cast("array<string>"))

    no_meta = ~F.coalesce(F.col("metadata_available"), F.lit(True))
    already = F.coalesce(F.col("cause"), F.lit("")).rlike(AUTO_RETRY_PATTERN)
    fetch_failed = F.coalesce(F.col("results_fetch_failed"), F.lit(False))
    n_results = F.coalesce(F.col("n_results"), F.lit(0))
    failed = F.coalesce(F.col("failed_count"), F.lit(0))
    nontrans = F.coalesce(F.col("nontransient_count"), F.lit(0))
    steps_failed = F.coalesce(F.col("failed_step_count"), F.lit(0))

    reason = (
        F.when(no_meta, F.lit("metadata_unavailable"))
        .when(already, F.lit("already_retried"))
        .when(fetch_failed, F.lit("results_unavailable"))
        .when(n_results == 0, F.lit("no_results"))
        .when((steps_failed > 0) & (failed == 0), F.lit("uncovered_step"))
        .when((failed > 0) & (nontrans == 0), F.lit("transient"))
        .otherwise(F.lit("nontransient"))
    )
    # Which verdict fields each branch exposes (mirrors _verdict()
    # call sites: early exits zero the scan tallies).
    scan_visible = reason.isin("uncovered_step", "transient", "nontransient")
    steps_visible = ~reason.isin("metadata_unavailable", "already_retried")
    empty = F.array().cast("array<string>")

    return joined.select(
        F.col(run_col),
        reason.alias("reason"),
        (reason == "transient").alias("is_retryable"),
        (reason == "already_retried").alias("prior_is_retry"),
        F.when(scan_visible, failed).otherwise(F.lit(0)).cast("bigint").alias("failed_count"),
        F.when(scan_visible, nontrans)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("nontransient_count"),
        F.when(scan_visible, F.coalesce(F.col("failed_nodes"), empty))
        .otherwise(empty)
        .alias("failed_nodes"),
        F.when(scan_visible, F.coalesce(F.col("nontransient_nodes"), empty))
        .otherwise(empty)
        .alias("nontransient_nodes"),
        F.when(steps_visible, steps_failed)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("failed_step_count"),
        F.when(no_meta, F.lit("")).otherwise(
            F.coalesce(F.col("created_at").cast("string"), F.lit(""))
        ).alias("run_created_at"),
    )


# --- webhook routing (dbt-webhook/main.py) ---------------------------------

WEBHOOK_SCHEMA = (
    "eventType STRING, webhookId STRING, timestamp STRING, "
    "data STRUCT<jobId: STRING, runId: STRING, runStatus: STRING, "
    "runStatusCode: INT, environmentId: STRING, cause: STRING>"
)


def parse_webhook(df: DataFrame, body_col: str = "body") -> DataFrame:
    """camelCase JSON payload -> typed flat record
    (parse_dbt_webhook, webhook_utils.py:63-99): from_json + nested
    field extraction, all codegen'd."""
    parsed = df.withColumn("_p", F.from_json(F.col(body_col), WEBHOOK_SCHEMA))
    return parsed.select(
        *[c for c in df.columns if c != body_col],
        F.col("_p.eventType").alias("event_type"),
        F.col("_p.webhookId").alias("webhook_id"),
        F.col("_p.data.jobId").alias("job_id"),
        F.col("_p.data.runId").alias("run_id"),
        F.col("_p.data.runStatus").alias("run_status"),
        F.col("_p.data.runStatusCode").alias("run_status_code"),
        F.col("_p.data.environmentId").alias("environment_id"),
        F.col("_p.data.cause").alias("cause"),
    )


def gate_completed(df: DataFrame, event_type_col: str = "event_type") -> DataFrame:
    """Event-type gate (P4, dbt-webhook/main.py:298-303): only
    job.run.completed events continue."""
    return df.filter(F.col(event_type_col) == "job.run.completed")


def route_status(
    status_code: Column | None = None,
    status: Column | None = None,
) -> Column:
    """Status routing predicate (P5, dbt-webhook/main.py:307-319):
    code 20 / 'Error' -> retry; code 10 / 'Success' -> completed;
    anything else (cancelled, running...) -> ignore."""
    code = status_code if status_code is not None else F.lit(None).cast("int")
    text = status if status is not None else F.lit(None).cast("string")
    return (
        F.when((code == 20) | (text == "Error"), F.lit("retry"))
        .when((code == 10) | (text == "Success"), F.lit("completed"))
        .otherwise(F.lit("ignore"))
    )
