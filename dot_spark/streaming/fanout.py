"""Attribute-filtered fan-out: one input stream, many filtered
consumers (reference ST1/ST4).

Reference: dbt-webhook publishes one completion event with
attributes (job_id, run_status, environment_id); several Pub/Sub
subscriptions filter on those attributes (dbt-webhook/main.py:10-16,
155-161; docs/ARCHITECTURE.md:240-249). Spark-first: the attribute
is a column, each consumer is a filtered writeStream query over the
same input — Spark shares the source scan per query and each sink
checkpoints independently, which is exactly the at-least-once,
independent-consumer contract of a topic fan-out.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dot_spark.routing import route_status


def route_events(events: DataFrame) -> DataFrame:
    """Stamp the routing attribute (P5 as a stream): error events ->
    retry, purchase -> completed, rest -> ignore — the dbt-webhook
    status routing (main.py:307-319) with event_type standing in for
    run_status_code."""
    code = F.when(F.col("event_type") == "error", 20).when(
        F.col("event_type") == "purchase", 10
    )
    return events.withColumn("route", route_status(code))


def fan_out(
    routed: DataFrame,
    routes: Mapping[str, Column],
    checkpoint_root: str,
    name_prefix: str = "fanout",
) -> dict[str, StreamingQuery]:
    """Start one memory-sink query per route predicate over the same
    routed stream (ST4). Returns {route_name: query}; callers drive
    them with processAllAvailable() (tests) or leave them running.
    """
    queries: dict[str, StreamingQuery] = {}
    for name, predicate in routes.items():
        queries[name] = (
            routed.filter(predicate)
            .writeStream.format("memory")
            .queryName(f"{name_prefix}_{name}")
            .option("checkpointLocation", f"{checkpoint_root}/{name}")
            .outputMode("append")
            .start()
        )
    return queries


# --- S11: attributed message sink ------------------------------------------


def to_envelope(
    df: DataFrame,
    topic: str,
    attr_cols: Mapping[str, str] | list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Build the attributed message envelope (S11: Pub/Sub publish of
    a JSON-encoded dict with per-message attributes —
    okta-sync/main.py:198-207, dbt-webhook/main.py:151-162):
    (topic, attributes MAP<STRING,STRING>, payload JSON).

    Attributes are string-cast columns (Pub/Sub attributes are
    strings); payload is to_json over the selected columns in
    declaration order. Works identically on batch and streaming
    frames — all column expressions, no shuffle."""
    if not isinstance(attr_cols, Mapping):
        attr_cols = {c: c for c in attr_cols}
    payload_cols = payload_cols or df.columns
    return df.select(
        F.lit(topic).alias("topic"),
        F.map_from_arrays(
            F.array(*[F.lit(name) for name in attr_cols]),
            F.array(*[F.col(src).cast("string") for src in attr_cols.values()]),
        ).alias("attributes"),
        F.to_json(F.struct(*payload_cols)).alias("payload"),
    )


def publish_batch(df: DataFrame, topic: str, broker_root: str, **envelope_kw) -> None:
    """Attributed publish, batch form: append envelope rows to the
    topic's directory under the broker stand-in root. Swapping the
    body for `.format("kafka")` (or a foreachPartition Pub/Sub
    client) changes nothing upstream — the envelope IS the contract."""
    to_envelope(df, topic, **envelope_kw).write.mode("append").parquet(
        f"{broker_root}/{topic}"
    )


def publish_stream(
    df: DataFrame, topic: str, broker_root: str, checkpoint: str, **envelope_kw
) -> StreamingQuery:
    """Attributed publish, streaming form: at-least-once append of
    envelope rows per micro-batch with an independent checkpoint —
    the delivery contract of the reference's topic publish."""
    return (
        to_envelope(df, topic, **envelope_kw)
        .writeStream.format("parquet")
        .option("path", f"{broker_root}/{topic}")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def subscribe_batch(
    spark, topic: str, broker_root: str, attr_filter: Mapping[str, str] | None = None
) -> DataFrame:
    """Subscriber view of a topic with attribute filtering — the
    Spark analog of a filtered Pub/Sub subscription
    (dbt-webhook/main.py:10-16): map-access predicates on the
    attributes column, pushed to the envelope scan."""
    out = spark.read.parquet(f"{broker_root}/{topic}")
    for k, v in (attr_filter or {}).items():
        out = out.filter(F.col("attributes").getItem(k) == v)
    return out
