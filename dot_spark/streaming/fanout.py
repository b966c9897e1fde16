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
