"""Structured Streaming surface (reference §2.8 ST1-ST7).

The reference's event path is push-based Cloud Functions + Pub/Sub
topics (docs/ARCHITECTURE.md:3-35, 240-249). Here the same semantics
are Structured Streaming queries: a webhook topic is a streaming
DataFrame, message attributes are columns, filtered consumers are
filtered writeStream queries, and the stateful orchestration
machines live in applyInPandasWithState.
"""

from dot_spark.streaming.ingress import (
    EVENTS_READ_DDL_TEMPLATE,
    enrich_stream,
    stream_events,
    stream_jsonl_corpus,
)
from dot_spark.streaming.fanout import fan_out, route_events
from dot_spark.streaming.state import (
    delayed_retries,
    delayed_retries_batch,
    drain_actions,
    stream_dedup,
    superseded_latest,
    session_counts,
    stream_stream_join,
    windowed_counts,
)

__all__ = [
    "EVENTS_READ_DDL_TEMPLATE",
    "enrich_stream",
    "stream_events",
    "stream_jsonl_corpus",
    "fan_out",
    "route_events",
    "delayed_retries",
    "delayed_retries_batch",
    "drain_actions",
    "stream_dedup",
    "superseded_latest",
    "session_counts",
    "stream_stream_join",
    "windowed_counts",
]
