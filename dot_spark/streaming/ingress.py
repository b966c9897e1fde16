"""Streaming ingress: the events table as a file-source stream.

Reference S12: webhook HTTP ingress (dbt-webhook/main.py:253-323)
pushes events one POST at a time. The Spark-first analog is a
streaming source where each micro-batch is a set of event rows; the
harness drives it from the events parquet (a real deployment would
use Kafka/Kinesis with the same downstream plan).

Scale: the file source lists and checkpoints input files; state
(watermarks, dedup sets, per-key machines) is bounded by watermark
eviction, not input size — the knob that keeps 100 TB/day of events
from accumulating unbounded executor state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# events.parquet stores TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong=true (session.py) it reads as
# a bigint nanosecond epoch, declared here and converted below.
EVENTS_READ_DDL = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a streaming DataFrame with a proper
    microsecond TimestampType ts (same conversion as the batch
    registry, sources/registry.py)."""
    # the file source requires a directory: scan sf_dir with a glob
    # pinned to the events file
    raw = (
        spark.readStream.schema(EVENTS_READ_DDL)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


DOCUMENTS_READ_DDL = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a streaming DataFrame — the ingest-side
    view of a continuously arriving corpus (each new parquet drop is
    a micro-batch)."""
    return (
        spark.readStream.schema(DOCUMENTS_READ_DDL)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
