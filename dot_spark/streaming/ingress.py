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

from dot_spark.sources.registry import ensure_session_confs

# The harness has shipped events.ts in two physical formats (same
# contract as the batch registry, sources/registry.py:load_table):
#   - TIMESTAMP(NANOS): readable only as a bigint nanosecond epoch
#     via spark.sql.legacy.parquet.nanosAsLong
#   - naive-micros TIMESTAMP(isAdjustedToUTC=false): reads as
#     TIMESTAMP_NTZ
# A stream must declare its schema up front, so we sniff the physical
# dtype with a one-file batch read (metadata only — no data scan) and
# declare the matching read schema, normalizing to session-UTC
# TimestampType either way so every downstream operator sees one
# contract.
EVENTS_READ_DDL_TEMPLATE = (
    "event_id BIGINT, ts {ts_type}, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a streaming DataFrame with a proper
    microsecond TimestampType ts — value-identical to the batch
    registry's load_table(spark, "events") over the same files."""
    ensure_session_confs(spark)
    path = f"{sf_dir}/events.parquet"
    raw_ts_type = dict(spark.read.parquet(path).dtypes).get("ts")
    if raw_ts_type == "bigint":  # legacy nanos-as-long files
        declared, fix = "BIGINT", F.timestamp_micros(F.expr("ts div 1000"))
    elif raw_ts_type == "timestamp_ntz":  # naive-micros files
        # session tz is UTC, so this cast reinterprets the naive
        # wall-clock as UTC — value-identical to the DuckDB oracle
        declared, fix = "TIMESTAMP_NTZ", F.col("ts").cast("timestamp")
    else:  # already a UTC-adjusted timestamp
        declared, fix = "TIMESTAMP", F.col("ts")
    # the file source requires a directory: scan sf_dir with a glob
    # pinned to the events file
    raw = (
        spark.readStream.schema(EVENTS_READ_DDL_TEMPLATE.format(ts_type=declared))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", fix)


DOCUMENTS_READ_DDL = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def stream_jsonl_corpus(
    spark: SparkSession, corpus_dir: str, schema: str = DOCUMENTS_READ_DDL
) -> DataFrame:
    """A JSONL corpus directory as a streaming DataFrame: each new
    .jsonl[.gz] drop is a micro-batch — the ingest-side twin of
    Warehouse.write_jsonl (loads.py). Schema is REQUIRED (contract
    files; streaming sources cannot infer anyway), and compression is
    sniffed per file from the extension, so mixed plain/gzip
    directories stream fine. At scale this is the continuous-ingest
    front door: downstream dedup (pl4) and quality filters consume
    micro-batches while the file source checkpoint tracks what has
    been absorbed."""
    return spark.readStream.schema(schema).json(corpus_dir)


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
