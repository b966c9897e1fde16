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

from dot_spark.sources.registry import ensure_session_confs, events_ts_dispatch

# A stream must declare its schema up front, so stream_events sniffs
# the file's physical ts dtype with a one-file batch read (metadata
# only — no data scan) and declares the matching read schema. The
# dtype -> (declared type, normalizing expression) decision itself
# lives in ONE place — sources/registry.py:events_ts_dispatch —
# shared with the batch registry, so a new physical format can never
# again be fixed on one boundary and missed on the other (the r4/r5
# defect).
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
    declared, fix = events_ts_dispatch(raw_ts_type)
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
    spark: SparkSession,
    corpus_dir: str,
    schema: str = DOCUMENTS_READ_DDL,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """A JSONL corpus directory as a streaming DataFrame: each new
    .jsonl[.gz] drop is a micro-batch — the ingest-side twin of
    Warehouse.write_jsonl (loads.py). Schema is REQUIRED (contract
    files; streaming sources cannot infer anyway), and compression is
    sniffed per file from the extension, so mixed plain/gzip
    directories stream fine. At scale this is the continuous-ingest
    front door: downstream dedup (pl4) and quality filters consume
    micro-batches while the file source checkpoint tracks what has
    been absorbed.

    ``max_files_per_trigger`` bounds each micro-batch to that many
    input files — the backpressure knob for catching up on a backlog
    (a restart against 10k accumulated drops must not absorb them as
    ONE giant batch whose state/shuffle exceeds what the cluster was
    sized for; bounded triggers drain the backlog incrementally at
    the provisioned rate)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(corpus_dir)


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Stream-static dimension enrichment: join a streaming frame to
    a small static dim with an explicit broadcast, so every
    micro-batch probes the dim map-side — the stream never shuffles
    for the join, and no streaming state accumulates (stream-static
    joins are stateless by definition; only stream-stream joins hold
    state). NOTE on dim refreshes: a plain-parquet static frame
    caches its file listing at read time, so an in-place rewrite of
    the dim directory is NOT picked up by a running query (and a
    promote's file swap can fail it with FileNotFound) — live dim
    refresh needs a catalog/ACID table format (Delta/Iceberg) on the
    static side, or a query restart. At a dim too big to broadcast,
    pre-bucket both sides on the key instead."""
    return stream.join(F.broadcast(dim), on=on, how=how)


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
