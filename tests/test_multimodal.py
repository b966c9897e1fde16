"""Multimodal plumbing tests: schema, determinism, Arrow batch
shape, fan-out — the parts that must be real even while the codec is
a stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dot_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)
from dot_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return synthesize_media(docs).cache()


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["media_id"] == "bigint"
    assert "struct" in fields["meta"]
    kinds = {r.kind for r in media.select(F.col("meta.kind").alias("kind")).distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_runs_and_is_deterministic(media):
    a = {r.media_id: (r.width, r.height, r.n_bytes, r.ok) for r in decode_media(media).collect()}
    b = {r.media_id: (r.width, r.height, r.n_bytes, r.ok) for r in decode_media(media).collect()}
    assert a == b and len(a) == media.count()
    assert all(v[3] for v in a.values())
    # payloads are sha256 digests -> 32 bytes each
    assert all(v[2] == 32 for v in a.values())


def test_decoder_column_records_stub_or_real(media):
    decs = {r.decoder for r in decode_media(media).select("decoder").distinct().collect()}
    assert decs <= {"stub", "pil"}


def test_features_shape_and_normalization(media):
    out = extract_features(media).collect()
    assert len(out) == media.count()
    for r in out[:10]:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-3  # L1-normalized histogram


def test_frame_sampling_fanout_video_only(media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    vids = {r.media_id for r in media.select("media_id", F.col("meta.kind").alias("k"))
            .filter(F.col("k") == "video").collect()}
    assert {r.media_id for r in rows} == vids
    # fan-out count matches duration // every_ms, frames are distinct
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, set()).add(r.frame_idx)
    durations = {r.media_id: r.d for r in media.select(
        "media_id", F.col("meta.duration_ms").alias("d")).collect()}
    for mid, idxs in by_id.items():
        assert idxs == set(range(max(1, durations[mid] // 1000)))


def test_metadata_only_query_prunes_payload(media, spark, tmp_path):
    """Filters on meta must not read the payload column: write to
    parquet and check the scan's ReadSchema excludes payload."""
    p = str(tmp_path / "media")
    media.write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("meta.kind") == "image").select(
        "media_id", "meta.width"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
