"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from dot_spark.queries import ORACLE, QUERIES


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    df.limit(5).collect()  # force execution of a sample


def test_queries_survive_bare_driver_session(tmp_path):
    """The harness may run queries() on a SparkSession it built
    itself — none of get_spark's configs present. load_table's
    ensure_session_confs must make the risky surfaces (TIMESTAMP
    NANOS events, Python-source pushdown, Arrow UDFs) work anyway.
    Subprocess: one JVM per process."""
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[4]').getOrCreate()\n"
        "from dot_spark.queries import QUERIES\n"
        "for n in ('a2_watermark_max', 's2_paged_rest_scan', 'f8_hmac_sha256',\n"
        "          'mm1_decode_media', 's9_csv_checkpoint', 'st3_stream_corpus_dedup'):\n"
        "    assert len(QUERIES[n](spark, '/root/testdata/sf0.001').collect()) >= 0, n\n"
        "print('BARE_SESSION_OK')\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "BARE_SESSION_OK" in out.stdout, out.stderr[-2000:]


def test_all_query_outputs_are_scalar_typed(spark, sf_dir):
    """The driver's canonicalizer lexsorts every output column in
    pandas; ndarray/list/dict cells raise `unhashable type` and fail
    the official gate (the r2 c1/mm2 defect). No queries() output —
    oracle-twinned OR rows-only — may carry ArrayType / MapType /
    StructType; serialize to scalars in the final projection."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in QUERIES.items():
        complex_cols = [
            f.name
            for f in fn(spark, sf_dir).schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed query outputs: {bad}"


def test_correctness_window_composition():
    """The driver's gate checks the FIRST 50 queries() entries. Pin
    the round-3 window: every query with no official driver row yet
    (added after the r2 window was pinned), every query fixed or
    changed this round, the new st4/st7 queries, plus one
    representative per proven §2 family — an accidental registration
    reorder silently drops operators out of the official artifact."""
    window = list(QUERIES)[:50]
    must_have = {
        # never officially driver-tested before round 3
        "a11_group_percentiles", "c3_quality_filter", "dd5b_bucketed_neardup",
        "dd6_decontamination", "dd7_embedding_decontamination",
        "p10_deterministic_sample", "p11_stratified_sample",
        "pl4_corpus_ingest_dedup", "s11_attributed_publish",
        "st3_stream_corpus_dedup", "t7_repetition_ratio", "t8_pii_scrub",
        "t9_tfidf_topterms", "t10_doc_chunking", "w6_sessionize",
        # fixed/changed in round 3
        "c1_classify_runs", "mm2_media_features", "mm1_decode_media",
        "pl3_event_retry_pipeline",
        # new in round 3
        "st4_attribute_fanout", "st7_drain_machine",
        # one per proven §2 family
        "s1_scan_projection", "s2_paged_rest_scan", "s4_csv_parse",
        "p1_schema_align", "p7_sentinel_null",
        "j1_anti_join", "j5_parent_child_join", "j7_star_join_rollup",
        "j8_asof_join", "j9_range_join",
        "a1_group_having", "a9_hypertable_rollup",
        "w1_dedup_keep_latest", "w4_superseded_dedup",
        "n2_explode_tokens", "n5_sticky_carry",
        "dd1_exact_dedup", "dd2_minhash_lsh_candidates", "dd3_simhash",
        "dd4b_ngram_jaccard_capped", "dd5_embedding_neardup",
        "ss1_cosine_topk", "ss2_ivf_topk",
        "t1_token_stats", "t2_quality_score",
        "c2_webhook_route",
        "st1_windowed_agg", "st2_superseded_stream",
        "pl1_okta_refresh",
    }
    assert must_have <= set(window), sorted(must_have - set(window))
