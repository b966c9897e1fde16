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


def test_correctness_window_composition():
    """The driver's gate checks the FIRST 50 queries() entries. Pin
    the round-2 window: every LLM-pipeline / streaming / pipeline /
    multimodal / f6-f10 query plus one representative per round-1-
    proven family must be inside it — an accidental registration
    reorder silently drops operators out of the official artifact."""
    window = list(QUERIES)[:50]
    must_have = {
        # round-1 unchecked rotation targets
        "f6_hour_gate", "f7_flag_coerce", "f8_hmac_sha256", "f9_json_access",
        "f10_try_cast_coerce",
        "t1_token_stats", "t2_quality_score", "t3_language_id", "t4_fingerprint",
        "t5_length_histogram", "t6_sequence_packing",
        "dd1_exact_dedup", "dd2_minhash_lsh_candidates", "dd3_simhash",
        "dd4_ngram_jaccard", "dd4b_ngram_jaccard_capped", "dd5_embedding_neardup",
        "ss1_cosine_topk", "ss2_ivf_topk", "ss3_ivf_trained_topk", "ss4_lsh_topk",
        "c1_classify_runs", "c2_webhook_route",
        "st1_windowed_agg", "st2_superseded_stream",
        "pl1_okta_refresh", "pl2_woo_incremental", "pl3_event_retry_pipeline",
        "mm1_decode_media", "mm2_media_features", "mm3_frame_sampling",
        # round-2 additions
        "pl2b_woo_incremental_by_store", "s9_csv_checkpoint",
        "s10_object_store_export",
        # one per proven §2 family
        "s1_scan_projection", "s2_paged_rest_scan", "s4_csv_parse",
        "p1_schema_align", "p7_sentinel_null",
        "j1_anti_join", "j5_parent_child_join", "j7_star_join_rollup",
        "j8_asof_join", "j9_range_join",
        "a1_group_having", "a9_hypertable_rollup",
        "w1_dedup_keep_latest", "w4_superseded_dedup",
        "n2_explode_tokens", "n5_sticky_carry",
    }
    assert must_have <= set(window), sorted(must_have - set(window))
