"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from dot_spark.queries import ORACLE, QUERIES


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_events_ts_contract_canary(spark, sf_dir):
    """Testdata-contract canary (the r4 lesson: the harness regenerated
    events.parquet with a new physical ts format and every downstream
    timestamp silently landed in 1970). Post-registry, events.ts must
    be a session-UTC TIMESTAMP with values inside the fixture's era,
    for BOTH the batch and the streaming source boundary."""
    from dot_spark.sources.registry import load_table
    from dot_spark.streaming import stream_events

    ev = load_table(spark, "events", sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    lo, hi = ev.selectExpr("MIN(ts)", "MAX(ts)").first()
    assert 2000 <= lo.year <= 2100, f"batch min(ts)={lo}: 1970-collapse or garbage"
    assert 2000 <= hi.year <= 2100, f"batch max(ts)={hi}"
    assert dict(stream_events(spark, sf_dir).dtypes)["ts"] == "timestamp"


def test_events_ts_dispatch_rejects_unknown_physical_format():
    """A THIRD physical ts dtype (string, INT96 regeneration, ...)
    must fail loudly at the shared dispatch point, not pass through
    as 'already UTC' — the silent-wrong-data mode of r4/r5 (r6
    advisor finding)."""
    from dot_spark.sources.registry import events_ts_dispatch

    # the three known formats dispatch
    for known in ("bigint", "timestamp_ntz", "timestamp"):
        events_ts_dispatch(known)
    for unknown in ("string", "date", "int", None):
        with pytest.raises(RuntimeError, match="not a known"):
            events_ts_dispatch(unknown)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_at_sf0001(registry_dfs, name):
    # DataFrame construction is shared via the session-scoped
    # registry_dfs fixture (one build instead of one per sweep test —
    # see conftest); this test adds the per-query execution sample.
    df = registry_dfs[name]
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
        "from concurrent.futures import ThreadPoolExecutor\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[4]').getOrCreate()\n"
        "from dot_spark.queries import QUERIES\n"
        "names = ('a2_watermark_max', 's2_paged_rest_scan', 'f8_hmac_sha256',\n"
        "          'mm1_decode_media', 's9_csv_checkpoint', 'st3_stream_corpus_dedup',\n"
        "          's13_jsonl_roundtrip', 'dd8_dedup_clusters',\n"
        "          'ss3_ivf_trained_topk', 'dd9_chunk_dedup',\n"
        "          'pl7_corpus_build_pipeline',\n"
        # round-7 continuation surfaces: native session windows +
        # events ts dispatch (st8), sequence explode on events (a14),
        # warehouse merge writes (pl8), iterative localCheckpoint
        # loops (t13, pl9), Arrow mapInPandas resize (mm4)
        "          'st8_session_window', 'a14_gapfill_locf',\n"
        "          'pl8_merge_upsert', 't13_bpe_merges',\n"
        "          'pl9_semdedup', 'mm4_image_resize',\n"
        # second continuation surfaces: iterative persist/checkpoint
        # loop (g1), events ts dispatch through a window (a21),
        # train-then-encode with the driver-side merge artifact (t17),
        # XML codegen round-trip (n11)
        "          'g1_pagerank', 'a21_cumulative_distinct',\n"
        "          't17_bpe_encode', 'n11_xml_roundtrip',\n"
        # session-4 surfaces: foreachBatch + TxTable commit loop +
        # JSONL drops + epoch-micros round-trip (pl14), eager extent
        # collect + bucketed rank windows (p20), chunk-boundary array
        # HOF chain (dd16)
        "          'pl14_streaming_mv', 'p20_zorder_layout',\n"
        "          'dd16_cdc_chunks')\n"
        # 4 concurrent query runs (guide section 2.6: independent
        # jobs overlap; each query writes only its own artifacts) —
        # the sequential loop was the suite's single slowest test
        "def _run(n):\n"
        "    assert len(QUERIES[n](spark, '/root/testdata/sf0.001').collect()) >= 0, n\n"
        "    return n\n"
        "with ThreadPoolExecutor(max_workers=4) as pool:\n"
        "    assert sorted(pool.map(_run, names)) == sorted(names)\n"
        "print('BARE_SESSION_OK')\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "BARE_SESSION_OK" in out.stdout, out.stderr[-2000:]


def test_bench_isolates_per_query_failures(spark, sf_dir, monkeypatch, capsys):
    """One broken query must cost its own {"err": ...} row, never the
    whole bench artifact (round 4 lost its entire perf record to a
    single crashing query)."""
    import json

    import bench

    def boom(spark, sf_dir):
        raise RuntimeError("synthetic bench failure")

    monkeypatch.setattr(bench, "HEADLINE", ["s1_scan_projection", "zz_broken"])
    monkeypatch.setattr(
        bench, "QUERIES", {**bench.QUERIES, "zz_broken": boom}
    )
    monkeypatch.setenv("DOT_SPARK_BENCH_ROUNDS", "1")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_errors"] == 1
    assert "synthetic bench failure" in out["queries"]["zz_broken"]["err"]
    assert isinstance(out["queries"]["s1_scan_projection"], float)
    assert out["value"] > 0


def test_all_query_outputs_are_scalar_typed(registry_dfs):
    """The driver's canonicalizer lexsorts every output column in
    pandas; ndarray/list/dict cells raise `unhashable type` and fail
    the official gate (the r2 c1/mm2 defect). No queries() output —
    oracle-twinned OR rows-only — may carry ArrayType / MapType /
    StructType; serialize to scalars in the final projection."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, df in registry_dfs.items():
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed query outputs: {bad}"


def test_correctness_window_composition():
    """The driver's gate checks the FIRST 50 queries() entries. Pin
    the round-15 rotation BY NAME, independently of the
    _WINDOW_PRIORITY constant (tests/test_gate_window.py asserts the
    registry leads with that constant; this hand-written set catches
    an accidental edit of the constant itself): the staged r14
    backfill executed with the four verdict-directed swaps — the 42
    bound-critical r10-stale rows + the 4 rewritten-in-r14 re-gates
    (n13/mm1/mm2/mm3, displacing c1/dd1/mm12/mm13 to r16 staging) +
    the 4 new-or-changed-in-r14 JPEG-path entries first-gated here."""
    window = list(QUERIES)[:50]
    must_have = {
        # r10-stale (42)
        "a3_conditional_agg",
        "a4_count_predicate",
        "a5_collect_sorted_list",
        "a6_rollup_subtotals",
        "a7_distribution_stats",
        "a8_count_distinct",
        "a9_hypertable_rollup",
        "dd16_cdc_chunks",
        "dd17_bloom_history_dedup",
        "dd4_ngram_jaccard",
        "f10_try_cast_coerce",
        "f1_regex_match",
        "f2_ts_format",
        "f3_epoch_seconds",
        "f4_decimal_negate",
        "f5_string_ops",
        "f6_hour_gate",
        "f7_flag_coerce",
        "f9_json_access",
        "g5_label_propagation",
        "j10_intersect_except",
        "j11_null_safe_join",
        "j12_exists_semi_join",
        "j4_broadcast_lookup",
        "j6_salted_skew_join",
        "j9_range_join",
        "mm8_silence_segments",
        "n12_woo_flat_orders",
        "n15_woo_flat_refunds",
        "n16_woo_flat_refund_items",
        "n17_woo_flat_product_attributes",
        "pl13_incremental_mv",
        "pl14_streaming_mv",
        "pl15_incremental_zorder",
        "pl16_incremental_ivf",
        "pl4_corpus_ingest_dedup",
        "s11_attributed_publish",
        "s20_manifest_skipping",
        "s21_fixed_width_source",
        "ss10_rrf_fusion",
        "t23_bigram_lm_score",
        "w15_drawdown",
        # rewritten-in-r14 re-gates (4, verdict-directed swaps)
        "n13_woo_flat_order_items",
        "mm1_decode_media",
        "mm2_media_features",
        "mm3_frame_sampling",
        # new or changed in round 14, first-gated in round 15 (4)
        "mm9_progressive_jpeg_audit",
        "mm11_jpeg_progressive_pixels",
        "dd20_self_repetition_spans",
        "mm14_jpeg_cmyk_pixels",
    }
    assert must_have <= set(window), sorted(must_have - set(window))
    assert len(must_have) == 50


def test_survey_generated_inventory_matches_registry():
    """SURVEY.md §2.12 (the generated registry inventory) must list
    exactly the registered query names — a query added or removed
    without rerunning tools/survey_inventory.py fails here. Line
    numbers in the table may go stale between regenerations; names
    may not."""
    import re

    with open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")) as f:
        text = f.read()
    begin = "<!-- BEGIN GENERATED REGISTRY INVENTORY"
    assert begin in text, "SURVEY.md §2.12 missing — run tools/survey_inventory.py"
    section = text.split(begin, 1)[1].split("<!-- END", 1)[0]
    names_in_doc = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))
    assert names_in_doc == set(QUERIES), (
        "SURVEY.md §2.12 is stale — run: python tools/survey_inventory.py "
        f"(doc-only: {sorted(names_in_doc - set(QUERIES))[:5]}, "
        f"registry-only: {sorted(set(QUERIES) - names_in_doc)[:5]})"
    )
