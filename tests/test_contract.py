"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

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
        "          'mm1_decode_media', 's9_csv_checkpoint', 'st3_stream_corpus_dedup',\n"
        "          's13_jsonl_roundtrip', 'dd8_dedup_clusters'):\n"
        "    assert len(QUERIES[n](spark, '/root/testdata/sf0.001').collect()) >= 0, n\n"
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
    the round-6 staleness rotation: the two streaming fixes under
    proof (st1/st2) plus every query whose newest official row
    predates the r4 testdata regeneration (all 34 r1-stale, the 14
    oracle-twinned r2-stale) — an accidental registration reorder
    silently drops operators out of the official artifact."""
    window = list(QUERIES)[:50]
    must_have = {
        # fixed this round (streaming ingress ts dispatch)
        "st1_windowed_agg", "st2_superseded_stream",
        # newest official row r01
        "a2_watermark_max", "a3_conditional_agg", "a4_count_predicate",
        "a5_collect_sorted_list", "a6_rollup_subtotals",
        "a7_distribution_stats", "a8_count_distinct", "a10_string_agg_ordered",
        "f1_regex_match", "f2_ts_format", "f3_epoch_seconds",
        "f4_decimal_negate", "f5_string_ops",
        "j2_union_distinct", "j3_union_all", "j4_broadcast_lookup",
        "j6_salted_skew_join", "j10_intersect_except", "j11_null_safe_join",
        "j12_exists_semi_join",
        "n1_struct_extract", "n3_kv_pivot", "n4_element_first_last",
        "n6_json_stringify",
        "p2_positional_projection", "p4_filter_gate", "p5_status_route",
        "p6_isin_filter", "p8_coalesce_defaults", "p9_string_norm",
        "s6_sql_source",
        "w2_distinct_rows", "w3_sort_limit_top1", "w5_rank_lattice",
        # newest official row r02, oracle-twinned
        "dd4_ngram_jaccard",
        "f6_hour_gate", "f7_flag_coerce", "f9_json_access",
        "f10_try_cast_coerce",
        "mm3_frame_sampling",
        "pl2_woo_incremental", "pl2b_woo_incremental_by_store",
        "s9_csv_checkpoint", "s10_object_store_export",
        "t3_language_id", "t4_fingerprint", "t5_length_histogram",
        "t6_sequence_packing",
    }
    assert must_have <= set(window), sorted(must_have - set(window))
    assert len(must_have) == 50
