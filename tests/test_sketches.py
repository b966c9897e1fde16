"""Sketch operators (beyond-reference): the approximate forms of the
exact aggregations in the query inventory, with accuracy gates
against their exact twins. These are the 100 TB substitutions the
operator docstrings point to (a8 -> approx_count_distinct,
a7 -> approx_percentile); the sketches are probabilistic, so they
live here as accuracy-gated tests rather than hash-matched oracle
queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dot_spark.sources.registry import load_table


def test_hll_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    both = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert abs(r.approx - r.exact) <= max(3, 0.15 * r.exact), r


def test_approx_percentile_brackets_exact(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    row = li.agg(
        F.expr("percentile(l_quantity, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_quantity, 0.5, 1000)").alias("approx"),
    ).collect()[0]
    # high-accuracy sketch on a small domain: within one unit
    assert abs(row.approx - row.exact) <= 1.0, row


def test_hll_sketches_merge_losslessly(spark, sf_dir):
    """The 100 TB distinct-count rollup: an HLL sketch COLUMN per
    partition tier, merged upward with hll_union_agg — the estimate
    from merged per-type sketches equals the estimate from one global
    sketch (DataSketches HLL merge is exact over sketch state)."""
    ev = load_table(spark, "events", sf_dir)
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    assert merged == direct
    exact = ev.select("user_id").distinct().count()
    assert abs(direct - exact) <= max(3, 0.05 * exact)


def test_kll_quantile_sketch_tracks_exact(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    row = li.agg(
        F.expr("percentile(l_quantity, 0.5)").alias("exact"),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("l_quantity"), F.lit(0.5)
        ).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 2.0, row


def test_theta_sketch_distinct_estimate(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    est = ev.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("e")
    ).collect()[0].e
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) <= max(3, 0.05 * exact)


def test_countmin_audit_overestimates_only_and_nails_heavy_hitters(spark, sf_dir):
    """Count-min law: the sketch NEVER underestimates (est >= exact
    for every audited token), and the audit's verdict column must
    agree with the 2N/w bound recomputed from the emitted
    columns."""
    from dot_spark.queries import QUERIES

    rows = QUERIES["a29_countmin_audit"](spark, str(sf_dir)).collect()
    assert rows, "audit returned nothing"
    # recompute N from the corpus for the bound check
    from dot_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", str(sf_dir))
    n = (
        docs.select(
            F.explode(
                F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
            ).alias("tok")
        )
        .filter(F.col("tok") != "")
        .count()
    )
    for r in rows:
        assert r["est"] >= r["exact"], r
        assert r["overcount"] == r["est"] - r["exact"], r
        assert r["within_bound"] == (r["overcount"] * 256 <= 2 * n), r
