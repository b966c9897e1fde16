"""Laws of the weighted-sample / corpus-shuffle operators (p14/p15)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dot_spark.operators.sampling import (
    corpus_shuffle,
    weighted_hash_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_weighted_sample_extremes(spark):
    df = _docs(spark)
    assert weighted_hash_sample(df, "doc_id", F.lit(0.0)).count() == 0
    assert weighted_hash_sample(df, "doc_id", F.lit(1.0)).count() == 400


def test_weighted_sample_monotone_in_weight(spark):
    """A row kept at weight w stays kept at any w' >= w (the hash
    threshold is fixed per row), so corpora sampled at increasing
    rates nest."""
    df = _docs(spark)
    lo = {r["doc_id"] for r in weighted_hash_sample(df, "doc_id", F.lit(0.3)).collect()}
    hi = {r["doc_id"] for r in weighted_hash_sample(df, "doc_id", F.lit(0.7)).collect()}
    assert lo <= hi
    # and the rates are roughly proportional on a uniform hash
    assert 0.15 < len(lo) / 400 < 0.45
    assert 0.55 < len(hi) / 400 < 0.85


def test_weighted_sample_partition_invariant(spark):
    df = _docs(spark)
    w = F.lit(0.5)
    a = {r["doc_id"] for r in weighted_hash_sample(df, "doc_id", w).collect()}
    b = {
        r["doc_id"]
        for r in weighted_hash_sample(df.repartition(13), "doc_id", w).collect()
    }
    assert a == b


def test_corpus_shuffle_is_a_permutation(spark):
    out = corpus_shuffle(_docs(spark), "doc_id").collect()
    assert sorted(r["pos"] for r in out) == list(range(1, 401))


def test_corpus_shuffle_matches_global_md5_order(spark):
    """The distributed prefix-sum position equals the position a
    single global sort by (md5(key), key) would assign."""
    out = {r["doc_id"]: r["pos"] for r in corpus_shuffle(_docs(spark, 100), "doc_id").collect()}
    import hashlib

    expected = sorted(range(100), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    for pos, doc in enumerate(expected, start=1):
        assert out[doc] == pos


def test_corpus_shuffle_partition_invariant(spark):
    df = _docs(spark)
    a = {(r["doc_id"], r["pos"]) for r in corpus_shuffle(df, "doc_id").collect()}
    b = {(r["doc_id"], r["pos"]) for r in corpus_shuffle(df.repartition(17), "doc_id").collect()}
    assert a == b
