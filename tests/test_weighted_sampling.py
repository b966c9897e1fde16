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


def test_mixture_resample_balances_source_token_budgets(spark):
    """p18's law, checked against a pure-Python replay: the smallest
    source survives whole (keep_rate 1.0), every kept set is the
    deterministic hash-threshold set, and realized per-source token
    totals land near the common (smallest-source) budget."""
    import hashlib

    rows = []
    # three sources with 1x / 3x / 9x token mass (doc counts large
    # enough that the deterministic hash noise concentrates: the
    # realized-budget bound below is ~5 sigma at these sizes)
    for s, (n_docs, words) in {"a": (150, 5), "b": (450, 5), "c": (450, 15)}.items():
        for i in range(n_docs):
            rows.append((len(rows), s, " ".join(["tok"] * words)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    from dot_spark.operators.sampling import mixture_resample

    kept = mixture_resample(docs)
    got = {
        (r["source"], r["doc_id"]) for r in kept.select("source", "doc_id").collect()
    }

    # python model: identical md5 16-bit fraction
    tok_count = {did: len(t.split(" ")) for did, _, t in rows}
    total = {}
    for did, s, _ in rows:
        total[s] = total.get(s, 0) + tok_count[did]
    budget = min(total.values())
    want = set()
    for did, s, _ in rows:
        frac = int(hashlib.md5(str(did).encode()).hexdigest()[:4], 16)
        if frac < budget / total[s] * 65536:
            want.add((s, did))
    assert got == want
    # smallest source kept whole
    assert {d for s, d in got if s == "a"} == {d for d, s, _ in rows if s == "a"}
    # realized budgets near the target (hash noise bounded)
    for s in total:
        realized = sum(tok_count[d] for src, d in got if src == s)
        assert realized <= budget * 1.5 and realized >= budget * 0.5, (s, realized, budget)


def test_pack_sequences_is_gapless_complete_and_partition_invariant(spark):
    """Packing laws: (1) the virtual stream is gapless — sorting by
    start_pos, each doc starts exactly where the previous ended and
    the total stream length is sum(weights); (2) bin arithmetic is
    consistent (offset < window, last_bin = floor((start+w-1)/W));
    (3) the layout is identical under any input partitioning — the
    reproducibility contract that lets any worker rebuild any bin."""
    from dot_spark.operators.sampling import pack_sequences

    rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, n_chars BIGINT")
    out = sorted(
        (
            (r["start_pos"], r["doc_id"], r["n_tokens"], r["first_bin"],
             r["offset_in_bin"], r["last_bin"])
            for r in pack_sequences(df, window=512).collect()
        )
    )
    pos = 0
    for start, _doc, w, fb, off, lb in out:
        assert start == pos, (start, pos)
        assert fb == start // 512 and off == start % 512
        assert lb == (start + w - 1) // 512
        pos = start + w
    assert pos == sum(w for _, w in rows)
    again = sorted(
        (r["start_pos"], r["doc_id"])
        for r in pack_sequences(df.repartition(13), window=512).collect()
    )
    assert again == [(s, d) for s, d, *_ in out]


def test_weighted_topk_output_schema_is_input_schema(spark):
    """The E-S ranking key is an ordering expression, never a column:
    the output schema equals the input schema exactly, and a caller
    column literally named ``es_key`` survives untouched (the round-11
    ADVICE leak)."""
    from dot_spark.operators.sampling import es_key, weighted_topk_sample

    df = _docs(spark).withColumn("es_key", F.lit("mine"))
    out = weighted_topk_sample(df, "doc_id", F.lit(1.0), k=10)
    assert out.columns == df.columns
    assert {r["es_key"] for r in out.collect()} == {"mine"}
    # and the exposed expression matches an independent replay
    import hashlib
    import math

    row = out.select("doc_id", es_key("doc_id", F.lit(1.0)).alias("k")).first()
    h = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:8], 16)
    assert row["k"] == round(math.log((h + 1.0) / 4294967296.0), 6)


def test_temperature_mixture_endpoints_and_nesting(spark):
    """alpha endpoints and the flattening law: alpha=0 reproduces
    mixture_resample's equal-budget keep set exactly, alpha=1 keeps
    everything, and the default alpha=0.5 keep set NESTS between
    them (sqrt(r) >= r for r <= 1, and the per-row hash threshold is
    fixed, so every equal-budget survivor also survives
    temperature sampling)."""
    from dot_spark.operators.sampling import mixture_resample, temperature_mixture

    rows = [
        (i, "big" if i < 300 else ("mid" if i < 380 else "small"),
         "tok " * (5 + i % 7))
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    eq = {r["doc_id"] for r in mixture_resample(docs).collect()}
    a0 = {r["doc_id"] for r in temperature_mixture(docs, alpha=0.0).collect()}
    assert a0 == eq
    a1 = {r["doc_id"] for r in temperature_mixture(docs, alpha=1.0).collect()}
    assert a1 == {r[0] for r in rows}
    a5 = {r["doc_id"] for r in temperature_mixture(docs).collect()}
    assert eq <= a5 <= a1
    assert len(eq) < len(a5) < len(a1)
    # the smallest source keeps everything at every alpha
    small = {r[0] for r in rows if r[1] == "small"}
    assert small <= a5 and small <= eq
