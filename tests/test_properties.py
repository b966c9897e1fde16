"""Property-based checks (hypothesis) for the algebraic laws the
operators must satisfy on ANY input, per SURVEY.md §5: the reference
only has example-based tests, the golden-oracle harness only checks
fixed fixtures — these pin the laws themselves.

- keyed dedup is idempotent, keeps exactly one row per key, and that
  row is maximal in the declared ordering
- full-row distinct is idempotent and a set projection of its input
- watermark (MAX ts) is monotone under append — the invariant the
  incremental-ingest protocol (ST2) relies on to never lose rows
- schema alignment is idempotent and always lands on the declared
  schema regardless of input shape
- exact dedup partitions the corpus: group sizes sum to the corpus

Frames are tiny (Spark job per example); max_examples is capped so
the whole module stays in CI-scale time.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dot_spark.operators.dedup import dedupe_keep_latest, distinct_rows
from dot_spark.operators.relational import watermark_max
from dot_spark.operators.textdedup import exact_dedup
from dot_spark.schema import align_schema

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts, payload) rows: small domains force key collisions and
# ts ties, which is where dedup bugs live
rows_st = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 5),
        st.integers(-10, 10),
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, ts INT, v INT")


@given(rows=rows_st)
@settings(**SETTINGS)
def test_dedup_idempotent_and_maximal(spark, rows):
    df = _df(spark, rows)
    once = dedupe_keep_latest(df, ["k"], ["ts"], tiebreaker="v")
    twice = dedupe_keep_latest(once, ["k"], ["ts"], tiebreaker="v")
    got = sorted(map(tuple, once.collect()))
    assert got == sorted(map(tuple, twice.collect()))
    # exactly one survivor per key, and it has the key's max ts
    per_key: dict[int, list[tuple]] = {}
    for r in rows:
        per_key.setdefault(r[0], []).append(r)
    assert len(got) == len(per_key)
    for k, ts, v in got:
        assert ts == max(r[1] for r in per_key[k])
        # tiebreaker=v ASC: among max-ts rows, the smallest v wins
        assert v == min(r[2] for r in per_key[k] if r[1] == ts)


@given(rows=rows_st)
@settings(**SETTINGS)
def test_distinct_is_idempotent_set_projection(spark, rows):
    df = _df(spark, rows)
    d1 = sorted(map(tuple, distinct_rows(df).collect()))
    d2 = sorted(map(tuple, distinct_rows(distinct_rows(df)).collect()))
    assert d1 == d2 == sorted(set(rows))


@given(base=rows_st, extra=rows_st)
@settings(**SETTINGS)
def test_watermark_monotone_under_append(spark, base, extra):
    wm1 = watermark_max(_df(spark, base), "ts").collect()[0].watermark
    wm2 = watermark_max(_df(spark, base + extra), "ts").collect()[0].watermark
    assert wm2 >= wm1
    # and the watermark splits the appended table exactly: re-reading
    # rows with ts > wm1 plus the old snapshot loses nothing (ST2)
    appended = _df(spark, base + extra)
    newer = appended.filter(F.col("ts") > F.lit(wm1)).count()
    older = appended.filter(F.col("ts") <= F.lit(wm1)).count()
    assert newer + older == len(base) + len(extra)


@given(
    rows=st.lists(
        st.tuples(st.integers(-5, 5), st.text(max_size=4)),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_align_schema_idempotent_and_total(spark, rows):
    df = spark.createDataFrame(rows, "a INT, b STRING")
    target = {"b": "string", "c": "bigint", "a": "double"}
    once = align_schema(df, target)
    twice = align_schema(once, target)
    assert once.schema == twice.schema
    assert [f.name for f in once.schema.fields] == ["b", "c", "a"]
    got1 = sorted(map(tuple, once.collect()), key=repr)
    got2 = sorted(map(tuple, twice.collect()), key=repr)
    assert got1 == got2
    # the added column is all-NULL, existing values survive the cast
    assert once.filter(F.col("c").isNotNull()).count() == 0


@given(
    texts=st.lists(
        st.text(alphabet="ab X", min_size=0, max_size=8),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_partitions_corpus(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    groups = exact_dedup(df, "text", "doc_id").collect()
    # group sizes sum to the corpus: every doc is in exactly one group
    assert sum(g.n_dups for g in groups) == len(texts)
    # keep_id is a real member id
    ids = set(range(len(texts)))
    assert all(g.keep_id in ids for g in groups)


@given(
    lrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)),
                   min_size=1, max_size=12),
    rrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)),
                   min_size=1, max_size=12),
)
@settings(**SETTINGS)
def test_asof_join_matches_reference_model(spark, lrows, rrows):
    """asof_join == per-row python argmax of right ts <= left ts."""
    from dot_spark.operators.relational import asof_join

    rrows = list({(k, ts) for k, ts in rrows})  # unique per (key, ts)
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)], "lid INT, k INT, ts INT"
    )
    right = spark.createDataFrame(
        [(k, ts, ts * 10) for k, ts in rrows], "k INT, ts INT, v INT"
    )
    got = {r.lid: (r.asof_ts, r.asof_v)
           for r in asof_join(left, right, on="k").collect()}
    for i, (k, ts) in enumerate(lrows):
        cand = [rt for rk, rt in rrows if rk == k and rt <= ts]
        if cand:
            best = max(cand)
            assert got[i] == (best, best * 10), (i, k, ts)
        else:
            assert i not in got, (i, k, ts)


@given(
    lrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)),
                   min_size=1, max_size=12),
    rrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)),
                   min_size=1, max_size=12),
)
@settings(**SETTINGS)
def test_asof_forward_matches_reference_model(spark, lrows, rrows):
    """forward asof_join == per-row python argmin of right ts >=
    left ts (the next-event-after model), inclusive on ties — the
    mirror of the backward law above."""
    from dot_spark.operators.relational import asof_join

    rrows = list({(k, ts) for k, ts in rrows})  # unique per (key, ts)
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)], "lid INT, k INT, ts INT"
    )
    right = spark.createDataFrame(
        [(k, ts, ts * 10) for k, ts in rrows], "k INT, ts INT, v INT"
    )
    got = {r.lid: (r.asof_ts, r.asof_v)
           for r in asof_join(left, right, on="k",
                              direction="forward").collect()}
    for i, (k, ts) in enumerate(lrows):
        cand = [rt for rk, rt in rrows if rk == k and rt >= ts]
        if cand:
            best = min(cand)
            assert got[i] == (best, best * 10), (i, k, ts)
        else:
            assert i not in got, (i, k, ts)


@given(
    pts=st.lists(st.integers(0, 40), min_size=1, max_size=10),
    ivs=st.lists(st.tuples(st.integers(0, 40), st.integers(1, 15)),
                 min_size=1, max_size=8),
    width=st.sampled_from([1.0, 3.0, 7.0]),
)
@settings(**SETTINGS)
def test_range_join_matches_naive_model(spark, pts, ivs, width):
    """binned range_join == naive inequality filter, any bin width."""
    from dot_spark.operators.relational import range_join

    points = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(pts)], "pid INT, x DOUBLE"
    )
    intervals = spark.createDataFrame(
        [(j, float(lo), float(lo + ln)) for j, (lo, ln) in enumerate(ivs)],
        "iid INT, lo DOUBLE, hi DOUBLE",
    )
    got = sorted((r.pid, r.iid) for r in
                 range_join(points, intervals, "x", "lo", "hi", width).collect())
    want = sorted((i, j) for i, x in enumerate(pts)
                  for j, (lo, ln) in enumerate(ivs) if lo <= x < lo + ln)
    assert got == want


texts_st = st.lists(
    # tiny alphabet + short texts force shared shingles, where the
    # inverted-index join and the df-cap actually engage
    st.text(alphabet="ab ", min_size=0, max_size=12),
    min_size=2,
    max_size=8,
)


def _naive_jaccard(texts: list[str], n: int = 3):
    """Driver-side reference: normalized-token n-gram sets, exact
    jaccard for every pair (the textdedup normalize/shingle rules:
    lowercase, collapse spaces, trim, distinct n-token windows with
    a min of one window)."""
    import re

    sets = []
    for t in texts:
        toks = _norm_toks(t)
        grams = {
            " ".join(toks[i : i + n]) for i in range(max(1, len(toks) - n + 1))
        }
        sets.append(grams)
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union:
                out[(i, j)] = (inter, round(inter / union, 4))
    return out


@given(texts=texts_st)
@settings(**SETTINGS)
def test_ngram_jaccard_matches_naive_model(spark, texts):
    """ngram_jaccard_pairs(threshold=0) == exact per-pair jaccard of
    the shingle SETS for every co-shingled pair, on ANY input —
    including empty texts, all-space texts, and exact duplicates."""
    from dot_spark.operators.textdedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    got = {
        (r.id_a, r.id_b): (r.inter, r.jaccard)
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    want = {k: v for k, v in _naive_jaccard(texts).items() if v[0] > 0}
    assert got == want


@given(texts=texts_st, maxdf=st.integers(1, 4))
@settings(**SETTINGS)
def test_capped_jaccard_is_lower_bound_of_exact(spark, texts, maxdf):
    """The shingle_maxdf stop-shingle cap may only UNDER-count
    intersections: every capped pair must exist in the exact result
    with capped.inter <= exact.inter and capped.jaccard <=
    exact.jaccard — the documented lower-bound contract dd4b's scale
    guard relies on."""
    from dot_spark.operators.textdedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    exact = {
        (r.id_a, r.id_b): (r.inter, r.jaccard)
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    capped = ngram_jaccard_pairs(df, threshold=0.0, shingle_maxdf=maxdf).collect()
    for r in capped:
        assert (r.id_a, r.id_b) in exact
        e_inter, e_jac = exact[(r.id_a, r.id_b)]
        assert r.inter <= e_inter
        assert r.jaccard <= e_jac + 1e-9


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200)),
        min_size=1,
        max_size=20,
    ),
    gap_minutes=st.sampled_from([1, 30]),
)
@settings(**SETTINGS)
def test_sessionize_matches_gap_split_model(spark, events, gap_minutes):
    """sessionize == the naive per-key gap-split: sort a key's events
    by (ts, id), start a new session whenever the gap from the
    previous event exceeds gap_minutes. Ties and duplicate
    timestamps included (tiebreak on event_id keeps it total)."""
    import datetime

    from dot_spark.operators.sampling import sessionize

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, k, base + datetime.timedelta(minutes=m))
        for i, (k, m) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id INT, user_id INT, ts TIMESTAMP")
    got = {
        r.event_id: r.session_idx
        for r in sessionize(df, gap_minutes=gap_minutes).collect()
    }

    want = {}
    by_key: dict[int, list[tuple]] = {}
    for i, k, ts in rows:
        by_key.setdefault(k, []).append((ts, i))
    for k, evs in by_key.items():
        evs.sort()
        idx, prev = 0, None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > gap_minutes * 60:
                idx += 1
            want[i] = idx
            prev = ts
    assert got == want


@given(texts=texts_st)
@settings(**SETTINGS)
def test_dedup_corpus_matches_reference_model(spark, texts):
    """dedup_corpus on ANY corpus must equal the reference model
    exactly: min-id exact-dedup survivors (python), the LSH pair
    miner's output over those survivors (the Spark operator — the
    pair graph is the pipeline's own definition), union-find
    components over those pairs (python, itself property-tested
    against connected_components), keep = unclustered survivors plus
    each cluster's min-id canonical. This pins the canonical-
    selection filter itself — a flipped keep condition (e.g. keeping
    the non-canonical members) passes weaker subset/uniqueness
    checks but not this equality."""
    from dot_spark.operators.textdedup import (
        dedup_corpus,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        normalize_text,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    got = sorted(r.doc_id for r in dedup_corpus(df).collect())

    # reference: exact dedup in python (min id per normalized text)
    norm = {
        r.doc_id: r.n
        for r in df.select("doc_id", normalize_text("text").alias("n")).collect()
    }
    first_by_text: dict[str, int] = {}
    for i in sorted(norm):
        first_by_text.setdefault(norm[i], i)
    exact_ids = sorted(first_by_text.values())

    # the pipeline's own pair miner over the exact survivors...
    surv_df = df.filter(F.col("doc_id").isin(exact_ids))
    pairs = [
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            lsh_bands(minhash_signatures(surv_df))
        ).collect()
    ]
    # ...clustered by python union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a), parent.setdefault(b, b)
        parent[find(a)] = find(b)
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    clustered = set(parent)
    canonical = {min(members) for members in comps.values()}
    want = sorted(i for i in exact_ids if i not in clustered or i in canonical)
    assert got == want


@given(texts=texts_st)
@settings(**SETTINGS)
def test_chunk_dedup_matches_reference_model(spark, texts):
    """chunk_dedup == the python reference on ANY corpus: normalized
    tokens, non-overlapping 4-token chunks (short tail kept), keep
    only the first (doc_id, chunk_idx) occurrence of each distinct
    chunk text, reassemble in order — counts and reassembled text
    both equal."""
    import re

    from dot_spark.operators.textdedup import chunk_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.dedup_text)
        for r in chunk_dedup(df, chunk_size=4).collect()
    }

    chunks: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        toks = _norm_toks(t)
        chunks[i] = [
            " ".join(toks[p : p + 4]) for p in range(0, max(1, len(toks)), 4)
        ]
    seen: set[str] = set()
    want = {}
    for i in sorted(chunks):
        kept = []
        for c in chunks[i]:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        want[i] = (len(chunks[i]), len(kept), " ".join(kept))
    assert got == want


@given(
    keys=st.lists(st.integers(0, 1_000_000), min_size=1, max_size=40),
    parts=st.sampled_from([1, 3, 7]),
)
@settings(**SETTINGS)
def test_hash_sample_is_partition_invariant(spark, keys, parts):
    """hash_sample must select the SAME rows regardless of physical
    partitioning (the reproducibility contract p10 sells): the filter
    depends only on row content, never on split placement."""
    from dot_spark.operators.sampling import hash_sample

    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    a = sorted(r.k for r in hash_sample(df, "k").collect())
    b = sorted(r.k for r in hash_sample(df.repartition(parts), "k").collect())
    assert a == b


@given(
    livs=st.lists(st.tuples(st.integers(0, 40), st.integers(1, 15)),
                  min_size=1, max_size=8),
    rivs=st.lists(st.tuples(st.integers(0, 40), st.integers(1, 15)),
                  min_size=1, max_size=8),
    width=st.sampled_from([1.0, 4.0, 9.0]),
)
@settings(**SETTINGS)
def test_interval_join_matches_naive_model(spark, livs, rivs, width):
    """binned interval_join == naive overlap filter for any bin
    width, with no duplicate pairs (the first-overlap-bin emission
    rule must fire exactly once per overlapping pair)."""
    from dot_spark.operators.relational import interval_join

    left = spark.createDataFrame(
        [(i, float(s), float(s + ln)) for i, (s, ln) in enumerate(livs)],
        "lid INT, ls DOUBLE, le DOUBLE",
    )
    right = spark.createDataFrame(
        [(j, float(s), float(s + ln)) for j, (s, ln) in enumerate(rivs)],
        "rid INT, rs DOUBLE, re DOUBLE",
    )
    got = [(r.lid, r.rid) for r in
           interval_join(left, right, "ls", "le", "rs", "re", width).collect()]
    want = sorted(
        (i, j)
        for i, (s1, l1) in enumerate(livs)
        for j, (s2, l2) in enumerate(rivs)
        if s1 < s2 + l2 and s2 < s1 + l1
    )
    assert sorted(got) == want
    assert len(got) == len(set(got))  # no bin-duplicated pairs


edges_st = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0,
    max_size=30,
)


@given(edges=edges_st)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """connected_components must equal a driver-side union-find on
    ANY pair multiset (self-loops, duplicates, reversed duplicates,
    multi-component graphs): same node set, label = min id of the
    union-find component."""
    from dot_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "id_a BIGINT, id_b BIGINT"
    )
    got = {r.node: r.label for r in connected_components(pairs).collect()}

    # reference: union-find over the same edges
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges or [(0, 0)]:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        parent[find(a)] = find(b)
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in comps.values() for n in members}
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),      # user
            st.integers(0, 200),    # minutes offset (forces exact-gap ties)
        ),
        min_size=1,
        max_size=30,
    ),
    gap_minutes=st.sampled_from([10, 30]),
)
@settings(**SETTINGS)
def test_session_window_agrees_with_lag_cumsum_sessionize(spark, events, gap_minutes):
    """Two INDEPENDENT sessionization implementations — the native
    F.session_window aggregation (st8) and the lag+cumsum window
    chain (w6) — must partition any event stream identically,
    including streams with gaps of exactly the threshold (both merge
    at the boundary: new session iff diff > gap)."""
    import datetime as dt

    from dot_spark.operators.sampling import sessionize
    from dot_spark.operators.timeseries import session_window_agg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, t0 + dt.timedelta(minutes=m), 1.0)
        for i, (u, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )

    native = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_window_agg(
            df, "user_id", "ts", f"{gap_minutes} minutes"
        ).collect()
    }
    manual = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sessionize(df, gap_minutes=gap_minutes)
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert native == manual


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.sampled_from([1, 3]),
)
@settings(**SETTINGS)
def test_bpe_merges_match_reference_implementation(spark, texts, k):
    """The distributed BPE (fold-based fuse, partial-agg pair counts)
    must learn the SAME merge table as the independent pure-Python
    reference on any corpus — tiny {a,b} alphabets force heavy ties,
    overlapping runs (aaa), and re-merges of fused symbols, which is
    where greedy-fuse implementations diverge."""
    from dot_spark.operators.bpe import bpe_merges, reference_bpe

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges(docs, k=k).orderBy("rank").collect()
    ]
    assert got == reference_bpe(texts, k=k)


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.sampled_from([2, 5]),
    batch=st.sampled_from([1, 3]),
)
@settings(**SETTINGS)
def test_bpe_merges_batched_match_reference(spark, texts, k, batch):
    """The BATCHED distributed BPE (top-N symbol-disjoint merges per
    round, one candidate-window collect per round) must replay the
    SAME schedule as the independent pure-Python batched reference —
    tiny {a,b,c} alphabets force ties and symbol collisions inside
    the candidate window, which is exactly where the disjointness
    rule and the scan bound matter."""
    from dot_spark.operators.bpe import bpe_merges_batched, reference_bpe_batched

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges_batched(docs, k=k, batch=batch).orderBy("rank").collect()
    ]
    assert got == reference_bpe_batched(texts, k=k, batch=batch)


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=4,
    ),
    k=st.sampled_from([1, 4]),
)
@settings(**SETTINGS)
def test_bpe_batch_of_one_equals_sequential_greedy(spark, texts, k):
    """Law: batch=1 degenerates to pure sequential greedy — the
    candidate window's head is always accepted, so the batched
    trainer must learn EXACTLY bpe_merges' table (rank, pair, count
    all equal). Pins the batched path to the sequential baseline."""
    from dot_spark.operators.bpe import bpe_merges, bpe_merges_batched

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = lambda df: [  # noqa: E731
        (r["rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]
    assert rows(bpe_merges_batched(docs, k=k, batch=1)) == rows(
        bpe_merges(docs, k=k)
    )


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.sampled_from([1, 3]),
)
@settings(**SETTINGS)
def test_bpe_encode_counts_match_reference(spark, texts, k):
    """Train-then-encode: the distributed encode (vocab-side merge
    folds broadcast back onto (doc, word) pairs) must produce the
    same per-doc token counts as the independent pure-Python encode,
    on the same adversarial {a,b} corpora the training law uses."""
    from dot_spark.operators.bpe import (
        bpe_encode_counts,
        bpe_merges,
        reference_bpe,
        reference_encode,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    merges = [(l, r) for _, l, r, _ in reference_bpe(texts, k=k)]
    spark_merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_merges(docs, k=k).orderBy("rank").collect()
    ]
    assert spark_merges == merges
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode_counts(docs, merges).collect()
    }
    want = {i: reference_encode(t, merges) for i, t in enumerate(texts)}
    assert got == want


@given(
    target=st.dictionaries(st.integers(0, 6), st.integers(0, 50), max_size=6),
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 6),          # key
                st.integers(0, 50),         # value
                st.booleans(),              # is_delete
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    ),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_upsert_matches_dict_model(spark, tmp_path_factory, target, batches):
    """Warehouse.merge_upsert over any CDC batch sequence must equal
    the obvious dict model (delete wins within a batch for a key that
    both updates and deletes — the operator removes touched keys
    first and re-inserts only non-deletes; the model mirrors that by
    applying a batch's updates only for keys without a delete)."""
    from dot_spark.loads import Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh")))
    rows = list(target.items())
    df = spark.createDataFrame(rows, "k bigint, v bigint") if rows else \
        spark.createDataFrame([], "k bigint, v bigint")
    wh.write(df, "t", "truncate")

    model = dict(target)
    for batch in batches:
        # collapse to one change per key (last change in the batch
        # wins), matching the keep-latest precondition of the operator
        collapsed = {}
        for i, (k, v, d) in enumerate(batch):
            collapsed[k] = (i, k, v, d)
        cdc_rows = [(k, v, d) for (_, k, v, d) in collapsed.values()]
        cdc = spark.createDataFrame(cdc_rows, "k bigint, v bigint, is_delete boolean")
        wh.merge_upsert(cdc, "t", ["k"], delete_col="is_delete")
        for _, k, v, d in collapsed.values():
            if d:
                model.pop(k, None)
            else:
                model[k] = v

    got = {r["k"]: r["v"] for r in wh.read("t").collect()}
    assert got == model


@given(
    target=st.dictionaries(st.integers(0, 11), st.integers(0, 50), min_size=1, max_size=8),
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 11),         # key
                st.integers(0, 50),         # value
                st.booleans(),              # is_delete
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=3,
    ),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_partitioned_merge_matches_dict_model_under_partition_evolution(
    spark, tmp_path_factory, target, batches
):
    """The dict-model law over a HIVE-PARTITIONED target whose
    partition set EVOLVES across the CDC sequence: partition = k % 3
    (stable per key — the CDC contract), inserts may land in
    partitions the target never had (growth), a batch may delete a
    partition's every row (shrink — including emptying the whole
    table mid-sequence, after which later batches must still apply),
    and at the end the on-disk partition directories must track the
    surviving keys exactly: a stale directory would resurrect deleted
    rows on the next read."""
    import os

    from dot_spark.loads import Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh")))
    schema = "p bigint, k bigint, v bigint"
    rows = [(k % 3, k, v) for k, v in target.items()]
    wh.write(spark.createDataFrame(rows, schema), "t", "truncate", partition_cols=["p"])

    model = dict(target)
    for batch in batches:
        collapsed = {}
        for k, v, d in batch:                   # last change per key wins
            collapsed[k] = (k, v, d)
        cdc_rows = [(k % 3, k, v, d) for (k, v, d) in collapsed.values()]
        cdc = spark.createDataFrame(
            cdc_rows, "p bigint, k bigint, v bigint, is_delete boolean"
        )
        wh.merge_upsert(cdc, "t", ["k"], delete_col="is_delete")
        for k, v, d in collapsed.values():
            if d:
                model.pop(k, None)
            else:
                model[k] = v

    got = (
        {r["k"]: r["v"] for r in wh.read("t").collect()}
        if wh.has_data_files("t")
        else {}
    )
    assert got == model
    dirs = {e for e in os.listdir(wh.path("t")) if e.startswith("p=")}
    assert dirs == {f"p={k % 3}" for k in model}


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 2)),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_scd2_history_reconstructs_keep_latest_state(spark, events):
    """The SCD2 history's CURRENT rows (valid_to IS NULL) must equal
    keep-latest-per-key over the change stream, and per key the
    validity intervals must tile [first_change, inf) without gaps or
    overlaps."""
    import datetime as dt

    from dot_spark.operators.timeseries import scd2_history

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, k, t0 + dt.timedelta(minutes=m), f"v{a}")
        for i, (k, m, a) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, attr string"
    )
    hist = scd2_history(df, "user_id", "attr", "ts", "event_id").collect()

    # model: latest attr per key by (ts, event_id)
    latest = {}
    for i, (k, m, a) in enumerate(events):
        key = (m, i)
        if k not in latest or key > latest[k][0]:
            latest[k] = (key, f"v{a}")
    current = {r["user_id"]: r["attr"] for r in hist if r["is_current"]}
    assert current == {k: v for k, (_, v) in latest.items()}

    by_key = {}
    for r in hist:
        by_key.setdefault(r["user_id"], []).append(r)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from"])
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]  # tiling, no gaps
            assert a["attr"] != b["attr"]            # runs collapsed
        assert versions[-1]["valid_to"] is None


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abc"), min_size=4, max_size=10).map(" ".join),
        min_size=2,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_incremental_lsh_equals_restricted_full_mine(spark, texts):
    """pl11's law: incremental mining (new bands vs the standing band
    index) must equal the FULL self-join's pairs restricted to those
    touching a new doc — on any corpus split."""
    from dot_spark.operators.textdedup import (
        lsh_bands,
        lsh_candidate_pairs,
        lsh_candidate_pairs_incremental,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    bands = lsh_bands(
        minhash_signatures(docs, num_hashes=8, shingle_n=2),
        bands=4,
        rows_per_band=2,
    )
    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(bands).collect()
    }
    want = {(a, b) for a, b in full if a % 3 == 0 or b % 3 == 0}
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs_incremental(
            bands.filter(F.col("doc_id") % 3 == 0), bands
        ).collect()
    }
    assert got == want


@given(
    obs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(1, 9)),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_gapfill_matches_naive_model(spark, obs):
    """a14's law on any input: per key, the output grid is exactly
    the hour range [first_obs, last_obs]; observed cells carry their
    own (rounded) bucket sum, holes carry the previous observation."""
    import datetime as dt

    from dot_spark.operators.timeseries import gapfill_locf

    t0 = dt.datetime(2024, 6, 1)
    rows = [
        (i, k, t0 + dt.timedelta(hours=h, minutes=i % 60), float(v))
        for i, (k, h, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["bucket"]): (r["observed"], r["filled_value"])
        for r in gapfill_locf(df, "user_id", "ts", "value").collect()
    }

    # naive model
    buckets = {}
    for i, (k, h, v) in enumerate(obs):
        buckets.setdefault(k, {}).setdefault(h, 0.0)
        buckets[k][h] += float(v)
    want = {}
    for k, hs in buckets.items():
        lo, hi = min(hs), max(hs)
        last = None
        for h in range(lo, hi + 1):
            if h in hs:
                last = round(hs[h], 2)
                want[(k, t0 + dt.timedelta(hours=h))] = (True, last)
            else:
                want[(k, t0 + dt.timedelta(hours=h))] = (False, last)
    assert got == want


@given(
    parents=st.lists(st.integers(0, 100), min_size=1, max_size=25),
)
@settings(**SETTINGS)
def test_tree_root_depth_matches_python_walk(spark, parents):
    """Pointer doubling must agree with a plain parent-walk on any
    forest. Construction guarantees acyclicity: node i's parent is
    drawn from [0, i] (clamped), parent == self means root."""
    from dot_spark.operators.relational import tree_root_depth

    par = [min(p, i) for i, p in enumerate(parents)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(par)], "node bigint, parent bigint"
    )
    got = {r["node"]: (r["root"], r["depth"])
           for r in tree_root_depth(df).collect()}

    def walk(i):
        d = 0
        while par[i] != i:
            i = par[i]
            d += 1
        return i, d

    assert got == {i: walk(i) for i in range(len(par))}


def test_bpe_handles_null_text_like_the_reference(spark):
    """A NULL text must count as one empty word (0 tokens) on BOTH
    paths — explode(split(NULL)) would silently drop the document
    from training frequencies and from the t17 accounting, a
    divergence the clean fixture corpus cannot surface."""
    from dot_spark.operators.bpe import (
        bpe_encode_counts,
        bpe_merges,
        reference_bpe,
        reference_encode,
    )

    texts = ["ab ab a", None, "b ab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got_merges = [
        (r["rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges(docs, k=2).orderBy("rank").collect()
    ]
    assert got_merges == reference_bpe(texts, k=2)
    merges = [(l, r) for _, l, r, _ in got_merges]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode_counts(docs, merges).collect()
    }
    assert set(got) == {0, 1, 2}  # the NULL doc is present
    assert got == {i: reference_encode(t, merges) for i, t in enumerate(texts)}


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),          # group key (collisions forced)
            st.integers(-100, 100),     # value
            st.integers(0, 50),         # ts
        ),
        min_size=1,
        max_size=24,
    ),
    cuts=st.lists(st.integers(0, 23), max_size=3),
)
@settings(**SETTINGS)
def test_mv_merge_law_under_random_slicings(spark, rows, cuts):
    """The incremental-MV maintenance law (pl13/pl14): for ANY
    partition of the input rows into slices — an EMPTY slice is
    always interleaved too (a stream delivers empty micro-batches) —
    merging the per-slice partials equals the one-shot aggregate of
    the whole. This is the algebraic fact that makes per-batch
    maintenance correct no matter how the stream happens to batch
    the data."""
    from dot_spark.pipelines import mv_merge, mv_partials

    ddl = "k INT, v INT, ts INT"
    bounds = sorted({0, len(rows), *[min(c, len(rows)) for c in cuts]})
    # consecutive distinct bounds make every slice non-empty, so an
    # explicit empty slice goes in the middle of the merge
    slices = [rows[a:b] for a, b in zip(bounds, bounds[1:])] or [rows]
    slices.insert(len(slices) // 2, [])
    parts = [
        mv_partials(spark.createDataFrame(s, ddl), ["k"], "v", "ts")
        for s in slices
    ]
    whole = mv_partials(spark.createDataFrame(rows, ddl), ["k"], "v", "ts")
    got = {
        r.k: (r.mv_n, r.mv_sum, r.mv_min_ts, r.mv_max_ts)
        for r in mv_merge(*parts, keys=["k"]).collect()
    }
    want = {
        r.k: (r.mv_n, r.mv_sum, r.mv_min_ts, r.mv_max_ts)
        for r in whole.collect()
    }
    assert got == want


# --- woo item sticky carries: the Spark windows must equal the
# reference's loop-carried fold for EVERY item sequence (the loop is
# the spec; woo-sync/main.py:683-688 sku, :745-749 donor_premium).

# per-item (sku, bundled_by, has_cru, donor_premium) with the
# interesting domains: sku sometimes None, bundled_by ''/non-empty,
# cru_data sometimes ABSENT (no assignment at all), dp in
# {None, '0', '1', 'false'} — 'false' must NOT freeze, but a
# present-but-None value MUST (the reference assigns cd['...']
# verbatim, None included)
_item_st = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["s1", "s2"])),
        st.sampled_from(["", "9"]),
        st.booleans(),
        st.one_of(st.none(), st.sampled_from(["0", "1", "false"])),
    ),
    min_size=1,
    max_size=8,
)


def _reference_carries(items):
    """The reference loop, VERBATIM (woo-sync/main.py:683-688 sku,
    :739-749 donor_premium — no extra None guard): returns per-item
    (sku_carry, donor_premium_bool_or_None)."""
    sku = ""
    dp = "false"
    out = []
    for s, bundled_by, has_cru, d in items:
        if bundled_by == "":
            sku = s
        if has_cru:
            if dp == "false":
                dp = d
        out.append((sku, None if dp is None else dp == "1"))
    return out


# --- woo product meta pivot: the declarative lifts must equal the
# reference's overwrite-loop fold for EVERY meta_data sequence,
# duplicate keys included (woo-sync/main.py:840-892 is the spec).

_META_KEYS = [
    "royalty", "gift_card",                     # sticky exact-'1' flags
    "brand", "impact",                          # plain: last wins (None too)
    "_alg_wc_cog_cost",                         # ''-guarded decimal
    "case_qty",                                 # ''-guarded int
]
_meta_st = st.lists(
    st.tuples(
        st.sampled_from(_META_KEYS),
        st.one_of(st.none(), st.sampled_from(["", "0", "1", "true", "7", "2.5", "zz"])),
    ),
    min_size=0,
    max_size=10,
)


def _reference_meta_pivot(meta):
    """Verbatim reference fold (main.py:846-892 arm shapes) with the
    engine's documented coercion fallbacks at the END (the reference
    int()/Decimal() would crash on garbage; the engine's try_cast
    coalesces to the default — a deliberate, documented divergence
    only for inputs that kill the reference)."""
    royalty = 0
    gift_card = 0
    brand = ""
    impact = ""
    alg = "0.00"
    case_qty_raw = "0"
    for k, v in meta:
        if k == "royalty":
            if v == "1":
                royalty = 1
        elif k == "gift_card":
            if v == "1":
                gift_card = 1
        elif k == "brand":
            brand = v
        elif k == "impact":
            impact = v
        elif k == "_alg_wc_cog_cost":
            if v not in ("", None):
                alg = v
        elif k == "case_qty":
            if v not in ("", None):
                case_qty_raw = v
    try:
        alg_f = float(alg)
    except (TypeError, ValueError):
        alg_f = 0.0
    try:
        case_qty = int(case_qty_raw)
    except (TypeError, ValueError):
        case_qty = 0
    return {
        "royalty": bool(royalty),
        "gift_card": bool(gift_card),
        "brand": brand,
        "impact": impact,
        "alg_wc_cog_cost": alg_f,
        "case_qty": case_qty,
    }


@given(meta=_meta_st)
@settings(**SETTINGS)
def test_woo_meta_pivot_matches_reference_fold(spark, meta):
    from dot_spark.operators.woo_flatten import flatten_products

    ddl = (
        "id BIGINT, name STRING, short_description STRING, status STRING, "
        "date_created STRING, date_modified STRING, price STRING, "
        "regular_price STRING, msrp_price STRING, sku STRING, weight STRING, "
        "type STRING, stock_quantity BIGINT, backorders_allowed STRING, "
        "downloadable STRING, virtual STRING, "
        "meta_data ARRAY<STRUCT<key STRING, value STRING>>"
    )
    rows = [
        (1, "P", "sd", "publish", "2026-01-01 00:00:00", "2026-01-01 00:00:00",
         "1.00", "", "", "S", "", "simple", 1, "", "", "", list(meta)),
    ]
    r = flatten_products(spark.createDataFrame(rows, ddl)).collect()[0]
    want = _reference_meta_pivot(meta)
    got = {
        "royalty": r.royalty,
        "gift_card": r.gift_card,
        "brand": r.brand,
        "impact": r.impact,
        "alg_wc_cog_cost": float(r.alg_wc_cog_cost),
        "case_qty": r.case_qty,
    }
    assert got == want, (got, want, meta)


@given(items=_item_st)
@settings(**SETTINGS)
def test_woo_sticky_carries_match_reference_fold(spark, items):
    from dot_spark.operators.woo_flatten import flatten_order_items

    ddl = (
        "id BIGINT, order_key STRING, date_created STRING, "
        "line_items ARRAY<STRUCT<id BIGINT, sku STRING, bundled_by STRING, "
        "cru_data STRUCT<donor_premium STRING>>>"
    )
    rows = [
        (1, "k", "2026-01-01 00:00:00",
         [(i, s, b, (d,) if has_cru else None)
          for i, (s, b, has_cru, d) in enumerate(items)])
    ]
    got = {
        r.order_item_id: (r.product_sku, r.product_donor_premium)
        for r in flatten_order_items(spark.createDataFrame(rows, ddl)).collect()
    }
    want = _reference_carries(items)
    for i, (sku, dp) in enumerate(want):
        assert got[i] == (sku, dp), (i, got[i], (sku, dp), items)


# --- r11 corpus-filter trio: replay parity on adversarial corpora ---------


from tests.conftest import norm_toks as _norm_toks  # noqa: E402


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="ab \t", min_size=0, max_size=6),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
)
@settings(**SETTINGS)
def test_hashed_linear_quality_matches_replay(spark, texts):
    """The staged HOF gram fold must equal the independent Python
    fold on any corpus — whitespace-degenerate texts (tabs, leading/
    trailing/multiple spaces, empty strings) force the edge shapes:
    single-token docs, '' tokens, grams containing tabs."""
    import hashlib

    from dot_spark.operators.text import hashed_linear_quality

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["score"], r["kept"])
        for r in hashed_linear_quality(docs).collect()
    }
    for i, t in enumerate(texts):
        toks = _norm_toks(t)
        grams = (
            [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
            if len(toks) > 1
            else [" ".join(toks[:2])]
        )
        acc = 0.0
        for g in grams:
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            acc += h / 4294967296.0 * 2 - 1
        score = round(acc / len(grams), 6)
        n_g, sc, kept = got[i]
        assert n_g == len(grams) and kept == (score > 0.0), (i, t)
        assert abs(sc - score) < 1e-9, (i, t, sc, score)


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=4),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    flags=st.lists(st.booleans(), min_size=8, max_size=8),
)
@settings(**SETTINGS)
def test_dsir_importance_matches_replay(spark, texts, flags):
    """DSIR log-weights and acceptance must equal the independent
    Python replay (own hashing, own bucket counts, own smoothing) on
    any corpus/target-flag assignment — including all-target and
    no-target corpora, where smoothing carries the whole ratio."""
    import hashlib
    import math

    from dot_spark.operators.text import dsir_importance

    rows = [(i, t, flags[i % len(flags)]) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, tgt boolean")
    got = {
        r["doc_id"]: (r["n_toks"], r["log_w"], r["accepted"])
        for r in dsir_importance(docs, F.col("tgt")).collect()
    }

    def bkt(term: str) -> int:
        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % 256

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _, t, fl in rows:
        for tok in _norm_toks(t):
            b = bkt(tok)
            raw[b] = raw.get(b, 0) + 1
            if fl:
                tgt[b] = tgt.get(b, 0) + 1
    raw_n, tgt_n = sum(raw.values()), sum(tgt.values())
    for i, t, _ in rows:
        toks = _norm_toks(t)
        lw = sum(
            math.log(tgt.get(bkt(tok), 0) + 1)
            - math.log(tgt_n + 256)
            - math.log(raw.get(bkt(tok), 0) + 1)
            + math.log(raw_n + 256)
            for tok in toks
        )
        lw = round(lw, 3)
        ap = round(math.exp(min(0.0, lw)), 6)
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 4294967296.0
        n_t, glw, acc = got[i]
        assert n_t == len(toks) and acc == (u <= ap), (i, t)
        assert abs(glw - lw) < 1e-9, (i, t, glw, lw)


# ---- corpus-scoring parity properties (round 12) ----------------

# texts over a 4-word alphabet with punctuation/newline structure:
# tiny domains force shared bigrams, degenerate docs (single token,
# all-same-token), bullet/ellipsis lines — where smoothing math and
# rule edge cases live
_words_st = st.lists(
    st.sampled_from(["the", "cat", "sat", "zz"]), min_size=1, max_size=12
)
_texts_st = st.lists(
    _words_st.map(" ".join), min_size=1, max_size=8
)


def _docs_dir(spark, texts):
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="prop_docs_")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


@given(texts=_texts_st)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kneser_ney_parity_on_generated_corpora(spark, texts):
    """t27's interpolated-KN scores equal an independent pure-Python
    replay on ANY corpus over a tiny colliding alphabet — the
    smoothing algebra (discount clipping, continuation counts, type
    totals) holds beyond the fixed fixture."""
    import math
    from collections import Counter

    from dot_spark.queries import t27_kneser_ney_score
    from tests.conftest import norm_toks

    d = _docs_dir(spark, texts)
    bc: Counter = Counter()
    doc_pairs = {}
    for i, t in enumerate(texts):
        toks = norm_toks(t)
        ps = list(zip(toks, toks[1:]))
        if ps:
            doc_pairs[i] = ps
            bc.update(ps)
    c1dot: Counter = Counter()
    n1p_w1: Counter = Counter()
    n1p_w2: Counter = Counter()
    for (w1, w2), c in bc.items():
        c1dot[w1] += c
        n1p_w1[w1] += 1
        n1p_w2[w2] += 1
    n_types = len(bc)
    expect = {}
    for i, ps in doc_pairs.items():
        logp = sum(
            math.log(
                max(bc[p] - 0.75, 0) / c1dot[p[0]]
                + (0.75 * n1p_w1[p[0]] / c1dot[p[0]])
                * (n1p_w2[p[1]] / float(n_types))
            )
            for p in ps
        )
        expect[i] = (len(ps), round(-logp / len(ps), 3))
    got = {
        r["doc_id"]: (r["n_pairs"], r["avg_neg_logp"])
        for r in t27_kneser_ney_score(spark, d).collect()
    }
    assert got == expect
