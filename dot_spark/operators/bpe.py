"""Distributed BPE merge training — the tokenizer-training pass of an
LLM data pipeline, expressed Spark-first.

Byte-pair encoding learns a merge table by repeatedly (1) counting
adjacent symbol pairs across the corpus, weighted by word frequency,
(2) picking the most frequent pair, (3) fusing that pair everywhere.
Step 1 is the distributed work: ONE aggregation over the word-vocab
table per round (pair counting has map-side partials; the vocab table
is |distinct words|, already tiny relative to the corpus). Step 2 is
a one-row argmax fetch (the documented scalar-collect exception, like
dd8's convergence probe). Step 3 is a map-only higher-order fold —
no UDF, no shuffle.

Scale shape at 100 TB:
- the corpus is touched ONCE (word-frequency aggregation); every BPE
  round thereafter runs on the vocab table (distinct words), which is
  orders of magnitude smaller and sub-linear in corpus size;
- per-round lineage is truncated with localCheckpoint (the dd8
  pattern) so K rounds never build a K-deep plan;
- the per-round argmax ships exactly one row to the driver.

The greedy left-to-right fuse is implemented as an array fold
(aggregate): append each symbol, but when the accumulator's last
element is `l` and the incoming symbol is `r`, replace the last
element with `l+r`. Because the fused symbol `l+r` can never equal
`l` again within the round (r is non-empty), the fold is exactly the
non-overlapping left-to-right merge the reference BPE definition
uses ("aaa" + (a,a) -> [aa, a]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# adjacent-pair struct: l = symbol i, r = symbol i+1. The slice
# length is clamped at 0: an EMPTY symbol array (the '' word a NULL
# or empty text normalizes to) would otherwise pass -1 and error
# under ANSI slice semantics.
_PAIRS_EXPR = (
    "transform(slice(syms, 1, greatest(size(syms) - 1, 0)), "
    "(x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))"
)


def _fuse_expr(left: str, right: str) -> F.Column:
    """Fold `syms`, fusing every left-to-right occurrence of
    (left, right) into one symbol."""
    l, r = F.lit(left), F.lit(right)
    fused = F.lit(left + right)

    def step(acc, x):
        can_merge = (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r)
        return F.when(
            can_merge,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — the one pass that
    touches every document. Normalization matches the engine's
    canonical tokenizer (lower, collapse spaces, split on space).
    NULL text coalesces to '' (one empty word) so a NULL-bearing
    corpus can never silently diverge from the pure-Python reference,
    which counts None as one empty word."""
    from dot_spark.operators.textdedup import normalize_text

    toks = docs.select(
        F.explode(
            F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("word")
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def bpe_merges(docs: DataFrame, k: int = 4, text_col: str = "text") -> DataFrame:
    """Learn the top-k BPE merges over the corpus. Returns one row per
    learned merge: (rank, left_sym, right_sym, pair_count), where
    pair_count is the weighted adjacent-pair frequency at the time the
    merge was chosen. Ties break on (count DESC, left ASC, right ASC)
    so training is deterministic on any engine."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col)
    syms = vocab.select(
        "freq",
        F.expr("filter(split(word, ''), x -> x <> '')").alias("syms"),
    ).localCheckpoint(eager=True)

    out = []
    for rank in range(1, k + 1):
        top = (
            syms.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .first()
        )
        if top is None:
            break
        out.append((rank, top["l"], top["r"], int(top["cnt"])))
        syms = syms.select(
            "freq", _fuse_expr(top["l"], top["r"]).alias("syms")
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        out, "rank INT, left_sym STRING, right_sym STRING, pair_count BIGINT"
    )


def _select_disjoint(candidates, want: int):
    """Greedy batched-merge selection rule, shared by the Spark path
    and the pure-Python reference: scan candidates in (count DESC,
    left ASC, right ASC) order and accept a pair iff neither of its
    symbols appears in an already-accepted pair of this batch.
    Symbol-disjoint merges cannot interact — fusing (a,b) only
    destroys/creates pairs that mention a or b — so the whole batch
    can be applied in one map-only projection and every accepted
    pair's recorded count is exact at application time."""
    used: set = set()
    accepted = []
    for l, r, cnt in candidates:
        if len(accepted) == want:
            break
        if l in used or r in used:
            continue
        used.add(l)
        used.add(r)
        accepted.append((l, r, int(cnt)))
    return accepted


def _batch_scan_limit(want: int) -> int:
    """How deep into the sorted candidate list one batch round may
    look. Part of the algorithm's SPEC (the reference twin applies
    the same bound), not a tuning knob: a bounded prefix keeps the
    per-round driver fetch O(batch) instead of O(|pairs|)."""
    return max(4 * want, 16)


def bpe_merges_batched(
    docs: DataFrame, k: int = 16, batch: int = 4, text_col: str = "text"
) -> DataFrame:
    """Learn the top-k BPE merges with BATCHED round selection: each
    round counts pairs once, collects the top `_batch_scan_limit`
    candidate rows (O(batch), not O(|pairs|)), greedily accepts up to
    `batch` pairwise symbol-DISJOINT merges, and applies them all as
    one chained map-only projection before a single checkpoint.

    Why: the sequential trainer (bpe_merges) runs one Spark job per
    merge — fine for k≈4, but a real 32k-merge vocabulary would mean
    32k driver round-trips. Batching makes the job count
    ceil(k/batch); disjointness keeps every accepted merge's count
    exact (fusing (a,b) only touches pairs mentioning a or b), so the
    schedule is deterministic and independently replayable
    (reference_bpe_batched). Note the batched schedule is a DIFFERENT
    (well-defined) training objective than pure sequential greedy:
    a pair created by an earlier merge in the same round cannot be
    selected until the next round — the standard trade every batched
    BPE trainer makes.

    Returns one row per learned merge: (rank, left_sym, right_sym,
    pair_count), rank global across rounds in acceptance order."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col)
    syms = vocab.select(
        "freq",
        F.expr("filter(split(word, ''), x -> x <> '')").alias("syms"),
    ).localCheckpoint(eager=True)

    out = []
    while len(out) < k:
        want = min(batch, k - len(out))
        top = (
            syms.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(_batch_scan_limit(want))
            .collect()
        )
        if not top:
            break
        accepted = _select_disjoint(
            [(row["l"], row["r"], row["cnt"]) for row in top], want
        )
        fused = syms
        for l, r, cnt in accepted:
            out.append((len(out) + 1, l, r, cnt))
            # chained selects collapse into ONE codegen projection;
            # disjointness makes application order irrelevant
            fused = fused.select("freq", _fuse_expr(l, r).alias("syms"))
        syms = fused.localCheckpoint(eager=True)

    return spark.createDataFrame(
        out, "rank INT, left_sym STRING, right_sym STRING, pair_count BIGINT"
    )


def reference_bpe_batched(
    texts: list[str], k: int = 16, batch: int = 4
) -> list[tuple[int, str, str, int]]:
    """Independent pure-Python replay of the BATCHED merge schedule
    (same spec: sort by (count DESC, pair ASC), scan only the top
    `_batch_scan_limit` candidates, accept up to `batch` symbol-
    disjoint pairs, apply, repeat) — the oracle/test twin of
    bpe_merges_batched; shares NO code with the Spark fold."""
    import re
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in re.sub(r" +", " ", (t or "").lower()).strip().split(" "):
            vocab[w] += 1
    words = {w: list(w) for w in vocab}

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < k:
        want = min(batch, k - len(merges))
        counts: Counter = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        candidates = [
            (l, r, cnt) for (l, r), cnt in ordered[: _batch_scan_limit(want)]
        ]
        accepted = _select_disjoint(candidates, want)
        for l, r, cnt in accepted:
            merges.append((len(merges) + 1, l, r, cnt))
            for w, syms in words.items():
                new, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        new.append(l + r)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                words[w] = new
    return merges


def bpe_encode_counts(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply a trained merge table to the corpus and return per-doc
    token accounting: (id, n_words, n_tokens) — the tokenize-and-count
    pass that prices every mixture/budget decision downstream (token
    budgets, per-source mixture weights, context packing).

    Scale shape: the corpus is exploded to (doc, word) pairs ONCE and
    aggregated per (doc, word) — word bodies deduplicate immediately.
    The merge folds run over the DISTINCT-word table only (the same
    sub-linear vocab table BPE training rounds use), as one chained
    map-only projection (k folds collapse into one codegen stage —
    no checkpoint needed, unlike training, because no per-round
    aggregation intervenes). The sized vocab broadcasts back onto the
    (doc, word) pairs, so document text never shuffles with its
    token counts.
    """
    from dot_spark.operators.textdedup import normalize_text

    words = (
        docs.select(
            F.col(id_col),
            # NULL text -> '' -> one empty word (0 tokens), matching
            # reference_encode's (text or "") — explode(NULL) would
            # silently DROP the document from the accounting
            F.explode(
                F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
            ).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    vocab = words.select("word").distinct().select(
        "word", F.expr("filter(split(word, ''), x -> x <> '')").alias("syms")
    )
    for left, right in merges:
        vocab = vocab.select("word", _fuse_expr(left, right).alias("syms"))
    sized = vocab.select("word", F.size("syms").alias("word_tokens"))
    return (
        words.join(F.broadcast(sized), on="word")
        .groupBy(id_col)
        .agg(
            F.sum("wcnt").alias("n_words"),
            F.sum(F.col("wcnt") * F.col("word_tokens")).alias("n_tokens"),
        )
    )


def trained_merge_pairs(docs: DataFrame, k: int = 4, text_col: str = "text") -> list[tuple[str, str]]:
    """Train k merges and fetch the merge table to the driver as
    (left, right) pairs in rank order. A tokenizer is a SMALL,
    fixed-size artifact (k rows regardless of corpus size) — this is
    the ss3-centroid class of driver fetch, not a row funnel; it
    lives here (not in a query body) per the engine's collect
    discipline (tests/test_plans.py::test_no_driver_collect…)."""
    rows = bpe_merges(docs, k=k, text_col=text_col).orderBy("rank").collect()
    return [(r["left_sym"], r["right_sym"]) for r in rows]


def reference_encode(text: str, merges: list[tuple[str, str]], _cache: dict | None = None) -> tuple[int, int]:
    """Independent pure-Python encode (n_words, n_tokens) for one
    text under a merge table applied in rank order — the oracle/test
    twin of bpe_encode_counts; shares NO code with the Spark fold."""
    import re

    words = re.sub(r" +", " ", (text or "").lower()).strip().split(" ")
    cache = _cache if _cache is not None else {}
    total = 0
    for w in words:
        if w not in cache:
            syms = list(w)
            for l, r in merges:
                new, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        new.append(l + r)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            cache[w] = len(syms)
        total += cache[w]
    return len(words), total


def reference_bpe(texts: list[str], k: int = 4) -> list[tuple[int, str, str, int]]:
    """Independent pure-Python BPE used by the oracle builder and the
    property tests — shares NO code with the Spark path."""
    import re
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in re.sub(r" +", " ", (t or "").lower()).strip().split(" "):
            vocab[w] += 1
    words = {w: list(w) for w in vocab}

    merges = []
    for rank in range(1, k + 1):
        counts: Counter = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), cnt = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, l, r, cnt))
        for w, syms in words.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    return merges
