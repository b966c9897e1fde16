"""Deterministic sampling + sessionization operators.

Sampling by hash threshold (not `df.sample`): a training-data
pipeline needs samples that are REPRODUCIBLE across runs, engines,
and partitionings — `rand()` is none of those. Hashing a stable key
and thresholding a byte of the digest gives the same sample on any
engine that can compute md5 (including the DuckDB oracle), survives
repartitioning, and never needs a seed file.

Sessionization is the classic gap-based window pass (lag + cumulative
sum), the shape every event-analytics engine uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_byte(col, pos: int = 0):
    """Byte `pos` (0-255) of md5(CAST(col AS STRING)) — the portable
    deterministic uniform hash both Spark and the oracle compute."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), pos * 2 + 1, 2), 16, 10).cast("int")


def hash_sample(df: DataFrame, key_col: str, keep_bytes: int = 26) -> DataFrame:
    """Keep rows whose hash byte < keep_bytes (keep_bytes/256 ≈ the
    sampling rate; 26 -> ~10.2%). A pure filter: pushes past joins,
    costs one hash per row, zero shuffle, fully reproducible."""
    return df.filter(hash_byte(key_col) < keep_bytes)


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, int]
) -> DataFrame:
    """Per-stratum hash sampling: `rates` maps stratum value ->
    keep_bytes threshold (0-256). Strata not listed are dropped —
    the explicit-allowlist form a corpus-mixing pipeline wants.
    Implemented as one CASE expression over the broadcast-small rate
    map: still a pure filter, zero shuffle."""
    b = hash_byte(key_col)
    # fold from a lit(0) base so an empty rates map means "drop
    # everything" (b < 0 is never true) instead of crashing
    thr = F.lit(0)
    for val, keep in rates.items():
        thr = F.when(F.col(strata_col) == val, F.lit(keep)).otherwise(thr)
    return df.filter(b < thr)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_bytes: int = 13,
    test_bytes: int = 13,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic 3-way corpus split by hash byte: the first
    ``test_bytes``/256 of the hash space is 'test', the next
    ``val_bytes``/256 'val', the rest 'train' (defaults ≈ 5%/5%/90%).
    A pure per-row expression — reproducible across runs, engines,
    and physical partitioning (the property a training split MUST
    have: re-running the pipeline can never leak a test doc into
    train), zero shuffle, and membership is decidable for one key
    without the corpus."""
    b = hash_byte(key_col)
    split = (
        F.when(b < test_bytes, "test")
        .when(b < test_bytes + val_bytes, "val")
        .otherwise("train")
    )
    return df.withColumn(out_col, split)


def token_budget_sample(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic subsample up to a total weight budget ("take a
    10B-token subsample"): docs are ranked by md5(key) (a stable
    shuffle of the corpus), and every doc whose RUNNING weight total
    fits the budget is kept, with the running total emitted as
    ``cum_weight``.

    Scale shape — a global running sum with NO global sort: the
    classic distributed prefix sum. Docs land in 256 hash buckets
    (the md5's first byte, so bucket order == global md5-hex order);
    per-bucket totals (256 rows) cumsum on a single tiny partition;
    each bucket's preceding-total broadcasts back; the within-bucket
    running sum is a window partitioned BY BUCKET — 256-way parallel,
    never one global ordering partition. A naive
    ``SUM OVER (ORDER BY hash)`` window funnels the whole corpus
    through one task; this funnels 256 scalar rows.
    """
    from pyspark.sql import Window

    hexed = df.withColumn("__hx", F.md5(F.col(key_col).cast("string")))
    bucketed = hexed.withColumn("__b", hash_byte(key_col))
    totals = bucketed.groupBy("__b").agg(F.sum(weight_col).alias("__bt"))
    # 256 rows: the single-partition window is over bucket TOTALS,
    # never rows
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.withColumn(
        "__before", F.coalesce(F.sum("__bt").over(wb), F.lit(0))
    ).select("__b", "__before")
    ww = Window.partitionBy("__b").orderBy("__hx", key_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # LEFT join back (not inner): an inner join on the derived __b
    # pushes isnotnull(__b) below the projection, where Catalyst
    # substitutes the key's expression chain into the filter — benign
    # here (one extra md5/row) but 5x on a deep chain, measured on
    # layout.ranked_by (the Morton key). The same 256-bucket prefix
    # shape lives in pack_sequences below, layout.ranked_by, and
    # relational.skyline (cummax variant) — keep the join rule in
    # sync across all four.
    out = (
        bucketed.join(F.broadcast(prefix), "__b", "left")
        .withColumn(
            "cum_weight",
            F.coalesce(F.col("__before"), F.lit(0))
            + F.sum(weight_col).over(ww),
        )
        .filter(F.col("cum_weight") <= budget)
    )
    return out.drop("__hx", "__b", "__before")


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session indexes per key: a new session starts
    when the time since the previous event (per key) exceeds the gap.
    session_idx is the running count of session starts — the
    lag + cumulative-sum formulation, two window passes over ONE
    partitioning (single shuffle on key_col; both windows reuse it).
    Ties on ts are ordered by `tiebreak_col` so the assignment is
    deterministic under distributed execution."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    prev_ts = F.lag(ts_col).over(w)

    # Gap arithmetic legal for TIMESTAMP and TIMESTAMP_NTZ alike,
    # with NO zone dependence: timestamp subtraction yields a
    # day-time interval for both types (absolute elapsed time for
    # TIMESTAMP, wall-clock difference for NTZ), compared against an
    # interval literal. A cast-based normalization would distort NTZ
    # differences across DST transitions on non-UTC sessions.
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTE")
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) - prev_ts > gap),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def hash_frac16(col):
    """16-bit hash value (0-65535) from the first two md5 bytes —
    finer-grained than hash_byte for probability thresholds that need
    better than 1/256 resolution. Portable: the oracle computes the
    same two hex-nibble bytes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")


def mixture_resample(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-balanced mixture resampling: every group is
    down-sampled to the SMALLEST group's token budget (keep_rate =
    min_total / group_total) — the static mixture-reweighting pass a
    corpus build runs before training. Returns the kept rows with
    (id, group, n_toks, keep_rate).

    Scale shape: per-group totals are one partial-agg shuffle; the
    min is a window over the |groups|-row aggregate (the a20 rule);
    the tiny rate table broadcasts back; the keep decision is the
    deterministic 16-bit hash fraction (weighted_hash_sample) — a
    pure pushable filter, reproducible across runs, engines, and
    partitionings."""
    from pyspark.sql import Window

    from dot_spark.operators.textdedup import normalize_text

    toks = docs.select(
        id_col,
        group_col,
        F.size(F.split(normalize_text(F.col(text_col)), " ")).alias("n_toks"),
    )
    totals = toks.groupBy(group_col).agg(F.sum("n_toks").alias("total_toks"))
    rates = totals.select(
        group_col,
        (
            F.min("total_toks").over(Window.partitionBy()) / F.col("total_toks")
        ).alias("keep_rate"),
    )
    return weighted_hash_sample(
        toks.join(F.broadcast(rates), on=group_col), id_col, "keep_rate"
    )


def temperature_mixture(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-flattened mixture sampling — the alpha-sampling
    data-mixing rule (mC4 / XLM-R, Conneau et al. 2020: sample
    sources with probability q_i proportional to p_i^alpha, so
    low-resource sources are up-weighted relative to their natural
    share). Sampling WITHOUT replacement pins the realized budget at
    N = min_j total_j / q_j (the largest output where no source is
    oversampled), and the normalizer cancels into the closed form

        keep_rate_i = (min_total / total_i) ^ (1 - alpha)

    alpha=0 degenerates to mixture_resample's equal-budget rule,
    alpha=1 to the natural mixture (keep everything). The default
    alpha=0.5 evaluates as sqrt(min_total/total_i): IEEE 754 requires
    division AND sqrt correctly rounded, so both engines of an oracle
    pair derive bit-identical rates with no pow-ulp or
    summation-order exposure — which is why 0.5 is the gated value.

    Scale shape: identical to mixture_resample — one partial-agg
    shuffle for per-group totals, the min via a window over the
    |groups|-row aggregate (the a20 rule), the tiny rate table
    broadcast back, and the keep decision the deterministic 16-bit
    hash fraction (pure pushable filter). Returns kept rows with
    (id, group, n_toks, keep_rate)."""
    from pyspark.sql import Window

    from dot_spark.operators.textdedup import normalize_text

    toks = docs.select(
        id_col,
        group_col,
        F.size(F.split(normalize_text(F.col(text_col)), " ")).alias("n_toks"),
    )
    totals = toks.groupBy(group_col).agg(F.sum("n_toks").alias("total_toks"))
    ratio = F.min("total_toks").over(Window.partitionBy()) / F.col(
        "total_toks"
    )
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, 1.0 - alpha)
    rates = totals.select(group_col, rate.alias("keep_rate"))
    return weighted_hash_sample(
        toks.join(F.broadcast(rates), on=group_col), id_col, "keep_rate"
    )


def weighted_hash_sample(df: DataFrame, key_col: str, weight_col) -> DataFrame:
    """Importance-weighted deterministic sampling: keep each row with
    probability `weight` (a column expression in [0, 1]) by comparing
    its 16-bit hash fraction against weight * 65536. Same guarantees
    as hash_sample (reproducible across runs/engines/partitionings,
    pure pushable filter, zero shuffle) with a per-row inclusion
    probability — the quality-weighted downsampling pass a corpus
    mixing pipeline runs."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.filter(hash_frac16(key_col) < w * F.lit(65536.0))


def corpus_shuffle(df: DataFrame, key_col: str, out_col: str = "pos") -> DataFrame:
    """Reproducible global permutation: each row's 1-based position in
    md5(key) order — "shuffle the corpus identically every run".

    Scale shape: positions come from the token_budget_sample
    distributed prefix sum with unit weights (256 hash buckets,
    bucket totals cumsum on one tiny partition, per-bucket windows) —
    never a single global-ordering window. Bucket order is the md5
    hex prefix, so within-bucket (hex, key) order composes to the
    exact global md5 order the oracle states.
    """
    numbered = token_budget_sample(
        df.withColumn("__one", F.lit(1).cast("long")),
        budget=1 << 62,
        weight_col="__one",
        key_col=key_col,
    )
    return numbered.withColumnRenamed("cum_weight", out_col).drop("__one")


def pack_sequences(
    df: DataFrame,
    window: int = 2048,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for training-data loaders (the concat-and-
    chop scheme every GPT-style pipeline uses): documents are laid
    out in a stable md5-shuffled order as ONE virtual token stream,
    and the stream is chopped into fixed ``window``-sized contexts.
    Each doc's placement is pure arithmetic on its EXCLUSIVE running
    prefix: start_pos, first_bin, offset_in_bin, last_bin (docs may
    straddle bins — that is the point of packing; padding waste is
    zero by construction).

    Scale shape: the token_budget_sample prefix sum verbatim — 256
    md5-byte buckets, a single-partition window over the 256 bucket
    TOTALS only, broadcast of each bucket's preceding total, and a
    bucket-parallel within-bucket running sum. No global sort, no
    single-partition data window; the oracle states the same layout
    as one global-order cumsum, which is fine single-node and
    exactly the plan Spark must avoid."""
    from pyspark.sql import Window

    hexed = df.withColumn("__hx", F.md5(F.col(key_col).cast("string")))
    bucketed = hexed.withColumn("__b", hash_byte(key_col))
    totals = bucketed.groupBy("__b").agg(F.sum(weight_col).alias("__bt"))
    # <=256 rows by construction (bucket totals): the unpartitioned
    # window is the documented 256-bucket prefix discipline, bounded,
    # never data-sized
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.withColumn(
        "__before", F.coalesce(F.sum("__bt").over(wb), F.lit(0))
    ).select("__b", "__before")
    ww = Window.partitionBy("__b").orderBy("__hx", key_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # left join on the derived key — see the rule note in
    # token_budget_sample above (same shape, same reason)
    cum = (
        bucketed.join(F.broadcast(prefix), "__b", "left")
        .withColumn(
            "__start",
            (
                F.coalesce(F.col("__before"), F.lit(0))
                + F.sum(weight_col).over(ww)
                - F.col(weight_col)
            ).cast("long"),
        )
    )
    return cum.select(
        key_col,
        F.col(weight_col).cast("long").alias("n_tokens"),
        F.col("__start").alias("start_pos"),
        F.floor(F.col("__start") / window).alias("first_bin"),
        (F.col("__start") % window).alias("offset_in_bin"),
        F.floor((F.col("__start") + F.col(weight_col) - 1) / window).alias(
            "last_bin"
        ),
    )


def es_key(key_col: str, weight_col) -> Column:
    """The Efraimidis-Spirakis ranking key as a reusable expression:
    round(ln(u)/w, 6) with u the deterministic md5-uniform in (0, 1]
    derived from ``key_col``. Exposed so callers that want the key in
    their OUTPUT (p21's oracle mirrors it) compute the identical
    expression instead of relying on the operator leaking a column.
    """
    from dot_spark.operators.text import hash_unit

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (hash_unit(F.col(key_col).cast("string")).cast("double") + 1.0) / F.lit(
        4294967296.0
    )
    return F.round(F.log(u) / w, 6)


def weighted_topk_sample(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact size k
    (Efraimidis-Spirakis 2006): each row draws the deterministic
    md5-uniform u in (0, 1] and the k rows with the largest
    u^(1/w) — equivalently the largest ln(u)/w, computed in log
    space so tiny weights can't underflow — win. One pass, no
    per-round re-draws; p14's Bernoulli form yields a BINOMIAL
    sample size, this yields exactly k (the reservoir semantics a
    fixed token budget needs). The output schema is the INPUT schema
    — the ranking key is an ordering expression, not a column, so it
    cannot collide with or leak into caller columns (compute
    ``es_key(...)`` explicitly if the key itself is wanted).

    Scale shape: the es_key is a pure row-local expression; the
    global top-k compiles to TakeOrderedAndProject (per-partition
    top-k, then a k-row driver merge) — no global sort, no full
    shuffle, same as a17_global_topk. Deterministic across
    runs/engines/partitionings: u is hash-derived (the +1 keeps u
    strictly positive so ln is finite) and ties break on the key
    column.

    DETERMINISM-vs-EXACTNESS TRADE (deliberate): the key rounds to
    6 dp before ranking so both engines of the oracle pair order
    identical doubles even where ln() differs by an ulp. Near u ~ 1
    the unrounded key spacing (~2e-10 for unit weights) is far below
    1e-6, so statistically-distinct keys can TIE at the boundary and
    fall back to ascending ``key_col`` order — a deterministic bias
    toward low key ids among boundary ties relative to exact
    Efraimidis-Spirakis. The bias touches only rows whose true keys
    agree to 6 dp (a vanishing fraction of the top-k for k much
    smaller than the population); reproducibility across engines,
    runs, and partitionings is worth more to a corpus-selection
    pipeline than the last 1e-6 of sampling exactness.

    Rows with weight <= 0 are EXCLUDED before ranking (their E-S
    selection probability is zero; without the filter a zero weight
    divides by zero into a NULL key that sorts unpredictably, and a
    negative weight flips ln(u)/w positive and would outrank every
    valid row). Callers wanting different semantics clamp the
    weight expression first.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return (
        df.filter(w > 0)
        .orderBy(es_key(key_col, weight_col).desc(), F.col(key_col))
        .limit(k)
    )
