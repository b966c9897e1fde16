"""Relational core: joins, set ops, aggregates from the reference.

Each function documents its reference site and its scale behavior.
All are single-expression Catalyst plans — no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def anti_join(df: DataFrame, exclude: DataFrame, on: str | list[str]) -> DataFrame:
    """Worklist minus exclusion list (reference J1).

    Reference: ``set(all_ids) - set(everyone_ids)`` at
    okta-sync/main.py:1002-1005 — a driver-side set difference.
    Spark-first: LEFT ANTI join. The exclusion side is tiny (a few
    "everyone" ids), so Catalyst broadcasts it — no shuffle of the
    big side at all.
    """
    return df.join(F.broadcast(exclude), on=on, how="left_anti")


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set union (reference J2: pd.concat().drop_duplicates(),
    okta-sync/main.py:1001). Partial-aggregates before the shuffle."""
    return a.unionByName(b).distinct()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag union / append (reference J3: page-batch concat,
    okta-sync/main.py:293,886). Zero-shuffle: just a plan union."""
    return a.unionByName(b)


def broadcast_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Small-dimension lookup join (reference J4).

    Reference: static dict lookups job_id -> Fabric config
    (dbt-webhook/webhook_utils.py:107-133). Spark-first: broadcast
    hash join — the dim ships to every executor once; the fact table
    never shuffles. This is THE join strategy for config/dimension
    enrichment at 100 TB.
    """
    return facts.join(F.broadcast(dim), on=on, how=how)


def group_having_count(df: DataFrame, keys: Sequence[str], min_count: int) -> DataFrame:
    """GROUP BY keys HAVING COUNT(*) > n (reference A1).

    Reference: ids with >800,000 memberships become excluded
    "everyone" ids (okta-sync/main.py:674-717, SQL at :693-698).
    Spark plans a partial count per partition before the shuffle, so
    the exchange carries one row per (partition, key) — the 800K-row
    hot key costs the same as any other.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > F.lit(min_count))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's hot keys across
    `buckets` sub-keys and explode the small side once per bucket.

    A hot join key (one user producing 1% of a 100 TB event table)
    sends its entire key group to a single reducer in a plain
    shuffle join; AQE's skew-join split helps within a partition but
    cannot split one key. Salting makes the shuffle key
    (key, salt): the hot key's rows spread over `buckets` reducers,
    the small side is replicated `buckets`x (cheap — it's small),
    and the join result is IDENTICAL to the unsalted join for any
    salt assignment, so the salt can be any per-row deterministic
    value. We hash all big-side columns so duplicate rows of a hot
    key still spread.

    Trade-off vs broadcast: use broadcast_lookup when the small side
    fits in executor memory; salting is for the mid-size dim that
    doesn't, joined against a skewed fact.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # right/full would emit each unmatched small-side row once
        # per replica; flip the sides instead
        raise ValueError(f"salted_join does not support how={how!r}")
    salt_big = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    b = big.withColumn("__salt", salt_big)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return b.join(s, on=[on, "__salt"], how=how).drop("__salt")


def watermark_max(df: DataFrame, ts_col: str, predicate=None) -> DataFrame:
    """High-water-mark read (reference A2).

    Reference: latest sync_timestamp per store read back from the
    target table (woo-sync/main.py:26-42,159-179) to push
    ``modified_after`` to the source. Spark: a global MAX — partial
    max per partition then a single-row exchange; with a parquet
    source Catalyst can often answer from footer statistics.
    """
    out = df.filter(predicate) if predicate is not None else df
    return out.agg(F.max(ts_col).alias("watermark"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (beyond-reference operator Spark lacks natively):
    each left row is matched to the LATEST right row with
    right_ts <= left_ts for the same key — inclusive on ties, like
    DuckDB/kdb ASOF JOIN. ``direction="forward"`` flips the match to
    the EARLIEST right row with right_ts >= left_ts (the
    next-event-after join: click -> next purchase, alert -> next
    deploy), implemented as the SAME single-shuffle sorted carry with
    the traversal reversed — ts DESCENDING with right rows still
    first on ties, so the carried struct is always the nearest
    future right row and ties stay inclusive.

    Scale shape: the naive range-join formulation (join on key with
    an inequality, then keep the max right ts per left row) explodes
    to |left_k| * |right_k| rows per key before pruning. This
    formulation is union + sorted window carry instead: tag the
    sides, union, ONE hash shuffle on the key, sort within partitions
    by (ts, side) — right rows first on ties, making the match
    inclusive — and carry the latest right values forward with
    last(ignorenulls). Linear in |left| + |right|, no range
    explosion, AQE-splittable on skewed keys.

    Right columns come back prefixed ``asof_`` (including
    ``asof_<right_ts>``). ``how='inner'`` drops left rows with no
    earlier right row; ``'left'`` keeps them with NULLs. Right rows
    must be unique per (key, ts) — pre-dedup with
    dedupe_keep_latest otherwise (ambiguous matches are a data bug,
    not a tie-break policy).

    Row atomicity: the carried right payload is ONE
    last(struct(all right cols), ignorenulls) — a right row with a
    NULL in some payload column is carried whole, never stitched
    together with an older row's non-NULL value for that column.
    """
    from pyspark.sql import Window

    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join supports backward/forward, got {direction!r}"
        )
    rcols = [c for c in right.columns if c != on]
    lcols = [c for c in left.columns]

    l_side = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c != on],
        F.lit(None)
        .cast(T.StructType([T.StructField(c, right.schema[c].dataType) for c in rcols]))
        .alias("__r"),
    )
    r_side = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one ignorenulls carry of the WHOLE right struct: a struct built
    # by r_side is never NULL (even if its fields are), so the carry
    # always lands on the newest right row as a unit
    carried = l_side.unionByName(r_side).select(
        "__k",
        "__ts",
        "__side",
        *[F.col(c) for c in lcols if c != on],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__k").alias(on),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in (on, left_ts)],
        *[F.col("__r").getField(c).alias(f"asof_{c}") for c in rcols],
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{right_ts}").isNotNull())
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
) -> DataFrame:
    """Interval-overlap join (beyond-reference operator): match every
    pair of rows whose half-open intervals overlap
    (ls < re AND rs < le) — the session-overlap / ad-attribution /
    genomics primitive range_join's point-in-interval shape cannot
    express.

    Scale shape: same binning trick as range_join, but BOTH sides
    explode to the fixed-width bins they cover, the join is a hash
    equi-join on the bin id, and — because two overlapping intervals
    now share EVERY bin their overlap spans — the exact-overlap
    filter is followed by a dedup on the pair's bin-independent
    content... avoided here without a distinct: a pair is emitted
    only from the FIRST bin of the overlap region
    (bin == floor(greatest(ls, rs) / w)), which each pair has exactly
    one of. Fan-out per row = ceil(len / bin_width); pick bin_width
    near the typical interval length."""
    w = F.lit(bin_width)
    lb = F.sequence(
        F.floor(F.col(left_start) / w),
        F.floor((F.col(left_end) - F.lit(1e-9)) / w),
    )
    rb = F.sequence(
        F.floor(F.col(right_start) / w),
        F.floor((F.col(right_end) - F.lit(1e-9)) / w),
    )
    l_ = left.withColumn("__bin", F.explode(lb))
    r_ = right.withColumn("__bin", F.explode(rb))
    overlap_first_bin = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / w
    )
    return (
        l_.join(r_, on="__bin")
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("__bin") == overlap_first_bin)
        )
        .drop("__bin")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
) -> DataFrame:
    """Point-in-interval range join (beyond-reference operator):
    match each point row to every interval row with
    start <= point < end.

    Scale shape: a raw inequality join has no equi-key, so Spark
    executes it as a broadcast-nested-loop — O(|points| * |intervals|)
    compares. Binning restores an equi-key: each interval is exploded
    to the fixed-width bins it covers (fan-out = interval length /
    bin_width, bounded and known), each point computes its single
    bin, and the join is a hash equi-join on the bin id followed by
    the exact containment filter. A point's bin is unique, so a pair
    can only meet in one bin — no post-join dedup. Pick bin_width
    near the typical interval length: ~1 replica per interval and
    ~|matches| join output.
    """
    p_bin = F.floor(F.col(point_col) / F.lit(bin_width))
    i_bins = F.sequence(
        F.floor(F.col(start_col) / F.lit(bin_width)),
        F.floor((F.col(end_col) - F.lit(1e-9)) / F.lit(bin_width)),
    )
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn("__bin", F.explode(i_bins))
    return (
        p.join(i, on="__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bin")
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order,
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group via one ROW_NUMBER window over a per-key
    exchange. ``order`` must end in a unique tiebreaker column so the
    cut at rank k is deterministic under any physical row order.

    Scale note: Spark inserts a WindowGroupLimit (partial top-k per
    input partition) before the shuffle when the window is a
    row_number-filter pattern, so each map task forwards at most k
    rows per group it sees — the reduce-side sort never materializes
    whole groups. For FEW huge groups the alternative rewrite is a
    groupBy + slice(sort_array(collect_list(struct(...))), 1, k)
    partial aggregate.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .withColumn(rank_col, F.col(rank_col).cast("int"))
    )


def tree_root_depth(
    nodes: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_iterations: int = 20,
) -> DataFrame:
    """Flatten a forest: each node's ROOT ancestor and DEPTH, by
    pointer DOUBLING — the directed-hierarchy counterpart of the
    connected-components loop (org charts, bill-of-materials,
    category trees; Spark has no recursive CTE, so this IS the
    scalable traversal).

    State per node: (ptr, dist) initialized to (parent, 1) — roots
    (parent == node) start at (self, 0). Each round follows the
    pointer THROUGH the pointed-to node's own pointer:
    ptr <- ptr(ptr), dist <- dist + dist(ptr), which doubles the
    hop distance covered — a depth-D forest converges in ceil(log2 D)
    rounds, not D. Each round is ONE self-equi-join on the pointer
    key plus a localCheckpoint (bounded lineage, dd8's contract);
    the convergence probe ships one aggregate row per round.
    """
    init = nodes.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("ptr"),
        F.when(F.col(parent_col) == F.col(node_col), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("dist"),
    ).localCheckpoint()

    def probe(df):
        return df.agg(
            F.count("*"),
            F.sum(F.xxhash64("node", "ptr", "dist").cast("decimal(38,0)")),
        ).first()

    state = init
    sig = probe(state)
    for _ in range(max_iterations):
        hop = state.select(
            F.col("node").alias("__n"),
            F.col("ptr").alias("__p"),
            F.col("dist").alias("__d"),
        )
        state = (
            state.join(hop, state["ptr"] == hop["__n"])
            .select(
                "node",
                F.col("__p").alias("ptr"),
                (F.col("dist") + F.col("__d")).alias("dist"),
            )
            .localCheckpoint()
        )
        new_sig = probe(state)
        if new_sig == sig:
            break
        sig = new_sig
    return state.select(
        "node", F.col("ptr").alias("root"), F.col("dist").alias("depth")
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """CDC EXTRACTION between two table snapshots — the inverse of
    the merge protocol (loads.Warehouse.merge_upsert applies a change
    set; this derives one): full outer join on the key, classify each
    key as inserted / deleted / updated, drop unchanged rows.

    Scale shape: ONE co-partitioned shuffle per side (the equi-join
    on the key), the row comparison is a map-side null-safe
    column-equality conjunction (eqNullSafe — NULL == NULL must read
    as unchanged, the classic diff bug), and unchanged keys — the
    overwhelming majority between consecutive loads — are filtered
    before anything else is computed. Emits (keys..., change_type).
    """
    non_keys = [c for c in old.columns if c not in keys]
    assert non_keys == [c for c in new.columns if c not in keys], (
        "snapshot_diff requires identical schemas"
    )
    # presence is detected via marker columns, NOT key nullness: a
    # data row whose key column is NULL would otherwise read as
    # "absent" and be misclassified (and the key join itself is
    # null-safe, so two NULL-keyed rows compare as the same key)
    o = old.withColumn("__in_old", F.lit(True)).alias("o")
    n = new.withColumn("__in_new", F.lit(True)).alias("n")
    cond = None
    for c in keys:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, on=cond, how="full_outer")
    same = F.lit(True)
    for c in non_keys:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(F.col("o.__in_old").isNull(), F.lit("inserted"))
        .when(F.col("n.__in_new").isNull(), F.lit("deleted"))
        .when(~same, F.lit("updated"))
    )
    out_keys = [
        F.when(F.col("o.__in_old").isNotNull(), F.col(f"o.{c}"))
        .otherwise(F.col(f"n.{c}"))
        .alias(c)
        for c in keys
    ]
    return (
        joined.select(*out_keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 18, k: int = 3
) -> DataFrame:
    """Distributed Bloom-filter build: each distinct key sets ``k``
    bits of an ``m_bits``-bit filter; the filter is materialized as
    at most ``m_bits/64`` (word_idx, word) rows via a bit_or partial
    aggregate — a few KB however large the key set, so it broadcasts
    even when the key table itself cannot. Hash family: xxhash64
    over (key, seed) for seed 0..k-1.

    This is the explicit, auditable form of the runtime shuffle
    pruning engines inject automatically (Spark's
    spark.sql.optimizer.runtime.bloomFilter.*): at 100 TB a
    selective dim-side predicate prunes the FACT side's shuffle
    input before the exchange, which is where a shuffle join's cost
    lives. Size ``m_bits`` at ~10 bits per expected distinct key
    for ~1% false positives; false positives only cost unpruned
    rows, never correctness (the downstream join stays exact).

    No distinct on the key side (r14 optimization round): setting a
    Bloom bit is idempotent under bit_or, so duplicate keys produce
    byte-identical words, and the partial (map-side) bit_or already
    collapses every task's output to <= m_bits/64 rows — the ONLY
    exchange this build pays is the bounded word table. A distinct
    would put a full |keys|-row shuffle in front of it (and after a
    localCheckpoint the upstream partitioning is opaque, so even a
    pre-grouped key side re-shuffles); duplicates only cost k cheap
    xxhash64 evaluations map-side."""
    bits = (
        keys.select(key_col)
        .select(
            F.explode(F.array(*[F.lit(s) for s in range(k)])).alias("__s"),
            F.col(key_col),
        )
        .select(
            F.pmod(
                F.xxhash64(F.col(key_col), F.col("__s")), F.lit(m_bits)
            ).alias("__bit")
        )
        .select(
            F.shiftright(F.col("__bit"), 6).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__bit % 64 AS INT))"
            ).alias("__mask"),
        )
    )
    return bits.groupBy("word_idx").agg(F.bit_or("__mask").alias("word"))


def bloom_filter_array(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 18, k: int = 3
) -> list[int]:
    """Densify bloom_build's words into a length-``m_bits/64`` long
    array. The collect is bounded by the PARAMETER (32 KB at the
    default), never by the key count — the same bounded-artifact
    contract as the ANN training sample — and is how engines ship
    runtime bloom filters too: as a literal inside the filter
    expression, not as a join side."""
    words = [0] * (m_bits // 64)
    for r in bloom_build(keys, key_col, m_bits, k).collect():
        words[r["word_idx"]] = r["word"]
    return words


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Drop probe rows whose key is definitely NOT in the Bloom
    filter (same m_bits/k as the build). The word array rides along
    as ONE ArrayType literal and each of the ``k`` probes is pure
    codegen (xxhash64 → element_at → bit_get), so the prune is a
    map-side filter that leaves the probe's partitioning untouched
    and runs BEFORE any exchange the downstream join needs — at
    100 TB that is the whole point: the fact side's non-matching
    rows never enter the shuffle. Survivors are a superset of the
    true matches (false-positive rate set by m_bits/k), so follow
    with the exact join; false positives cost I/O, never
    correctness.

    The bit-set rides as ONE BinaryType literal (the words packed
    little-endian, so global bit b lives at bit b%8 of byte b>>3),
    probed with substr + bit_get. r14 optimization round: the
    previous array<bigint> literal was a pyspark CreateArray of
    m_bits/64 literal children embedded once PER PROBE in the filter
    — a 3 x 4096-element expression tree Janino recompiles on every
    fresh plan, measured 2.2-2.4 s per probe at the default sizing
    vs 0.15 s for the binary literal (identical survivor rows; the
    probed bit is the same bit). A packed constant is also how
    engines ship runtime bloom filters — as an opaque blob, not as
    expression-tree structure."""
    import struct

    packed = F.lit(bytearray(b"".join(struct.pack("<q", w) for w in words)))
    cond = None
    for s in range(k):
        bit = F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(m_bits))
        byte = F.conv(
            F.hex(packed.substr((F.shiftright(bit, 3) + 1).cast("int"), F.lit(1))),
            16,
            10,
        ).cast("int")
        hit = (
            F.call_function("bit_get", byte, F.pmod(bit, F.lit(8)).cast("int"))
            == 1
        )
        cond = hit if cond is None else cond & hit
    return probe.filter(cond)


def skyline(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    id_col: str,
) -> DataFrame:
    """Pareto frontier (skyline): the rows no other row dominates,
    where q dominates p iff q.minimize <= p.minimize AND
    q.maximize >= p.maximize with at least one strict. Returns one
    row per frontier CELL (minimize, maximize) with the member count
    and a representative min id — duplicates of a frontier cell are
    all on the frontier (no strict edge between them).

    Scale shape — never the O(n²) nested loop and never a global
    per-row sort: rows collapse to distinct (min,max) CELLS with one
    partial-aggregated shuffle; cells collapse to one max per
    distinct minimize-value; the running "best maximize among
    strictly cheaper values" is a distributed prefix-cummax over 256
    range buckets (bucket totals on one tiny partition, within-bucket
    windows bucket-parallel — the sampling prefix-sum shape). A cell
    is on the frontier iff it is its price-level's best AND beats
    every strictly-cheaper level's best. The per-row table is
    touched exactly once.

    NULL dimensions are excluded up front: SQL dominance (the NOT
    EXISTS oracle form) makes a NULL-dim row incomparable — it never
    dominates and is never dominated — which is rarely the wanted
    frontier, and letting NULLs through here would be worse than
    either semantics (floor(NULL) skips out of least() and lands the
    row in the top bucket, where its __best_here wrongly dominates
    real levels). Callers wanting incomparable rows reported append
    them separately."""
    from pyspark.sql import Window

    df = df.filter(
        F.col(minimize_col).isNotNull() & F.col(maximize_col).isNotNull()
    )
    cells = df.groupBy(minimize_col, maximize_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min(id_col).alias("min_id"),
    )
    levels = cells.groupBy(minimize_col).agg(
        F.max(maximize_col).alias("__best_here")
    )
    ext = levels.agg(
        F.min(minimize_col).cast("double").alias("__lo"),
        F.max(minimize_col).cast("double").alias("__hi"),
    )
    bucketed = levels.crossJoin(F.broadcast(ext)).withColumn(
        "__b",
        F.least(
            F.lit(255),
            F.floor(
                (F.col(minimize_col) - F.col("__lo"))
                * 256.0
                / (F.col("__hi") - F.col("__lo") + 1e-9)
            ),
        ).cast("int"),
    )
    btot = bucketed.groupBy("__b").agg(F.max("__best_here").alias("__bbest"))
    # <=256 rows by construction (bucket totals): bounded, never
    # data-sized — the 256-bucket prefix discipline (the ~16
    # WindowExec warnings this emits are over this table only)
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    bprev = btot.withColumn("__before_b", F.max("__bbest").over(wb)).select(
        "__b", "__before_b"
    )
    ww = (
        Window.partitionBy("__b")
        .orderBy(minimize_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lv = (
        bucketed.join(F.broadcast(bprev), "__b")
        .withColumn(
            "__best_cheaper",
            # greatest() skips NULLs (first level in bucket / first
            # bucket), returning NULL only when both sides are —
            # exactly "no strictly cheaper level exists".
            F.greatest(
                F.max("__best_here").over(ww), F.col("__before_b")
            ),
        )
        .select(minimize_col, "__best_here", "__best_cheaper")
    )
    return (
        cells.join(lv, minimize_col)
        .filter(
            (F.col(maximize_col) == F.col("__best_here"))
            & (
                F.col("__best_cheaper").isNull()
                | (F.col("__best_cheaper") < F.col(maximize_col))
            )
        )
        .select(minimize_col, maximize_col, "n_members", "min_id")
    )
