"""Relational core: joins, set ops, aggregates from the reference.

Each function documents its reference site and its scale behavior.
All are single-expression Catalyst plans — no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
