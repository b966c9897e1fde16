"""Keyed dedup operators — the reference's flagship transformation.

The reference dedupes staging tables with a generated BigQuery
``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY lastUpdated DESC,
created DESC)`` statement, config-driven per table (composite keys
for member tables): okta-sync/main.py:24-30 (DEDUP_CONFIG) and
:628-671 (SQL template). Full-row distinct is okta-sync/main.py:889.
Superseded-run dedup (latest event per job wins) is
docs/ARCHITECTURE.md:94,107.

Spark-first shape: a single window + row_number + filter. At scale
this is ONE hash-partition shuffle on the dedup keys; Spark's
window exec sorts within partitions only. With AQE skew handling on,
a hot key (the reference's 800K-member "everyone" group) gets split
at runtime. No driver-side state, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Per-table dedup config, mirroring okta-sync/main.py:24-30: table ->
# (partition keys, ordering columns latest-first).
DEDUP_CONFIG: dict[str, tuple[list[str], list[str]]] = {
    "okta_users": (["id"], ["lastUpdated", "created"]),
    "okta_apps": (["id"], ["lastUpdated", "created"]),
    "okta_groups": (["id"], ["lastUpdated", "created"]),
    "okta_group_members": (["group_id", "id"], ["lastUpdated", "created"]),
    "okta_app_users": (["app_id", "id"], ["lastUpdated", "created"]),
}


def dedupe_keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    tiebreaker: str | None = None,
) -> DataFrame:
    """Keep the newest row per key group (reference W1).

    order_by columns are ranked newest-first (DESC). ``tiebreaker``
    adds a final deterministic ASC column so results are stable when
    order_by ties — required for oracle-reproducible output in a
    distributed engine (the reference relies on BigQuery's own
    nondeterministic tie behavior; we do better).
    """
    ordering = [F.col(c).desc() if isinstance(c, str) else c.desc() for c in order_by]
    if tiebreaker is not None:
        ordering.append(F.col(tiebreaker).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_rows(df: DataFrame) -> DataFrame:
    """Full-row distinct (reference W2: drop_duplicates / SELECT DISTINCT *).

    Spark plans this as a partial (map-side) aggregate + shuffle +
    final aggregate, so duplicate-heavy inputs shrink before the
    exchange — exactly what you want at 100 TB.
    """
    return df.distinct()


def superseded_latest(df: DataFrame, key: str, ts_col: str, tiebreaker: str | None = None) -> DataFrame:
    """Latest event per key wins (reference W4 superseded-run dedup).

    The retry workflow skips a retry when a newer run exists for the
    job (docs/ARCHITECTURE.md:94,107) — i.e. keep-latest keyed on
    job_id ordered by created_at.
    """
    return dedupe_keep_latest(df, [key], [ts_col], tiebreaker=tiebreaker)
