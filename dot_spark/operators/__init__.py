from dot_spark.operators.dedup import dedupe_keep_latest, distinct_rows, superseded_latest
from dot_spark.operators.relational import (
    anti_join,
    broadcast_lookup,
    group_having_count,
    union_all,
    union_distinct,
    watermark_max,
)

__all__ = [
    "anti_join",
    "broadcast_lookup",
    "dedupe_keep_latest",
    "distinct_rows",
    "group_having_count",
    "superseded_latest",
    "union_all",
    "union_distinct",
    "watermark_max",
]
