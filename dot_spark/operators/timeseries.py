"""Time-series operators: native session windows, gap-fill with
last-observation-carried-forward, and SCD Type-2 history building.

These complement the manual lag+cumsum sessionization in
``operators/sampling.py`` (w6): `session_window_agg` uses Spark's
native ``F.session_window`` operator — the same code path a
Structured Streaming job uses (state-store merging of overlapping
sessions) — so its batch form here is the semantics a streaming
deployment would produce, verified against a SQL oracle.

Reference parity: the reference's hypertable-style rollups
(dbt-classify/classifier.py aggregation windows and the watermark
scans in woo-sync/main.py:242-268) bucket event time and tolerate
gaps; `gapfill_locf` is the standard dense-grid + carry-forward pass
an analytics engine layers on top. `scd2_history` is the classic
warehouse dimension-history build (validity intervals from a change
stream) — the reference materializes only current state
(okta-sync/main.py:628-671 keep-latest); SCD2 is its auditable twin.

Scale shapes (100 TB):
- session_window_agg: one shuffle on the grouping key; session
  merging happens inside the aggregation operator (no window pass).
- gapfill_locf: the dense grid is generated per key from that key's
  own [min, max] span (explode of a sequence — no driver loop, no
  cross join against a global calendar), then ONE per-key window
  pass carries values forward. Grid size is keys x span-hours,
  independent of event count.
- scd2_history: two window passes over the SAME per-key exchange
  (change detection, then interval close) — one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_window_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Native Spark session windows: events closer than ``gap`` merge
    into one session; the window end is last-event-time + gap
    (end-EXCLUSIVE — an event landing exactly at the boundary starts
    a NEW session, which is Spark's documented merge rule and what
    the oracle mirrors with ``diff >= gap``).

    Differs from sampling.sessionize (w6) by construction: this is
    the session-window AGGREGATION operator (mergeable partial
    sessions, usable unchanged under Structured Streaming with a
    watermark), not a lag+cumsum window chain.
    """
    return (
        df.groupBy(key_col, F.session_window(ts_col, gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end_excl"),
            "n_events",
            "sum_value",
        )
    )


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Dense time grid per key with last-observation-carried-forward.

    1. bucket observations to `bucket` granularity, aggregating the
       value (SUM, rounded — the rounding happens BEFORE the carry so
       a forwarded value is bit-identical to the observed one);
    2. per key, explode ``sequence(min_bucket, max_bucket, 1 bucket)``
       into the dense grid (each key generates only its own span);
    3. left-join observations onto the grid and carry the last
       non-null value forward with one ``last(ignorenulls)`` window.

    Output: (key, bucket, observed, filled_value). ``filled_value``
    is never null because each key's grid starts at its first
    observation.
    """
    obs = (
        df.groupBy(
            F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
        )
        .agg(F.round(F.sum(value_col), 2).alias("bucket_value"))
    )
    step = F.expr(f"INTERVAL 1 {bucket}")
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias("bucket"),
        )
    )
    joined = grid.join(obs, [key_col, "bucket"], "left")
    w = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return joined.select(
        key_col,
        "bucket",
        F.col("bucket_value").isNotNull().alias("observed"),
        F.last("bucket_value", ignorenulls=True).over(w).alias("filled_value"),
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 history from a change stream.

    Collapses consecutive events carrying the SAME attribute value
    (only genuine changes open a new version), then closes each
    version's validity interval with the next change's timestamp:
    (key, attr, valid_from, valid_to, is_current) where valid_to is
    NULL for the open (current) version.

    Both window passes — change detection (lag) and interval close
    (lead over the filtered changes) — share one per-key exchange.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    changes = (
        df.select(key_col, ts_col, tiebreak_col, attr_col)
        .withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
    )
    return changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
