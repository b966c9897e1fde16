"""Operator inventory queries + DuckDB oracle SQL (driver contract).

One entry per implemented operator from SURVEY.md §2. Each Spark
query is a function (spark, sf_dir) -> DataFrame built from the
dot_spark operator modules; ORACLE[name] is the ANSI-SQL equivalent
DuckDB runs on the same parquet tables.

Correctness rules observed throughout:
- every computed column is aliased identically on both sides;
- sums of integers are CAST(.. AS BIGINT) in the oracle (DuckDB
  SUM(int) returns HUGEINT which pandas would widen differently);
- double aggregates are ROUND(.., 2) on both sides so floating-point
  summation order (which legitimately differs between a distributed
  partial-aggregate and DuckDB's single stream) cannot flip the hash;
- ties in window orderings always carry a unique tiebreaker column so
  results are deterministic in a distributed engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dot_spark.operators.dedup import dedupe_keep_latest, distinct_rows, superseded_latest
from dot_spark.operators.relational import (
    anti_join,
    broadcast_lookup,
    group_having_count,
    union_all,
    union_distinct,
    watermark_max,
)
from dot_spark.schema import align_schema, normalize_sentinels, with_defaults
from dot_spark.sources.registry import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.1 Scans (S1-S6) — expressed as pushdown-verified parquet scans
# ---------------------------------------------------------------------------


@query(
    "s1_scan_projection",
    """
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def s1_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated source scan ≈ filtered+projected table scan (S1/S2/S5).

    Reference: okta-sync/main.py:233-305 streams pages with a
    server-side filter; Spark-first the filter and the 4-column
    projection are pushed into the parquet reader (PushedFilters +
    ReadSchema in the plan) — at 100 TB only the matching row groups
    and 4 columns are read.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@query(
    "s6_sql_source",
    """
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def s6_sql_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc SQL source (S6: query_bigquery_as_dataframe,
    okta-sync/okta_sync_utils.py:361-395) — spark.sql over a view."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_total
        FROM orders_v GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates (P1-P9)
# ---------------------------------------------------------------------------


@query(
    "p1_schema_align",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(c_name AS VARCHAR) AS c_name,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(NULL AS VARCHAR) AS c_phone
    FROM customer
    """,
)
def p1_schema_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-align projection (P1: match_schema, okta-sync/main.py:544-584).

    Casts matching columns, adds the missing c_phone as typed NULL,
    drops extras (c_acctbal, c_mktsegment). Catalyst prunes the
    dropped columns out of the parquet scan."""
    cust = load_table(spark, "customer", sf_dir)
    return align_schema(
        cust,
        {"c_custkey": "bigint", "c_name": "string", "c_nationkey": "bigint", "c_phone": "string"},
    )


@query(
    "p4_filter_gate",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def p4_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type gate (P4: dbt-webhook/main.py:298-303)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "p5_status_route",
    """
    SELECT event_id, user_id,
           CASE WHEN event_type = 'error' THEN 'retry'
                WHEN event_type IN ('purchase', 'signup') THEN 'completed'
                ELSE 'ignore' END AS route
    FROM events
    """,
)
def p5_status_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status routing predicate (P5: dbt-webhook/main.py:307-319) —
    failure -> retry topic, success -> completed topic, else ignore."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", F.lit("retry"))
        .when(F.col("event_type").isin("purchase", "signup"), F.lit("completed"))
        .otherwise(F.lit("ignore"))
        .alias("route"),
    )


@query(
    "p6_isin_filter",
    """
    SELECT o_orderkey, o_custkey, o_orderpriority
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def p6_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-id IN-list fan-out filter (P6: webhook_utils.py:115-127)."""
    o = load_table(spark, "orders", sf_dir)
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )


@query(
    "p7_sentinel_null",
    """
    SELECT doc_id,
           CASE WHEN source IN ('', 'NULL', 'n/a', 'src0') THEN NULL
                ELSE source END AS source_norm
    FROM documents
    """,
)
def p7_sentinel_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/sentinel normalization (P7: woo-sync/main.py:272-273,
    process-geography/main.py:115-137 — the NA-list that keeps 'NA')."""
    docs = load_table(spark, "documents", sf_dir)
    out = normalize_sentinels(
        docs.select("doc_id", "source"),
        columns=["source"],
        na_tokens=("", "NULL", "n/a", "src0"),
        extra_sentinels=(),
    )
    return out.withColumnRenamed("source", "source_norm")


@query(
    "p8_coalesce_defaults",
    """
    SELECT doc_id,
           COALESCE(CASE WHEN source = 'src0' THEN NULL ELSE source END,
                    'WEB') AS source_or_default
    FROM documents
    """,
)
def p8_coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defaulted field extraction (P8: .get(key, default) chains,
    woo-sync/main.py:699-702; order_origin default 'WEB' :637-641)."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.when(F.col("source") == "src0", F.lit(None))
        .otherwise(F.col("source"))
        .alias("source_or_default"),
    )
    return with_defaults(docs, {"source_or_default": "WEB"})


@query(
    "p9_string_norm",
    """
    SELECT c_custkey, UPPER(c_name) AS name_upper,
           TRIM(c_mktsegment) AS seg_trim,
           SUBSTRING(c_name, 1, 8) AS name_prefix
    FROM customer
    """,
)
def p9_string_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String normalization (P9/F5: title/strip/slice,
    woo-sync/main.py:939-940, okta-sync/main.py:989-993)."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


# ---------------------------------------------------------------------------
# §2.4 Joins / set ops (J1-J5)
# ---------------------------------------------------------------------------


@query(
    "j1_anti_join",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def j1_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join worklist exclusion (J1: okta-sync/main.py:1002-1005).

    LEFT ANTI with the exclusion side broadcast — the big side never
    shuffles."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_nationkey")
    ords = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    return anti_join(cust, ords, on="c_custkey")


@query(
    "j2_union_distinct",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def j2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (J2: okta-sync/main.py:1001)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return union_distinct(clicks, views)


@query(
    "j3_union_all",
    """
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
    """,
)
def j3_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union / append (J3: okta-sync/main.py:293,886)."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "event_type")
    return union_all(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "signup"),
    )


@query(
    "j4_broadcast_lookup",
    """
    SELECT c_custkey, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j4_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension lookup (J4: webhook_utils.py:107-133).

    nation/region are tiny dims: both ship as broadcast hash joins,
    zero shuffle of the customer side."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation_name"), "n_regionkey"
    )
    region = load_table(spark, "region", sf_dir).select(
        F.col("r_regionkey").alias("n_regionkey"), F.col("r_name").alias("region_name")
    )
    out = broadcast_lookup(cust, nation, on="c_nationkey")
    out = broadcast_lookup(out, region, on="n_regionkey")
    return out.select("c_custkey", "nation_name", "region_name")


@query(
    "j5_parent_child_join",
    """
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
           l.l_linenumber, l.l_quantity, l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def j5_parent_child_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child key propagation as an equi-join (J5:
    okta-sync/main.py:478-479, woo-sync/main.py:693-697).

    Both sides shuffle on the join key (sort-merge / shuffled hash by
    AQE's choice); at warehouse scale orders/lineitem would be
    bucketed on orderkey to make this exchange-free."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate", "o_totalprice")
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return o.join(li, on="o_orderkey").select(
        "o_orderkey", "o_orderdate", "o_totalprice", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# §2.5 Aggregations (A1-A5)
# ---------------------------------------------------------------------------


@query(
    "a1_group_having",
    """
    SELECT user_id, COUNT(*) AS cnt
    FROM events GROUP BY user_id HAVING COUNT(*) > 70
    """,
)
def a1_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING count threshold (A1: the 800K-member
    "everyone" detector, okta-sync/main.py:674-717)."""
    ev = load_table(spark, "events", sf_dir)
    return group_having_count(ev, ["user_id"], 70)


@query(
    "a2_watermark_max",
    """
    SELECT MAX(date_trunc('microseconds', ts)) AS watermark FROM events WHERE event_type = 'purchase'
    """,
)
def a2_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark high-water-mark read (A2: woo-sync/main.py:26-42)."""
    ev = load_table(spark, "events", sf_dir)
    return watermark_max(ev, "ts", F.col("event_type") == "purchase")


@query(
    "a3_conditional_agg",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN value > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def a3_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tally aggregation over classified rows (A3:
    dbt-classify/classifier.py:56-79)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("value") > 10, 1).otherwise(0)).cast("bigint").alias("n_high"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "a4_count_predicate",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
    FROM events GROUP BY user_id
    """,
)
def a4_count_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count with predicate (A4: count_failed_steps,
    dbt-classify/classifier.py:50-53)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors")
    )


@query(
    "a5_collect_sorted_list",
    """
    SELECT user_id,
           STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS event_types
    FROM events GROUP BY user_id
    """,
)
def a5_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List materialization (A5: okta-sync/main.py:705,747 worklists).

    collect_set + array_sort + array_join keeps the result
    deterministic (a raw collect_list is partition-order dependent —
    not acceptable in a distributed engine)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types")
    )


# ---------------------------------------------------------------------------
# §2.6 Windows & dedup (W1-W4)
# ---------------------------------------------------------------------------


@query(
    "w1_dedup_keep_latest",
    """
    SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value FROM (
        SELECT e.*, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events e
    ) WHERE rn = 1
    """,
)
def w1_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed keep-latest dedup (W1 — the reference's flagship
    operator, okta-sync/main.py:628-671): one row per
    (user_id, event_type), newest ts wins, event_id breaks ties."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return dedupe_keep_latest(ev, ["user_id", "event_type"], ["ts", "event_id"])


@query(
    "w2_distinct_rows",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def w2_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row distinct (W2: okta-sync/main.py:889,1017)."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type")
    return distinct_rows(ev)


@query(
    "w3_sort_limit_top1",
    """
    SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
)
def w3_sort_limit_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit top-1 (W3: woo-sync/main.py:26-33).

    Spark plans a TakeOrderedAndProject — per-partition top-1 then a
    driver merge of N candidates; no global sort materializes."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "user_id", "event_type")
    return ev.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(1)


@query(
    "w4_superseded_dedup",
    """
    SELECT user_id, event_id AS latest_event_id, date_trunc('microseconds', ts) AS latest_ts FROM (
        SELECT e.*, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events e
    ) WHERE rn = 1
    """,
)
def w4_superseded_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Superseded-run dedup — latest event per key wins (W4:
    docs/ARCHITECTURE.md:94,107)."""
    ev = load_table(spark, "events", sf_dir)
    out = dedupe_keep_latest(ev.select("event_id", "ts", "user_id"), ["user_id"], ["ts", "event_id"])
    return out.select(
        "user_id", F.col("event_id").alias("latest_event_id"), F.col("ts").alias("latest_ts")
    )
