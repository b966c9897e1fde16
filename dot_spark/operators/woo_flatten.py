"""The WooCommerce order-document flattening recomposed Spark-first.

Reference: woo-sync/main.py:570-819 — a 250-line per-document Python
row builder that turns one nested order document into a flat order
row plus N order-item rows. Here the same semantics are column
expressions over the nested input schema (FIXTURES.md
`woo_api_orders_raw`):

- N1 struct-path extraction  (:570-677, `o['billing']['city']`)
- N3 meta_data key-value lift with defaults (:629-641,
  `cru_order_origin` -> 'WEB' when absent)
- N4 last-discount-wins       (:613-618, reversed() loop -> the LAST
  array element is authoritative)
- N2 positional explode of line_items with parent keys (:679-819)
- N5 sticky SKU carry         (:683-688, a standalone item's sku
  applies to the bundle members that FOLLOW it in document order)
- F4 exact decimal money math (:593-673, Decimal casts)
- F7 "1"-string flag coercion (:845-892 pattern, donor_premium)

Only the semantically load-bearing fields are materialized; the
remaining ~50 scalar paths in the reference builder are more N1
columns of exactly the same shape (see schemas.py:woo_api_order_items
for the full declared output schema).

Whole-stage codegen applies to every expression; the single shuffle
in the item path is the window for the sticky carry, partitioned by
order id — the same key the explode already localized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,9)"


def meta_value(meta_col: str, key: str, default: str | None = None):
    """Lift one meta_data {key,value} entry (N3). `filter + element_at`
    keeps it a pure array expression — no explode, no shuffle."""
    hit = F.try_element_at(
        F.filter(F.col(meta_col), lambda e: e["key"] == F.lit(key)), F.lit(1)
    )["value"]
    return F.coalesce(hit, F.lit(default)) if default is not None else hit


def flatten_orders(raw: DataFrame) -> DataFrame:
    """Nested order documents -> flat order rows (N1/N3/N4/F4)."""
    # try_element_at: an order with no discounts yields NULLs, not an
    # ANSI out-of-bounds error
    last_discount = F.try_element_at(F.col("cru_data.discounts"), F.lit(-1))
    return raw.select(
        F.col("id").alias("order_number"),
        F.col("order_key"),
        F.col("date_created"),
        F.col("status"),
        # N1: struct paths
        F.col("billing.city").alias("billing_city"),
        F.col("billing.email").alias("billing_email"),
        F.col("billing.country").alias("billing_country"),
        F.col("cru_data.agent.email").alias("agent_email"),
        F.col("cru_data.agent.name").alias("agent_name"),
        F.col("cru_data.po_number").alias("po_number"),
        # N4: the reference walks discounts with reversed() and the
        # last entry wins
        last_discount["amount"].cast(_DEC).alias("discount_amount"),
        last_discount["code"].alias("discount_codes"),
        last_discount["type"].alias("discount_type"),
        # N3: meta lift with the reference's defaults
        meta_value("meta_data", "event_code").alias("event_code"),
        meta_value("meta_data", "cru_order_origin", "WEB").alias("order_origin"),
        # F4: exact decimal money math
        F.col("total").cast(_DEC).alias("total"),
        F.col("total_tax").cast(_DEC).alias("total_tax"),
        F.col("shipping_total").cast(_DEC).alias("shipping_total"),
    )


def flatten_order_items(raw: DataFrame) -> DataFrame:
    """Nested order documents -> one row per line item (N2/N5/F7),
    with the sticky SKU carry the reference implements imperatively:
    a non-bundled item sets the current sku; following bundle members
    inherit it (woo-sync/main.py:683-688)."""
    items = raw.select(
        F.col("id").alias("order_number"),
        F.col("order_key"),
        F.col("date_created"),
        F.posexplode("line_items").alias("pos", "item"),
    )
    is_standalone = (F.col("item.bundled_by").isNull()) | (
        F.col("item.bundled_by") == ""
    )
    w = (
        Window.partitionBy("order_number")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_sku = F.last(
        F.when(is_standalone, F.col("item.sku")), ignorenulls=True
    ).over(w)
    return items.select(
        "order_number",
        "order_key",
        "date_created",
        F.col("item.id").alias("order_item_id"),
        F.col("item.name").alias("product_name"),
        F.col("item.product_id").alias("product_id"),
        F.col("item.quantity").alias("product_quantity"),
        F.col("item.price").cast(_DEC).alias("product_price"),
        F.col("item.total_tax").cast(_DEC).alias("product_tax"),
        F.when(is_standalone, F.lit(None).cast("bigint"))
        .otherwise(F.col("item.bundled_by").cast("bigint"))
        .alias("bundled_by"),
        # N5: sticky carry in document order
        carried_sku.alias("product_sku"),
        # F7: "1"-string flag -> boolean with false default
        (
            F.coalesce(F.col("item.cru_data.donor_premium"), F.lit("0")) == "1"
        ).alias("product_donor_premium"),
        # item-level N3 lift
        meta_value("item.meta_data", "_alg_wc_cog_item_cost")
        .cast(_DEC)
        .alias("product_cost"),
    )
