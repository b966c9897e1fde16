"""The woo order-document flattening (woo-sync/main.py:570-819
semantics) — rule-per-test over a hand-built nested fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from dot_spark.operators.woo_flatten import flatten_order_items, flatten_orders

ITEM = "id BIGINT, sku STRING, bundled_by STRING, name STRING, price STRING, quantity BIGINT, total_tax STRING, product_id BIGINT, cru_data STRUCT<donor_premium STRING>, meta_data ARRAY<STRUCT<key STRING, value STRING>>"
RAW_DDL = (
    "id BIGINT, order_key STRING, date_created TIMESTAMP, status STRING, "
    "billing STRUCT<city STRING, email STRING, country STRING>, "
    "cru_data STRUCT<agent STRUCT<email STRING, name STRING>, po_number STRING, "
    "discounts ARRAY<STRUCT<amount STRING, code STRING, type STRING>>>, "
    "meta_data ARRAY<STRUCT<key STRING, value STRING>>, "
    f"line_items ARRAY<STRUCT<{ITEM}>>, "
    "total STRING, total_tax STRING, shipping_total STRING"
)


def _item(iid, sku, bundled_by, price="1.00", meta=None, dp=None):
    return (iid, sku, bundled_by, f"n{iid}", price, 1, "0.10", 100 + iid,
            (dp,), meta or [])


@pytest.fixture(scope="module")
def raw(spark):
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    rows = [
        # order 1: two discounts (last wins), explicit origin meta,
        # standalone item then two bundle members then a second
        # standalone whose sku resets the carry
        (1, "k1", t, "completed", ("Orlando", "a@x.org", "US"),
         (("agent@cru.org", "Agent A"), "PO-7",
          [("5.00", "EARLY", "percent"), ("2.50", "FINAL", "fixed")]),
         [("event_code", "EC1"), ("cru_order_origin", "PHONE")],
         [_item(11, "SKU-A", ""), _item(12, None, "11"),
          _item(13, None, "11", meta=[("_alg_wc_cog_item_cost", "3.25")]),
          _item(14, "SKU-B", "", dp="1")],
         "100.00", "7.00", "9.99"),
        # order 2: no discounts, no origin meta (default WEB), single item
        (2, "k2", t, "processing", ("Berlin", "b@x.org", "DE"),
         (("agent2@cru.org", "Agent B"), None, []),
         [],
         [_item(21, "SKU-C", "")],
         "20.00", "1.00", "0.00"),
    ]
    return spark.createDataFrame(rows, RAW_DDL).cache()


def test_struct_paths_and_decimals(raw):
    o = {r.order_number: r for r in flatten_orders(raw).collect()}
    assert o[1].billing_city == "Orlando" and o[1].agent_email == "agent@cru.org"
    assert str(o[1].total) == "100.000000000"  # decimal(38,9), exact
    assert o[2].billing_country == "DE"


def test_last_discount_wins(raw):
    o = {r.order_number: r for r in flatten_orders(raw).collect()}
    assert o[1].discount_codes == "FINAL" and str(o[1].discount_amount).startswith("2.5")
    assert o[2].discount_codes is None


def test_meta_lift_defaults(raw):
    o = {r.order_number: r for r in flatten_orders(raw).collect()}
    assert o[1].event_code == "EC1" and o[1].order_origin == "PHONE"
    assert o[2].event_code is None and o[2].order_origin == "WEB"


def test_explode_carries_parents_and_positions(raw):
    items = flatten_order_items(raw).collect()
    assert len(items) == 5
    assert {r.order_number for r in items} == {1, 2}
    by_id = {r.order_item_id: r for r in items}
    assert by_id[12].bundled_by == 11 and by_id[11].bundled_by is None


def test_sticky_sku_carry_and_reset(raw):
    by_id = {r.order_item_id: r for r in flatten_order_items(raw).collect()}
    # bundle members inherit the preceding standalone's sku
    assert by_id[12].product_sku == "SKU-A"
    assert by_id[13].product_sku == "SKU-A"
    # a later standalone resets the carry
    assert by_id[14].product_sku == "SKU-B"


def test_item_flags_and_meta_cost(raw):
    by_id = {r.order_item_id: r for r in flatten_order_items(raw).collect()}
    assert by_id[14].product_donor_premium is True
    assert by_id[11].product_donor_premium is False
    assert str(by_id[13].product_cost).startswith("3.25")
    assert by_id[11].product_cost is None


def test_flatten_stays_codegen_single_window_shuffle(raw):
    plan = flatten_order_items(raw)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
    # the sticky carry's window is the only exchange
    assert plan.count("Exchange hashpartitioning") <= 1, plan
