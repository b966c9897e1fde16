"""The WooCommerce document flattening recomposed Spark-first — FULL
WIDTH: every scalar path the reference's per-document row builders
emit, as column expressions over the nested input schema (FIXTURES.md
`woo_api_orders_raw` and siblings).

Reference builders (all imperative per-document loops; here each is
one declarative projection whose output order matches the declared
DDL in `dot_spark.schemas`):

- orders              woo-sync/main.py:570-677  -> woo_api_orders
- order_items         woo-sync/main.py:679-819  -> woo_api_order_items
- products            woo-sync/main.py:821-974  -> woo_api_products
- product_bundles     woo-sync/main.py:976-993  -> woo_api_product_bundles
- product_categories  woo-sync/main.py:995-1012 -> woo_api_product_categories
- product_attributes  woo-sync/main.py:1014-1032-> woo_api_product_attributes
- refunds             woo-sync/main.py:1034-1081-> woo_api_refunds
- refund_items        woo-sync/main.py:1083-1130-> woo_api_refund_items

Semantics preserved per shape:

- N1 struct-path extraction  (`o['billing']['city']`), with the
  reference's `if 'x' in doc` presence checks expressed as
  schema-aware column resolution (`_field`): a path absent from the
  input schema yields a typed NULL/default, never an AnalysisException.
- N3 meta_data key-value lift with defaults (`cru_order_origin` ->
  'WEB' when absent; event_code -> '' — the reference initializes the
  accumulator to '' and appends unconditionally).
- N4 last-element-wins (reversed() discount loop :613-618; the LAST
  shipping_lines entry wins in refunds :1060-1064).
- N2 positional explode of line_items/bundled_items/categories/
  attributes with parent keys.
- N5 sticky carries in document order: a standalone item's sku
  applies to following bundle members (:683-688), and donor_premium
  FREEZES on the first cru_data-bearing item value that isn't the
  literal 'false', None included (:745-749
  `if donor_premium == "false": ...` — one per-order value, not
  per-item).
- F4 exact decimal money math (Decimal casts; '' sentinels use the
  reference's defaults where it defaults, try_cast->NULL where it
  would throw).
- F7 "1"-string flag coercion (:845-892 meta pivot, '1' -> true).

Env-derived columns (store_wid, rls_value, sync_timestamp, and the
`timestamp` row stamp the reference takes from int(time.time())) are
parameters — deterministic for tests and oracles, injected from real
config in a deployment.

Whole-stage codegen applies to every expression; the ONE shuffle in
the item path is the shared window for both sticky carries,
partitioned by order id — the same key the explode already localized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_DEC = "decimal(38,9)"


def _ZERO_DEC():
    # function, not module constant: F.lit needs an active session
    return F.lit("0").cast(_DEC)


def _field(df: DataFrame, path: str, dtype: str = "string") -> Column:
    """F.col(path) when the (possibly nested) field exists in the
    input schema, else a typed NULL — the column form of the
    reference's `if 'brand' in li` presence checks, so one projection
    serves both full-width and partial fixtures."""
    cur = df.schema
    for part in path.split("."):
        if not isinstance(cur, StructType) or part not in cur.fieldNames():
            return F.lit(None).cast(dtype)
        cur = cur[part].dataType
    return F.col(path)


def _last_elem(df: DataFrame, array_path: str, member: str, dtype: str = "string") -> Column:
    """Last array element's struct member (N4 last-wins), with the
    same presence tolerance as _field on BOTH the array path and the
    element member — a fixture whose discount struct omits
    `description` gets a typed NULL, not an AnalysisException."""
    cur = df.schema
    for part in array_path.split("."):
        if not isinstance(cur, StructType) or part not in cur.fieldNames():
            return F.lit(None).cast(dtype)
        cur = cur[part].dataType
    elem = getattr(cur, "elementType", None)
    if not isinstance(elem, StructType) or member not in elem.fieldNames():
        return F.lit(None).cast(dtype)
    return F.try_element_at(F.col(array_path), F.lit(-1))[member]


def _dec(col: Column) -> Column:
    """Money cast: try_cast keeps ''/garbage as NULL instead of an
    ANSI runtime error (the reference's Decimal(str(x)) would throw;
    a distributed load must not die on one malformed document)."""
    return col.cast("string").try_cast(_DEC)


def _dec0(col: Column) -> Column:
    """Money cast with the reference's `except: 0` fallback."""
    return F.coalesce(_dec(col), _ZERO_DEC())


def _flag1(col: Column) -> Column:
    """'1'-string (or boolean true) -> true, anything else false.
    For TOP-LEVEL fields only (backorders_allowed/downloadable/
    virtual), where the source value can be a JSON boolean; the
    meta-data pivot flags use meta_flag, which accepts ONLY the
    exact string '1' (the reference pivot :846-892 tests
    `y['value'] == "1"` — a meta value 'true' yields 0 there)."""
    s = col.cast("string")
    return F.coalesce(s.isin("1", "true"), F.lit(False))


def meta_value(meta_col: str, key: str, default: str | None = None) -> Column:
    """Lift one meta_data {key,value} entry (N3). `filter +
    element_at` keeps it a pure array expression — no explode, no
    shuffle. The LAST matching entry wins: the reference pivots are
    plain loops that overwrite on every match (duplicate meta keys
    are legal in WooCommerce), so `x = y['value']` leaves the final
    occurrence. A matched entry whose value is NULL yields NULL —
    the default applies only when NO entry matches (the reference
    assigns y['value'] verbatim, None included)."""
    last = F.try_element_at(
        F.filter(F.col(meta_col), lambda e: e["key"] == F.lit(key)), F.lit(-1)
    )
    if default is None:
        return last["value"]
    return F.when(last.isNull(), F.lit(default)).otherwise(last["value"])


def meta_flag(meta_col: str, key: str) -> Column:
    """Sticky meta flag pivot: true iff ANY entry for `key` has the
    EXACT string value '1' (woo-sync/main.py:846-892 — the `if
    y['value'] == "1": x = 1` arms only ever SET the flag, so a later
    duplicate can't clear it, and 'true'/'yes' never set it)."""
    return F.coalesce(
        F.exists(
            F.col(meta_col),
            lambda e: (e["key"] == F.lit(key)) & (e["value"] == F.lit("1")),
        ),
        F.lit(False),
    )


def meta_last_nonempty(meta_col: str, key: str, default: str) -> Column:
    """''-guarded meta lift: the reference's `if y['value'] != "":
    x = y['value']` arms overwrite on every NON-EMPTY match, so the
    LAST non-empty entry wins and '' entries can never clobber an
    earlier value back to the default. (A present-but-None value
    would crash the reference's int()/Decimal() coercion downstream —
    treated as non-matching here.)"""
    hit = F.try_element_at(
        F.filter(
            F.col(meta_col),
            lambda e: (e["key"] == F.lit(key))
            & e["value"].isNotNull()
            & (e["value"] != F.lit("")),
        ),
        F.lit(-1),
    )["value"]
    return F.coalesce(hit, F.lit(default))


def _meta_of(
    df: DataFrame, meta_path: str, key: str, default: str | None = None
) -> Column:
    """meta_value with _field's presence tolerance on the meta array
    path itself (an item fixture without meta_data lifts defaults,
    not an AnalysisException)."""
    cur = df.schema
    for part in meta_path.split("."):
        if not isinstance(cur, StructType) or part not in cur.fieldNames():
            return F.lit(default).cast("string")
        cur = cur[part].dataType
    return meta_value(meta_path, key, default)


_DATE_SENTINEL = "0000-00-00 00:00:00"


def _ts(col: Column) -> Column:
    """Timestamp parse with the reference's '0000-00-00 00:00:00'
    zero-date sentinel -> NULL (woo-sync/main.py:272-273)."""
    s = col.cast("string")
    return F.when(s == _DATE_SENTINEL, F.lit(None)).otherwise(s).try_cast(
        "timestamp"
    )


def flatten_orders(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """Nested order documents -> the FULL flat order row
    (woo-sync/main.py:570-677; output order = schemas.DDL
    ['woo_api_orders'])."""
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )
    # N4: the reference walks discounts with reversed() and the last
    # entry wins; no discounts -> amount 0, strings None (:611-624)
    def last_discount(member):
        return _last_elem(raw, "cru_data.discounts", member)
    return raw.select(
        F.lit(store_wid).cast("bigint").alias("store_wid"),
        F.lit(rls_value).alias("rls_value"),
        F.col("id").cast("bigint").alias("order_number"),
        sync_ts.alias("sync_timestamp"),
        _field(raw, "cru_data.agent.email").alias("agent_email"),
        _field(raw, "cru_data.agent.name").alias("agent_name"),
        _field(raw, "billing.address_1").alias("billing_address_1"),
        _field(raw, "billing.address_2").alias("billing_address_2"),
        _field(raw, "billing.city").alias("billing_city"),
        _field(raw, "billing.company").alias("billing_company"),
        _field(raw, "billing.country").alias("billing_country"),
        _field(raw, "billing.email").alias("billing_email"),
        _field(raw, "billing.first_name").alias("billing_first_name"),
        _field(raw, "billing.last_name").alias("billing_last_name"),
        _field(raw, "billing.phone").alias("billing_phone"),
        _field(raw, "billing.postcode").alias("billing_postcode"),
        _field(raw, "billing.state").alias("billing_state"),
        _field(raw, "cart_hash").alias("cart_hash"),
        _dec(_field(raw, "cart_tax")).alias("cart_tax"),
        _field(raw, "created_via").alias("created_via"),
        _field(raw, "currency").alias("currency"),
        _field(raw, "cru_data.shipping.custom_note").alias("custom_shipping_note"),
        _field(raw, "customer_id", "bigint").cast("bigint").alias("customer_id"),
        _field(raw, "customer_ip_address").alias("customer_ip_address"),
        _field(raw, "customer_note").alias("customer_note"),
        _field(raw, "cru_data.customer_role").alias("customer_role"),
        _field(raw, "customer_user_agent").alias("customer_user_agent"),
        _ts(_field(raw, "date_completed")).alias("date_completed"),
        _ts(_field(raw, "date_created")).alias("date_created"),
        _ts(_field(raw, "date_modified")).alias("date_modified"),
        _ts(_field(raw, "date_paid")).alias("date_paid"),
        _ts(_field(raw, "cru_data.shipping.date_shipped")).alias("date_shipped"),
        F.coalesce(_dec(last_discount("amount")), _ZERO_DEC()).alias("discount_amount"),
        last_discount("code").alias("discount_codes"),
        last_discount("type").alias("discount_type"),
        last_discount("description").alias("discount_description"),
        _dec(_field(raw, "discount_tax")).alias("discount_tax"),
        _dec(_field(raw, "discount_total")).alias("discount_total"),
        # reference initializes event_code='' and appends it even when
        # the meta key is absent (:628-633) — '' default, not NULL
        meta_value("meta_data", "event_code", "").alias("event_code"),
        F.col("order_key").alias("order_key"),
        meta_value("meta_data", "cru_order_origin", "WEB").alias("order_origin"),
        _field(raw, "order_type").alias("order_type"),
        _field(raw, "cru_data.ordered_by.email").alias("ordered_by_email"),
        _field(raw, "cru_data.ordered_by.name").alias("ordered_by_name"),
        _field(raw, "cru_data.ordered_by.phone").alias("ordered_by_phone"),
        _field(raw, "parent_id", "bigint").cast("bigint").alias("parent_id"),
        _field(raw, "payment_method").alias("payment_method"),
        _field(raw, "payment_method_title").alias("payment_method_title"),
        _field(raw, "cru_data.po_number").alias("po_number"),
        _field(raw, "prices_include_tax", "boolean")
        .cast("boolean")
        .alias("prices_include_tax"),
        _field(raw, "cru_data.radio_station.id").alias("radio_station"),
        _field(raw, "cru_data.radio_station.description").alias(
            "radio_station_description"
        ),
        _field(raw, "cru_data.salesforce_account").alias("salesforce_account"),
        _field(raw, "salesforce_id").alias("salesforce_id"),
        _field(raw, "cru_data.shipping.shipped_method").alias("shipped_method"),
        _field(raw, "shipping.address_1").alias("shipping_address_1"),
        _field(raw, "shipping.address_2").alias("shipping_address_2"),
        _field(raw, "shipping.city").alias("shipping_city"),
        _field(raw, "shipping.company").alias("shipping_company"),
        _field(raw, "shipping.country").alias("shipping_country"),
        _field(raw, "shipping.first_name").alias("shipping_first_name"),
        _field(raw, "shipping.last_name").alias("shipping_last_name"),
        _field(raw, "cru_data.shipping.method_id").alias("shipping_method_id"),
        _field(raw, "cru_data.shipping.method_title").alias("shipping_method_title"),
        _field(raw, "shipping.postcode").alias("shipping_postcode"),
        _field(raw, "shipping.state").alias("shipping_state"),
        _dec(_field(raw, "shipping_tax")).alias("shipping_tax"),
        _dec(_field(raw, "shipping_total")).alias("shipping_total"),
        F.col("status").alias("status"),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
        _dec(_field(raw, "total")).alias("total"),
        _dec(_field(raw, "total_tax")).alias("total_tax"),
        _field(raw, "transaction_id").alias("transaction_id"),
        _field(raw, "version").alias("version"),
    )


def flatten_order_items(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """Nested order documents -> one FULL flat row per line item
    (woo-sync/main.py:679-819; output order = schemas.DDL
    ['woo_api_order_items']), with BOTH sticky carries the reference
    implements as loop-carried variables:

    - sku: a standalone item (bundled_by == '') sets the running sku;
      bundle members inherit it; initial value '' (:683-688).
    - donor_premium: starts 'false' per order and FREEZES on the
      first cru_data-bearing item whose donor_premium isn't the
      literal 'false' — None INCLUDED (:745-749 assigns the value
      verbatim) — once frozen (to '0', '1', or None), later items
      cannot change it. A struct-sentinel first(ignorenulls) over
      the same running frame expresses the freeze exactly.

    Both windows share one (order, pos) spec, so the explode pays a
    single exchange.
    """
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )
    items = raw.select(
        F.col("id").cast("bigint").alias("order_number"),
        F.col("order_key"),
        _ts(_field(raw, "date_created")).alias("date_created"),
        F.posexplode("line_items").alias("pos", "item"),
    )

    def fld(path: str, dtype: str = "string") -> Column:
        return _field(items, f"item.{path}", dtype)

    is_standalone = fld("bundled_by").isNull() | (fld("bundled_by") == "")
    w = (
        Window.partitionBy("order_number")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # struct sentinel, not last(sku) directly: a STANDALONE item with
    # a NULL sku must RESET the carry (the reference assigns
    # li['sku'] verbatim, None included — :683-688), but a bare
    # last(ignorenulls) would skip it and leak the previous carry.
    # struct(...) is non-null even when its field is NULL, so the
    # window sees every standalone row; the initial state (no
    # standalone yet) renders '' exactly like the reference's
    # sku = '' accumulator. Pinned by the hypothesis fold-parity test.
    sku_mark = F.when(is_standalone, F.struct(fld("sku").alias("v")))
    carried_mark = F.last(sku_mark, ignorenulls=True).over(w)
    carried_sku = F.when(carried_mark.isNull(), F.lit("")).otherwise(
        carried_mark["v"]
    )
    # donor_premium freeze, verbatim :745-749: the reference assigns
    # `donor_premium = cd['donor_premium']` whenever the accumulator
    # still reads 'false' and the item HAS a cru_data block — so a
    # present-but-None value freezes the carry at None (later '1'
    # items can no longer set it); only the literal 'false' leaves it
    # assignable. Struct sentinel again (like sku_mark) so a NULL
    # freeze value survives first(ignorenulls); cru_data-struct
    # nullness IS the reference's `if 'cru_data' in li` (a JSON
    # cru_data: null would crash the reference's cd['...'] access, so
    # null-struct == absent is exact).
    has_cru = fld("cru_data").isNotNull()
    dp_raw = fld("cru_data.donor_premium").cast("string")
    dp_mark = F.when(
        has_cru & (dp_raw.isNull() | (dp_raw != "false")),
        F.struct(dp_raw.alias("v")),
    )
    frozen_mark = F.first(dp_mark, ignorenulls=True).over(w)
    frozen_dp = F.when(frozen_mark.isNull(), F.lit("false")).otherwise(
        frozen_mark["v"]
    )
    item_cost = _meta_of(items, "item.meta_data", "_alg_wc_cog_item_cost")
    return items.select(
        F.lit(store_wid).cast("bigint").alias("store_wid"),
        F.lit(rls_value).alias("rls_value"),
        fld("id", "bigint").cast("bigint").alias("order_item_id"),
        sync_ts.alias("sync_timestamp"),
        F.col("date_created"),
        F.col("order_key"),
        F.col("order_number"),
        F.coalesce(fld("brand"), F.lit("")).alias("product_brand"),
        _dec(fld("cru_data.component.cost")).alias("product_component_cost"),
        F.coalesce(fld("cru_data.component.id", "bigint").cast("bigint"), F.lit(0)).alias(
            "product_component_id"
        ),
        _dec(fld("cru_data.component.msrp")).alias("product_component_msrp"),
        _dec(fld("cru_data.component.regular_price")).alias(
            "product_component_regular_price"
        ),
        F.coalesce(fld("cru_data.component.sku"), F.lit("")).alias(
            "product_component_sku"
        ),
        # :723-730 — meta cost, Decimal() failure -> 0
        F.coalesce(item_cost.try_cast(_DEC), _ZERO_DEC()).alias("product_cost"),
        F.coalesce(fld("dept"), F.lit("")).alias("product_dept"),
        _dec0(F.coalesce(fld("cru_data.discount"), F.lit("0.00"))).alias(
            "product_discount"
        ),
        (frozen_dp == "1").alias("product_donor_premium"),
        F.coalesce(fld("cru_data.exclude_discounting"), F.lit("")).alias(
            "product_exclude_discounting"
        ),
        F.coalesce(fld("cru_data.free_shipping"), F.lit("")).alias(
            "product_free_shipping"
        ),
        F.coalesce(fld("cru_data.gift_card"), F.lit("")).alias("product_gift_card"),
        fld("product_id", "bigint").cast("bigint").alias("product_id"),
        F.coalesce(fld("impact"), F.lit("")).alias("product_impact"),
        F.coalesce(fld("product_inactive"), F.lit("")).alias("product_inactive"),
        _dec(fld("cru_data.msrp")).alias("product_msrp"),
        fld("name").alias("product_name"),
        F.coalesce(fld("next_receipt_date"), fld("cru_data.next_receipt_date"), F.lit("")).alias(
            "product_next_receipt_date"
        ),
        _dec(fld("price")).alias("product_price"),
        F.coalesce(fld("project"), F.lit("")).alias("product_project"),
        fld("quantity", "bigint").cast("bigint").alias("product_quantity"),
        _dec(fld("cru_data.regular_price")).alias("product_regular_price"),
        F.coalesce(fld("cru_data.royalty"), F.lit("")).alias("product_royalty"),
        carried_sku.alias("product_sku"),
        F.coalesce(fld("sub_brand"), F.lit("")).alias("product_subbrand"),
        _dec(fld("total_tax")).alias("product_tax"),
        F.coalesce(fld("total_manuals"), F.lit("")).alias("product_total_manuals"),
        # :802-805 — '' weight sentinel -> 0.00
        _dec(
            F.when(fld("weight") == "", F.lit("0.00")).otherwise(
                F.coalesce(fld("weight"), F.lit("0.00"))
            )
        ).alias("product_weight"),
        # :807-811 — '' per_case sentinel -> 0
        F.coalesce(
            F.nullif(fld("per_case").cast("string"), F.lit("")).try_cast("bigint"),
            F.lit(0),
        ).alias("products_per_case"),
        # :812-815 — standalone items get bundled_by 0, not NULL
        F.coalesce(
            F.nullif(fld("bundled_by").cast("string"), F.lit("")).try_cast("bigint"),
            F.lit(0),
        ).alias("bundled_by"),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
    )


def flatten_products(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """Nested product documents -> flat product rows
    (woo-sync/main.py:821-974; output order = schemas.DDL
    ['woo_api_products']): an 18-key meta_data pivot ('1' -> true for
    flags, ''-guarded numerics), presence-checked top-level fields,
    and the reference's '' -> '0.00' price sentinels."""
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )

    def meta(key: str, default: str | None = None) -> Column:
        return meta_value("meta_data", key, default)

    def meta_num_default(key: str, default: str) -> Column:
        # ``if y['value'] != "": x = y['value']`` — last non-empty
        # duplicate wins; '' entries never clobber back to default
        return meta_last_nonempty("meta_data", key, default)

    def bool_field(path: str) -> Column:
        # '' and absent both mean the default (:907-923)
        return _flag1(F.nullif(_field(raw, path).cast("string"), F.lit("")))

    return raw.select(
        F.lit(store_wid).cast("bigint").alias("store_wid"),
        F.lit(rls_value).alias("rls_value"),
        sync_ts.alias("sync_timestamp"),
        # :897-901 — date_created falls back to date_modified
        F.coalesce(
            _ts(_field(raw, "date_created")), _ts(_field(raw, "date_modified"))
        ).alias("date_created"),
        _ts(_field(raw, "date_modified")).alias("date_modified"),
        F.col("id").cast("bigint").alias("id"),
        F.col("name").alias("name"),
        _field(raw, "short_description").alias("short_description"),
        bool_field("backorders_allowed").alias("backorders_allowed"),
        bool_field("downloadable").alias("downloadable"),
        bool_field("virtual").alias("virtual"),
        meta_flag("meta_data", "exclude_from_all_discounting").alias(
            "exclude_from_all_discounting"
        ),
        meta_flag("meta_data", "free_shipping").alias("free_shipping"),
        meta_flag("meta_data", "product_inactive").alias("product_inactive"),
        meta_flag("meta_data", "gift_card").alias("gift_card"),
        meta_flag("meta_data", "donor_premium").alias("donor_premium"),
        meta_flag("meta_data", "royalty").alias("royalty"),
        meta("next_receipt_date").try_cast("date").alias("next_receipt_date"),
        meta("brand", "").alias("brand"),
        meta("product_isbn", "").alias("product_isbn"),
        meta("product_publisher", "").alias("product_publisher"),
        meta("impact", "").alias("impact"),
        meta("product_language", "").alias("product_language"),
        meta("sub_brand", "").alias("sub_brand"),
        F.initcap(F.col("status").cast("string")).alias("status"),
        _dec0(meta_num_default("_alg_wc_cog_cost", "0.00")).alias("alg_wc_cog_cost"),
        _dec0(meta_num_default("fl_staff_price_field", "0.00")).alias(
            "fl_staff_price_field"
        ),
        _dec0(
            F.coalesce(
                F.nullif(_field(raw, "msrp_price").cast("string"), F.lit("")),
                F.lit("0.00"),
            )
        ).alias("msrp_price"),
        _dec0(
            F.coalesce(F.nullif(F.col("price").cast("string"), F.lit("")), F.lit("0.00"))
        ).alias("price"),
        _dec0(
            F.coalesce(
                F.nullif(_field(raw, "regular_price").cast("string"), F.lit("")),
                F.lit("0.00"),
            )
        ).alias("regular_price"),
        F.col("sku").alias("sku"),
        _dec0(
            F.coalesce(F.nullif(_field(raw, "weight").cast("string"), F.lit("")), F.lit("0"))
        ).alias("weight"),
        _field(raw, "type").alias("type"),
        _field(raw, "stock_quantity", "bigint").cast("bigint").alias("stock_quantity"),
        # try_cast-then-coalesce keeps the reference's int() crash
        # cases (garbage digits) at the 0 default instead of NULL
        F.coalesce(
            meta_last_nonempty("meta_data", "case_qty", "0").try_cast("bigint"),
            F.lit(0),
        ).alias("case_qty"),
        F.coalesce(
            meta_last_nonempty("meta_data", "product_page_count", "0").try_cast("bigint"),
            F.lit(0),
        ).alias("product_page_count"),
        F.coalesce(
            meta_last_nonempty("meta_data", "total_manuals", "0").try_cast("bigint"),
            F.lit(0),
        ).alias("total_manuals"),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
    )


def _exploded_child(
    raw: DataFrame,
    array_col: str,
    store_wid: int,
    rls_value: str,
    sync_ts: Column,
) -> DataFrame:
    """Shared N2 head for the product child tables: explode one array
    with the parent product id carried. The reference's `if 'x' in p`
    guard maps to a NULL array under a fixed schema — explode(NULL)
    yields no rows, which IS the guard."""
    return raw.select(
        F.lit(store_wid).cast("bigint").alias("store_wid"),
        F.lit(rls_value).alias("rls_value"),
        sync_ts.alias("sync_timestamp"),
        F.col("id").cast("bigint").alias("product_id"),
        F.explode(array_col).alias("child"),
    )


def flatten_product_bundles(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """bundled_items -> woo_api_product_bundles
    (woo-sync/main.py:976-993; ids are DECIMAL there, kept)."""
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )
    ch = _exploded_child(raw, "bundled_items", store_wid, rls_value, sync_ts)
    return ch.select(
        "store_wid",
        "rls_value",
        "sync_timestamp",
        F.col("product_id").cast(_DEC).alias("id"),
        F.col("child.bundled_item_id").cast(_DEC).alias("bundled_item_id"),
        F.col("child.product_id").cast(_DEC).alias("product_id"),
        F.col("child.quantity_default").cast("bigint").alias("quantity_default"),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
    )


def flatten_product_categories(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """categories -> woo_api_product_categories
    (woo-sync/main.py:995-1012)."""
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )
    ch = _exploded_child(raw, "categories", store_wid, rls_value, sync_ts)
    return ch.select(
        "store_wid",
        "rls_value",
        "sync_timestamp",
        "product_id",
        F.col("child.id").cast("bigint").alias("id"),
        F.col("child.name").alias("name"),
        F.col("child.slug").alias("slug"),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
    )


def flatten_product_attributes(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """attributes -> woo_api_product_attributes
    (woo-sync/main.py:1014-1032; option = options[0] :1029)."""
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )
    ch = _exploded_child(raw, "attributes", store_wid, rls_value, sync_ts)
    return ch.select(
        "store_wid",
        "rls_value",
        "sync_timestamp",
        "product_id",
        F.col("child.id").cast("bigint").alias("id"),
        F.col("child.name").alias("name"),
        F.col("child.slug").alias("slug"),
        F.try_element_at(F.col("child.options"), F.lit(1)).alias("option"),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
    )


def flatten_refunds(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """Nested refund documents -> woo_api_refunds
    (woo-sync/main.py:1034-1081): date_modified mirrors date_created
    (:1057), order_number mirrors parent_id (:1058-1059), the LAST
    shipping_lines entry wins (:1060-1066 loop overwrite), and total
    is the NEGATED source amount (:1078-1079)."""
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )
    def last_ship(member):
        return _last_elem(raw, "shipping_lines", member)
    return raw.select(
        F.lit(store_wid).cast("bigint").alias("store_wid"),
        F.lit(rls_value).alias("rls_value"),
        F.col("id").cast("bigint").alias("refund_number"),
        sync_ts.alias("sync_timestamp"),
        F.coalesce(_field(raw, "cru_data.agent_email"), F.lit("")).alias("agent_email"),
        F.coalesce(_field(raw, "cru_data.agent_name"), F.lit("")).alias("agent_name"),
        _ts(_field(raw, "date_created")).alias("date_created"),
        _ts(_field(raw, "date_created")).alias("date_modified"),
        F.col("parent_id").cast("bigint").alias("order_number"),
        F.col("parent_id").cast("bigint").alias("parent_id"),
        F.coalesce(_dec(last_ship("total")), _ZERO_DEC()).alias("shipping"),
        F.coalesce(_dec(last_ship("total_tax")), _ZERO_DEC()).alias("shipping_tax"),
        F.coalesce(_dec(_field(raw, "cru_data.subtotal")), _ZERO_DEC()).alias("subtotal"),
        F.coalesce(_dec(_field(raw, "cru_data.subtotal_tax")), _ZERO_DEC()).alias(
            "subtotal_tax"
        ),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
        (-_dec(F.col("amount"))).alias("total"),
    )


def flatten_refund_items(
    raw: DataFrame,
    store_wid: int = 1,
    rls_value: str = "cru_woo",
    sync_timestamp: Column | None = None,
    load_ts: int = 0,
) -> DataFrame:
    """Nested refund documents -> woo_api_refund_items
    (woo-sync/main.py:1083-1130): order_item_id from the
    _refunded_item_id meta (:1097-1101, default 0), and BOTH cost
    columns from the same _alg_wc_cog_item_cost meta with the
    reference's `except: 0` fallback (:1103-1118)."""
    sync_ts = (
        sync_timestamp
        if sync_timestamp is not None
        else F.lit(None).cast("timestamp")
    )
    items = raw.select(
        F.col("id").cast("bigint").alias("refund_number"),
        F.col("parent_id").cast("bigint").alias("order_number"),
        _ts(_field(raw, "date_created")).alias("date_created"),
        F.explode("line_items").alias("item"),
    )
    cost = F.coalesce(
        _meta_of(items, "item.meta_data", "_alg_wc_cog_item_cost").try_cast(_DEC),
        _ZERO_DEC(),
    )
    return items.select(
        F.lit(store_wid).cast("bigint").alias("store_wid"),
        F.lit(rls_value).alias("rls_value"),
        F.col("item.id").cast("bigint").alias("refund_item_id"),
        sync_ts.alias("sync_timestamp"),
        F.col("date_created"),
        F.col("order_number"),
        F.coalesce(
            _meta_of(items, "item.meta_data", "_refunded_item_id").try_cast("bigint"),
            F.lit(0),
        ).alias("order_item_id"),
        cost.alias("product_component_cost"),
        cost.alias("product_cost"),
        F.col("item.product_id").cast("bigint").alias("product_id"),
        F.col("item.name").alias("product_name"),
        _dec(F.col("item.price")).alias("product_price"),
        F.col("item.quantity").cast("bigint").alias("product_quantity"),
        F.col("item.sku").alias("product_sku"),
        _dec(F.col("item.total_tax")).alias("product_tax"),
        F.col("refund_number"),
        F.lit(load_ts).cast("bigint").alias("timestamp"),
    )
