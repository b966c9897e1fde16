"""Declared reference table schemas as Spark DDL (FIXTURES.md port).

The reference declares fixed schemas per table — JSON field lists for
Okta (okta-sync/schemas/*.json), inline [name, type] pairs for
WooCommerce (woo-sync/main.py:189-556) and geography
(process-geography/main.py:276-531). This registry is their Spark
form: `DDL[name]` is the ordered column DDL, `struct_of(name)` parses
it, `align_to(df, name)` projects any frame onto it with the
reference's reconciliation semantics (cast / add-null / drop —
schema.align_schema, mirroring okta-sync/main.py:544-584).

BigQuery type mapping (FIXTURES.md): STRING→string, INTEGER→bigint,
TIMESTAMP→timestamp, DATETIME→timestamp (naive treated UTC),
DATE→date, BOOL→boolean, NUMERIC/BIGNUMERIC→decimal(38,9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from dot_spark.schema import align_schema

_TS = "timestamp"
_DEC = "decimal(38,9)"

DDL: dict[str, str] = {
    # --- Okta entities (okta-sync/schemas/*.json) ----------------------
    "okta_users": f"""
        id string, status string, created {_TS}, activated {_TS},
        statusChanged {_TS}, lastLogin {_TS}, lastUpdated {_TS},
        passwordChanged {_TS}, type string, profile string,
        credentials string, _links string, transitioningToStatus string
    """,
    "okta_apps": f"""
        id string, name string, label string, status string,
        lastUpdated {_TS}, created {_TS}, accessibility string,
        visibility string, features string, signOnMode string,
        credentials string, settings string, _links string,
        licensing string
    """,
    "okta_groups": f"""
        id string, created {_TS}, lastUpdated {_TS},
        lastMembershipUpdated {_TS}, objectClass string, type string,
        profile string, source string, _links string
    """,
    "okta_group_members": f"""
        id string, status string, created {_TS}, activated {_TS},
        statusChanged {_TS}, lastLogin {_TS}, lastUpdated {_TS},
        passwordChanged {_TS}, type string, profile string,
        credentials string, _links string, transitioningToStatus string,
        group_id string
    """,
    "okta_app_users": f"""
        id string, externalId string, created {_TS}, lastUpdated {_TS},
        scope string, status string, statusChanged {_TS},
        passwordChanged string, syncState string, lastSync string,
        credentials string, profile string, _links string, app_id string
    """,
    "okta_everyone_ids": "id string",
    # --- WooCommerce flat outputs (woo-sync/main.py:189-556) -----------
    "woo_api_orders": f"""
        store_wid bigint, rls_value string, order_number bigint,
        sync_timestamp {_TS}, agent_email string, agent_name string,
        billing_address_1 string, billing_address_2 string,
        billing_city string, billing_company string,
        billing_country string, billing_email string,
        billing_first_name string, billing_last_name string,
        billing_phone string, billing_postcode string,
        billing_state string, cart_hash string, cart_tax {_DEC},
        created_via string, currency string,
        custom_shipping_note string, customer_id bigint,
        customer_ip_address string, customer_note string,
        customer_role string, customer_user_agent string,
        date_completed {_TS}, date_created {_TS}, date_modified {_TS},
        date_paid {_TS}, date_shipped {_TS}, discount_amount {_DEC},
        discount_codes string, discount_type string,
        discount_description string, discount_tax {_DEC},
        discount_total {_DEC}, event_code string, order_key string,
        order_origin string, order_type string, ordered_by_email string,
        ordered_by_name string, ordered_by_phone string,
        parent_id bigint, payment_method string,
        payment_method_title string, po_number string,
        prices_include_tax boolean, radio_station string,
        radio_station_description string, salesforce_account string,
        salesforce_id string, shipped_method string,
        shipping_address_1 string, shipping_address_2 string,
        shipping_city string, shipping_company string,
        shipping_country string, shipping_first_name string,
        shipping_last_name string, shipping_method_id string,
        shipping_method_title string, shipping_postcode string,
        shipping_state string, shipping_tax {_DEC},
        shipping_total {_DEC}, status string, timestamp bigint,
        total {_DEC}, total_tax {_DEC}, transaction_id string,
        version string
    """,
    "woo_api_products": f"""
        store_wid bigint, rls_value string, sync_timestamp {_TS},
        date_created {_TS}, date_modified {_TS}, id bigint, name string,
        short_description string, backorders_allowed boolean,
        downloadable boolean, virtual boolean,
        exclude_from_all_discounting boolean, free_shipping boolean,
        product_inactive boolean, gift_card boolean,
        donor_premium boolean, royalty boolean, next_receipt_date date,
        brand string, product_isbn string, product_publisher string,
        impact string, product_language string, sub_brand string,
        status string, alg_wc_cog_cost {_DEC},
        fl_staff_price_field {_DEC}, msrp_price {_DEC}, price {_DEC},
        regular_price {_DEC}, sku string, weight {_DEC}, type string,
        stock_quantity bigint, case_qty bigint,
        product_page_count bigint, total_manuals bigint,
        timestamp bigint
    """,
    "woo_api_order_items": f"""
        store_wid bigint, rls_value string, order_item_id bigint,
        sync_timestamp {_TS}, date_created {_TS}, order_key string,
        order_number bigint, product_brand string,
        product_component_cost {_DEC}, product_component_id bigint,
        product_component_msrp {_DEC},
        product_component_regular_price {_DEC},
        product_component_sku string, product_cost {_DEC},
        product_dept string, product_discount {_DEC},
        product_donor_premium boolean, product_exclude_discounting string,
        product_free_shipping string, product_gift_card string,
        product_id bigint, product_impact string, product_inactive string,
        product_msrp {_DEC}, product_name string,
        product_next_receipt_date string, product_price {_DEC},
        product_project string, product_quantity bigint,
        product_regular_price {_DEC}, product_royalty string,
        product_sku string, product_subbrand string, product_tax {_DEC},
        product_total_manuals string, product_weight {_DEC},
        products_per_case bigint, bundled_by bigint, timestamp bigint
    """,
    "woo_api_product_bundles": f"""
        store_wid bigint, rls_value string, sync_timestamp {_TS},
        id {_DEC}, bundled_item_id {_DEC}, product_id {_DEC},
        quantity_default bigint, timestamp bigint
    """,
    "woo_api_product_categories": f"""
        store_wid bigint, rls_value string, sync_timestamp {_TS},
        product_id bigint, id bigint, name string, slug string,
        timestamp bigint
    """,
    "woo_api_product_attributes": f"""
        store_wid bigint, rls_value string, sync_timestamp {_TS},
        product_id bigint, id bigint, name string, slug string,
        option string, timestamp bigint
    """,
    "woo_api_refunds": f"""
        store_wid bigint, rls_value string, refund_number bigint,
        sync_timestamp {_TS}, agent_email string, agent_name string,
        date_created {_TS}, date_modified {_TS}, order_number bigint,
        parent_id bigint, shipping {_DEC}, shipping_tax {_DEC},
        subtotal {_DEC}, subtotal_tax {_DEC}, timestamp bigint,
        total {_DEC}
    """,
    "woo_api_refund_items": f"""
        store_wid bigint, rls_value string, refund_item_id bigint,
        sync_timestamp {_TS}, date_created {_TS}, order_number bigint,
        order_item_id bigint, product_component_cost {_DEC},
        product_cost {_DEC}, product_id bigint, product_name string,
        product_price {_DEC}, product_quantity bigint,
        product_sku string, product_tax {_DEC}, refund_number bigint,
        timestamp bigint
    """,
    # --- Geography (process-geography/main.py) -------------------------
    "geo_all_countries_raw": """
        geoname_id string, name string, asciiname string,
        alternate_names string, latitude string, longitude string,
        feature_class string, feature_code string, country_code string,
        cc2 string, admin_1_code string, admin_2_code string,
        admin_3_code string, admin_4_code string, population string,
        elevation string, dem string, timezone string,
        modification_date string
    """,
    "geo_all_countries": """
        geoname_id bigint, name string, name_ascii string,
        alternate_names string, latitude double, longitude double,
        feature_class string, feature_code string, country_code string,
        alternate_country_codes string, admin_1_code string,
        admin_2_code string, admin_3_code string, admin_4_code string,
        population bigint, elevation double,
        digital_elevation_model double, timezone string,
        modification_date date
    """,
    "geo_country_info": """
        iso_code string, iso3_code string, iso_numeric_code bigint,
        fips_code string, country_name string, Capital string,
        area_in_square_kilometers double, Population bigint,
        Continent string, top_level_domain string, currency_code string,
        currency_name string, phone string, Postal_Code_Format string,
        Postal_Code_Regex string, Languages string,
        country_geoname_id bigint, neighbors string
    """,
    "geo_admin_1_codes": """
        stateprovince_code string, stateprovince_name string,
        stateprovince_name_ascii string, stateprovince_geoname_id string
    """,
}


def struct_of(name: str) -> StructType:
    """Parse a registry schema into a StructType."""
    return StructType.fromDDL(DDL[name])


def columns_of(name: str) -> dict[str, str]:
    """Registry schema as an ordered name->type mapping (the shape
    align_schema consumes)."""
    return {f.name: f.dataType.simpleString() for f in struct_of(name).fields}


def align_to(df: DataFrame, name: str) -> DataFrame:
    """Project df onto a registry schema with the reference's
    reconciliation semantics (P1: cast matching, null missing, drop
    extra — okta-sync/main.py:544-584)."""
    return align_schema(df, columns_of(name))
