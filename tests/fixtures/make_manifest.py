"""Generates tests/fixtures/manifest.json — a hand-authored dbt manifest
(v12 shape) for a small "webshop" project whose model SQL executes
against the driver's TPC-H-ish parquet tables (FIXTURES.md §1-2).

Authored from the public dbt manifest schema
(schemas.getdbt.com/dbt/manifest/v12.json); content is original.
Run: python tests/fixtures/make_manifest.py
"""

from __future__ import annotations

import json
import os

P = "webshop"


def model(name, sql, deps, refs, sources, layer_dir, columns, description="", tags=None,
          materialized="view"):
    uid = f"model.{P}.{name}"
    return uid, {
        "unique_id": uid,
        "resource_type": "model",
        "name": name,
        "package_name": P,
        "database": "dev",
        "schema": "analytics",
        "alias": name,
        "path": f"{layer_dir}/{name}.sql",
        "original_file_path": f"models/{layer_dir}/{name}.sql",
        "fqn": [P, layer_dir, name],
        "raw_code": sql,
        "compiled_code": "",
        "language": "sql",
        "description": description,
        "tags": tags or [],
        "meta": {},
        "config": {"materialized": materialized, "tags": tags or []},
        "depends_on": {"nodes": deps, "macros": []},
        "refs": [{"name": r, "package": None, "version": None} for r in refs],
        "sources": sources,
        "columns": {
            c: {"name": c, "description": d, "data_type": t, "meta": {}, "tags": []}
            for c, t, d in columns
        },
    }


def test_node(name, test_type, model_name, column, kwargs=None):
    uid = f"test.{P}.{name}"
    return uid, {
        "unique_id": uid,
        "resource_type": "test",
        "name": name,
        "package_name": P,
        "path": f"{name}.sql",
        "original_file_path": f"models/schema.yml",
        "fqn": [P, name],
        "raw_code": "",
        "language": "sql",
        "description": "",
        "tags": [],
        "meta": {},
        "config": {"severity": "ERROR"},
        "depends_on": {"nodes": [f"model.{P}.{model_name}"], "macros": []},
        "refs": [{"name": model_name, "package": None, "version": None}],
        "sources": [],
        "columns": {},
        "column_name": column,
        "attached_node": f"model.{P}.{model_name}",
        "test_metadata": {"name": test_type, "kwargs": dict(kwargs or {}, column_name=column)},
    }


STG_ORDERS = """select
    o_orderkey as order_id,
    o_custkey as customer_id,
    o_totalprice as amount,
    o_orderstatus as status,
    o_orderdate as ordered_at
from {{ source('raw', 'orders') }}"""

STG_CUSTOMERS = """select
    c_custkey as customer_id,
    c_name as customer_name,
    c_mktsegment as segment
from {{ source('raw', 'customers') }}"""

STG_PAYMENTS = """select
    l_orderkey as order_id,
    l_linenumber as payment_line,
    l_extendedprice as amount,
    l_returnflag as payment_flag
from {{ source('raw', 'payments') }}"""

FCT_ORDERS = """with payments as (
    select order_id, sum(amount) as paid_amount
    from {{ ref('stg_payments') }}
    group by order_id
)
select
    o.order_id,
    o.customer_id,
    o.status,
    o.ordered_at,
    o.amount,
    coalesce(p.paid_amount, 0) as paid_amount
from {{ ref('stg_orders') }} o
left join payments p on o.order_id = p.order_id"""

DIM_CUSTOMERS = """with customer_orders as (
    select customer_id, count(*) as order_count, sum(amount) as lifetime_value
    from {{ ref('fct_orders') }}
    group by customer_id
)
select
    c.customer_id,
    c.customer_name,
    c.segment,
    coalesce(o.order_count, 0) as order_count,
    coalesce(o.lifetime_value, 0) as lifetime_value
from {{ ref('stg_customers') }} c
left join customer_orders o on c.customer_id = o.customer_id"""


def main():
    nodes = {}
    for uid, n in [
        model("stg_orders", STG_ORDERS, [f"source.{P}.raw.orders"], [], [["raw", "orders"]],
              "staging",
              [("order_id", "bigint", "order primary key"),
               ("customer_id", "bigint", "fk to customer"),
               ("amount", "double", "order amount"),
               ("status", "varchar", "order status"),
               ("ordered_at", "timestamp", "order timestamp")],
              "Staged raw orders, renamed to conformed columns.", ["staging", "orders"]),
        model("stg_customers", STG_CUSTOMERS, [f"source.{P}.raw.customers"], [],
              [["raw", "customers"]], "staging",
              [("customer_id", "bigint", "customer primary key"),
               ("customer_name", "varchar", "display name"),
               ("segment", "varchar", "market segment")],
              "Staged raw customers.", ["staging"]),
        model("stg_payments", STG_PAYMENTS, [f"source.{P}.raw.payments"], [],
              [["raw", "payments"]], "staging",
              [("order_id", "bigint", "fk to order"),
               ("payment_line", "int", "line number"),
               ("amount", "double", "payment amount"),
               ("payment_flag", "varchar", "return flag")],
              "Staged raw payments (one row per payment line).", ["staging"]),
        model("fct_orders", FCT_ORDERS,
              [f"model.{P}.stg_orders", f"model.{P}.stg_payments"],
              ["stg_orders", "stg_payments"], [], "marts",
              [("order_id", "bigint", "order primary key"),
               ("customer_id", "bigint", "fk to dim_customers"),
               ("status", "varchar", "order status"),
               ("ordered_at", "timestamp", "order timestamp"),
               ("amount", "double", "order amount"),
               ("paid_amount", "double", "total payments received")],
              "Order fact: one row per order with payment rollup.",
              ["marts", "core"], materialized="table"),
        model("dim_customers", DIM_CUSTOMERS,
              [f"model.{P}.stg_customers", f"model.{P}.fct_orders"],
              ["stg_customers", "fct_orders"], [], "marts",
              [("customer_id", "bigint", "customer primary key"),
               ("customer_name", "varchar", "display name"),
               ("segment", "varchar", "market segment"),
               ("order_count", "bigint", "lifetime order count"),
               ("lifetime_value", "double", "lifetime revenue")],
              "Customer dimension with lifetime metrics.",
              ["marts", "core"], materialized="table"),
        test_node("not_null_fct_orders_order_id", "not_null", "fct_orders", "order_id"),
        test_node("unique_fct_orders_order_id", "unique", "fct_orders", "order_id"),
        test_node("accepted_values_fct_orders_status", "accepted_values", "fct_orders",
                  "status", {"values": ["P", "O", "F"]}),
        test_node("not_null_stg_orders_order_id", "not_null", "stg_orders", "order_id"),
        test_node("relationships_fct_orders_customer_id", "relationships", "fct_orders",
                  "customer_id", {"to": "ref('stg_customers')", "field": "customer_id"}),
    ]:
        nodes[uid] = n

    sources = {}
    for tbl, ident, cols in [
        ("orders", "orders.parquet",
         [("o_orderkey", "bigint"), ("o_custkey", "bigint"), ("o_orderstatus", "varchar"),
          ("o_totalprice", "double"), ("o_orderdate", "timestamp"),
          ("o_orderpriority", "varchar")]),
        ("customers", "customer.parquet",
         [("c_custkey", "bigint"), ("c_name", "varchar"), ("c_nationkey", "int"),
          ("c_acctbal", "double"), ("c_mktsegment", "varchar")]),
        ("payments", "lineitem.parquet",
         [("l_orderkey", "bigint"), ("l_linenumber", "int"), ("l_extendedprice", "double"),
          ("l_returnflag", "varchar")]),
    ]:
        uid = f"source.{P}.raw.{tbl}"
        sources[uid] = {
            "unique_id": uid,
            "resource_type": "source",
            "name": tbl,
            "source_name": "raw",
            "package_name": P,
            "database": "dev",
            "schema": "raw",
            "identifier": ident,
            "loader": "parquet",
            "description": f"Raw {tbl} landing table.",
            "columns": {c: {"name": c, "data_type": t, "description": ""} for c, t in cols},
            "meta": {},
            "tags": [],
            "freshness": {
                "warn_after": {"count": 12, "period": "hour"},
                "error_after": {"count": 24, "period": "hour"},
            },
            "fqn": [P, "raw", tbl],
        }

    macros = {
        f"macro.{P}.cents_to_dollars": {
            "unique_id": f"macro.{P}.cents_to_dollars",
            "resource_type": "macro",
            "name": "cents_to_dollars",
            "package_name": P,
            "path": "macros/cents_to_dollars.sql",
            "original_file_path": "macros/cents_to_dollars.sql",
            "macro_sql": "{% macro cents_to_dollars(column_name) %}"
                         "cast({{ column_name }} / 100.0 as decimal(10,2))"
                         "{% endmacro %}",
            "description": "Convert integer cents to a dollars decimal.",
            "arguments": [{"name": "column_name", "type": "column", "description": ""}],
            "depends_on": {"macros": []},
        }
    }

    exposures = {
        f"exposure.{P}.orders_dashboard": {
            "unique_id": f"exposure.{P}.orders_dashboard",
            "resource_type": "exposure",
            "name": "orders_dashboard",
            "label": "Orders Dashboard",
            "type": "dashboard",
            "url": "https://bi.example.com/orders",
            "description": "Executive revenue dashboard.",
            "owner": {"name": "Data Team", "email": "data@example.com"},
            "depends_on": {"nodes": [f"model.{P}.fct_orders", f"model.{P}.dim_customers"]},
            "tags": ["reporting"],
            "fqn": [P, "orders_dashboard"],
        }
    }

    parent_map = {
        f"model.{P}.stg_orders": [f"source.{P}.raw.orders"],
        f"model.{P}.stg_customers": [f"source.{P}.raw.customers"],
        f"model.{P}.stg_payments": [f"source.{P}.raw.payments"],
        f"model.{P}.fct_orders": [f"model.{P}.stg_orders", f"model.{P}.stg_payments"],
        f"model.{P}.dim_customers": [f"model.{P}.stg_customers", f"model.{P}.fct_orders"],
        f"test.{P}.not_null_fct_orders_order_id": [f"model.{P}.fct_orders"],
        f"test.{P}.unique_fct_orders_order_id": [f"model.{P}.fct_orders"],
        f"test.{P}.accepted_values_fct_orders_status": [f"model.{P}.fct_orders"],
        f"test.{P}.not_null_stg_orders_order_id": [f"model.{P}.stg_orders"],
        f"test.{P}.relationships_fct_orders_customer_id": [
            f"model.{P}.fct_orders", f"model.{P}.stg_customers"],
        f"exposure.{P}.orders_dashboard": [
            f"model.{P}.fct_orders", f"model.{P}.dim_customers"],
    }
    child_map: dict[str, list[str]] = {}
    for child, parents in parent_map.items():
        for p in parents:
            child_map.setdefault(p, []).append(child)

    manifest = {
        "metadata": {
            "dbt_schema_version": "https://schemas.getdbt.com/dbt/manifest/v12.json",
            "dbt_version": "1.8.0",
            "project_name": P,
            "adapter_type": "spark",
            "generated_at": "2026-01-01T00:00:00Z",
        },
        "nodes": nodes,
        "sources": sources,
        "macros": macros,
        "exposures": exposures,
        "parent_map": parent_map,
        "child_map": child_map,
    }
    out = os.path.join(os.path.dirname(__file__), "manifest.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
