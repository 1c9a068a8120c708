"""Generate catalog.json + run_results.json companions to manifest.json
(fixture shapes follow the public dbt artifact schemas: catalog v1 nodes
with stats/columns, run_results v6 results with timing). Run once; the
outputs are committed so the DuckDB oracles can read the same files."""

from __future__ import annotations

import json
import os

P = "webshop"

CATALOG = {
    "metadata": {"dbt_schema_version": "https://schemas.getdbt.com/dbt/catalog/v1.json"},
    "nodes": {
        f"model.{P}.fct_orders": {
            "metadata": {"name": "fct_orders", "schema": "analytics",
                         "last_modified": "2026-01-02T03:04:05Z"},
            "stats": {
                "num_rows": {"id": "num_rows", "label": "Rows", "value": 15000},
                "num_bytes": {"id": "num_bytes", "label": "Bytes", "value": 1234567},
            },
            "columns": {
                "order_id": {"name": "order_id", "type": "BIGINT", "index": 1},
                "customer_id": {"name": "CUSTOMER_ID", "type": "BIGINT", "index": 2},
                "amount": {"name": "amount", "type": "DOUBLE", "index": 3},
            },
        },
        f"model.{P}.dim_customers": {
            "metadata": {"name": "dim_customers", "schema": "analytics",
                         "last_modified": "2026-01-02T03:04:06Z"},
            "stats": {
                "num_rows": {"id": "num_rows", "label": "Rows", "value": 1500},
            },
            "columns": {
                "customer_id": {"name": "customer_id", "type": "BIGINT", "index": 1},
                "lifetime_value": {"name": "lifetime_value", "type": "DOUBLE", "index": 2},
            },
        },
    },
    "sources": {},
}

RUN_RESULTS = {
    "metadata": {"dbt_schema_version": "https://schemas.getdbt.com/dbt/run-results/v6.json"},
    "results": [
        {
            "unique_id": f"test.{P}.not_null_fct_orders_order_id",
            "status": "pass", "failures": 0,
            "timing": [
                {"name": "compile", "started_at": "2026-01-02T03:00:00.000000Z",
                 "completed_at": "2026-01-02T03:00:00.250000Z"},
                {"name": "execute", "started_at": "2026-01-02T03:00:00.250000Z",
                 "completed_at": "2026-01-02T03:00:01.000000Z"},
            ],
        },
        {
            "unique_id": f"test.{P}.unique_fct_orders_order_id",
            "status": "pass", "failures": 0,
            "timing": [
                {"name": "execute", "started_at": "2026-01-02T03:00:01.000000Z",
                 "completed_at": "2026-01-02T03:00:01.500000Z"},
            ],
        },
        {
            "unique_id": f"test.{P}.accepted_values_fct_orders_status",
            "status": "fail", "failures": 3,
            "timing": [
                {"name": "execute", "started_at": "2026-01-02T03:00:02.000000Z",
                 "completed_at": "2026-01-02T03:00:02.125000Z"},
            ],
        },
        {
            "unique_id": f"model.{P}.fct_orders",
            "status": "success", "failures": None,
            "timing": [],
        },
    ],
}


def main():
    here = os.path.dirname(__file__)
    for name, obj in (("catalog.json", CATALOG), ("run_results.json", RUN_RESULTS)):
        out = os.path.join(here, name)
        with open(out, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
