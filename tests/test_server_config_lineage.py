"""Tool server round-trips, config discovery, column lineage extraction."""

from __future__ import annotations

import io
import json

import pytest

from ariadne_dbt_spark.operators.column_lineage import (
    build_column_lineage,
    extract_column_lineage,
)
from ariadne_dbt_spark.project_config import discover
from ariadne_dbt_spark.server import ToolServer


@pytest.fixture(scope="module")
def server(index, tmp_path_factory):
    return ToolServer(index, usage_dir=str(tmp_path_factory.mktemp("usage")))


def _call(server, tool, **args):
    return server.handle({"id": 1, "tool": tool, "args": args})


def test_server_search(server):
    resp = _call(server, "search_models", query="customer revenue", limit=3)
    assert resp["status"] == "ok"
    assert resp["result"]["results"][0]["name"] == "dim_customers"


def test_server_model_details(server):
    resp = _call(server, "get_model_details", model_name="fct_orders")
    r = resp["result"]
    assert r["model"]["layer"] == "marts"
    assert r["coverage"]["total_columns"] == 6
    assert any(c["name"] == "order_id" and c["is_primary_key"] for c in r["columns"])
    # reference parity: executable SQL, tests list, 1-hop neighbor names
    # (reference server.py:179-231), and unique_id lookup fallback
    assert "select" in r["compiled_sql"].lower()
    assert {t["test_type"] for t in r["tests"]} >= {"not_null"}
    assert "stg_orders" in r["upstream"]
    by_id = _call(
        server, "get_model_details", model_name=r["model"]["unique_id"]
    )["result"]
    assert by_id["model"]["unique_id"] == r["model"]["unique_id"]


def test_server_capsule_and_usage_logged(server):
    resp = _call(server, "get_context_capsule", task="debug failing test on fct_orders",
                 token_budget=3000)
    assert resp["result"]["intent"] == "debug"
    stats = _call(server, "usage_stats", days=10)["result"]
    assert stats["total_calls"] >= 3
    assert "get_context_capsule" in stats["by_tool"]


def test_server_unknown_tool(server):
    resp = server.handle({"id": 9, "tool": "nope"})
    assert "unknown tool" in resp["error"]


def test_server_bad_args(server):
    resp = _call(server, "get_lineage", bogus=True)
    assert "bad arguments" in resp["error"]


def test_serve_jsonlines(server):
    infile = io.StringIO(
        json.dumps({"id": 1, "tool": "get_project_patterns", "args": {}}) + "\n"
        + "not json\n"
    )
    out = io.StringIO()
    server.serve(infile, out)
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert lines[0]["result"]["stats"]["models"] == 5
    assert "bad json" in lines[1]["error"]


def test_config_discovery(tmp_path, monkeypatch):
    proj = tmp_path / "proj" / "sub"
    proj.mkdir(parents=True)
    (tmp_path / "proj" / "dbt_project.yml").write_text("name: demo")
    (tmp_path / "proj" / "ariadne_spark.toml").write_text(
        "[engine]\ntoken_budget = 4321\n"
    )
    (tmp_path / "proj" / "target").mkdir()
    (tmp_path / "proj" / "target" / "catalog.json").write_text("{}")
    cfg = discover(str(proj))
    assert cfg.project_root == str(tmp_path / "proj")
    assert cfg.token_budget == 4321
    assert cfg.manifest_path.endswith("target/manifest.json")
    assert cfg.catalog_path.endswith("catalog.json")
    assert cfg.run_results_path is None  # doesn't exist


def test_column_lineage_staging():
    rows = extract_column_lineage(
        "stg_orders",
        "select o_orderkey as order_id, o_custkey as customer_id, o_totalprice\n"
        "from {{ source('raw', 'orders') }}",
    )
    by_target = {r["target_column"]: r for r in rows}
    assert by_target["order_id"]["transformation"] == "renamed"
    assert by_target["order_id"]["source_column"] == "o_orderkey"
    assert by_target["order_id"]["source_relation"] == "source:raw.orders"
    assert by_target["o_totalprice"]["transformation"] == "direct"


def test_column_lineage_mart():
    sql = """with payments as (
        select order_id, sum(amount) as paid_amount
        from {{ ref('stg_payments') }} group by order_id)
    select o.order_id, o.status,
           coalesce(p.paid_amount, 0) as paid_amount,
           sum(o.amount) as total_amount
    from {{ ref('stg_orders') }} o left join payments p on o.order_id = p.order_id
    group by 1, 2, 3"""
    rows = {r["target_column"]: r for r in extract_column_lineage("fct", sql)}
    assert rows["order_id"]["transformation"] == "direct"
    assert rows["order_id"]["source_relation"] == "model:stg_orders"
    assert rows["paid_amount"]["transformation"] == "derived"
    assert rows["total_amount"]["transformation"] == "aggregated"
    assert rows["total_amount"]["source_relation"] == "model:stg_orders"


def test_column_lineage_dataframe(spark, index):
    from ariadne_dbt_spark.ingest.manifest import load_manifest, parse_models
    from tests.conftest import MANIFEST

    models = parse_models(load_manifest(MANIFEST))
    df = build_column_lineage(spark, models)
    assert df.count() >= 20
    kinds = {r.transformation for r in df.collect()}
    assert {"direct", "renamed", "derived"} <= kinds
