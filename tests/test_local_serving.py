"""The driver-local serving path (LocalIndexCache) must reproduce the
DataFrame operators' results exactly — it is the latency mitigation for
the reference's interactive P95 targets (BASELINE.md), so its semantics
are pinned here against the Spark path on the fixture index."""

from __future__ import annotations

import pytest

from ariadne_dbt_spark.operators.capsule import CapsuleBuilder
from ariadne_dbt_spark.operators.lineage import get_lineage
from ariadne_dbt_spark.operators.model_search import search_models
from ariadne_dbt_spark.operators.patterns import extract_patterns


@pytest.fixture(scope="module")
def cache(index):
    return index.local()


def test_local_search_matches_spark(index, cache):
    for query, intent in (("customer orders", "explore"), ("payment", "debug")):
        spark_hits = [
            (r.unique_id, round(r.score, 9))
            for r in search_models(index, query, intent=intent, limit=10).collect()
        ]
        local_hits = [
            (h["unique_id"], round(h["score"], 9))
            for h in cache.search(query, intent=intent, limit=10)
        ]
        assert spark_hits == local_hits


def test_local_lineage_matches_spark(index, cache):
    mid = "model.webshop.stg_orders"
    spark_rows = [
        (r.unique_id, r.distance, r.relationship)
        for r in get_lineage(index, mid, depth=3).collect()
    ]
    local_rows = [
        (r["unique_id"], r["distance"], r["relationship"])
        for r in cache.lineage(mid, depth=3)
    ]
    assert spark_rows == local_rows


def test_local_patterns_match_spark(index, cache):
    sp = extract_patterns(index)
    lo = cache.patterns()
    for key in (
        "models_per_layer", "materializations", "examples", "naming",
        "coverage", "top_tags", "best_tested",
    ):
        assert lo[key] == sp[key], key
    assert lo["stats"] == {
        k: sp["stats"][k]
        for k in ("models", "sources", "tests", "macros", "exposures", "columns")
    }


def test_local_capsule_matches_spark(index, cache):
    task = "debug failing test on orders"
    sp = CapsuleBuilder(index).build(task, token_budget=8000).to_dict()
    lo = cache.capsule(task, token_budget=8000)
    assert lo["intent"] == sp["intent"]
    assert lo["confidence"] == sp["confidence"]
    for section in ("pivots", "upstream", "downstream"):
        assert [x["unique_id"] for x in lo[section]] == [
            x["unique_id"] for x in sp[section]
        ], section
    assert [t["unique_id"] for t in lo["tests"]] == [t["unique_id"] for t in sp["tests"]]
    assert lo["similar_models"] == sp["similar_models"]
    assert [s["unique_id"] for s in lo["sources"]] == [
        s["unique_id"] for s in sp["sources"]
    ]


def test_local_capsule_respects_budget(cache):
    cap = cache.capsule("add a new revenue metric", token_budget=2000)
    assert cap["token_estimate"] <= 1.2 * 2000  # reference invariant


def test_local_discover_matches_spark(index, cache):
    for kwargs in (
        {"task": "debug revenue order totals"},
        {"task": "add a column", "focus_model": "fct_orders"},
        {"task": "explore payments", "entry_models": ["stg_payments"], "limit": 10},
    ):
        task = kwargs.pop("task")
        spark_rows = CapsuleBuilder(index).discover(task, **kwargs)
        local_rows = cache.discover(task, **kwargs)
        assert local_rows == spark_rows
