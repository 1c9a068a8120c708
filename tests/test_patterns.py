"""Pattern extraction golden values (reference: tests/test_patterns.py)."""

from __future__ import annotations

from ariadne_dbt_spark.operators.patterns import (
    best_tested_model,
    coverage_by_layer,
    extract_patterns,
    materialization_by_layer,
    models_per_layer,
    naming_prefixes,
    project_stats,
    tag_frequency,
)


def test_project_stats(index):
    s = project_stats(index)
    assert s["models"] == 5
    assert s["sources"] == 3
    assert s["tests"] == 5
    assert s["macros"] == 1
    assert s["exposures"] == 1
    assert s["tested_columns"] == 4  # fct:order_id,status,customer_id + stg:order_id
    assert s["source_schemas"] == 1


def test_models_per_layer(index):
    hist = {r.layer: r.n for r in models_per_layer(index).collect()}
    assert hist == {"staging": 3, "marts": 2}


def test_materialization_mode(index):
    mode = {
        r.layer: r.dominant_materialization
        for r in materialization_by_layer(index).collect()
    }
    assert mode == {"staging": "view", "marts": "table"}


def test_naming_prefixes(index):
    pref = {r.layer: r.dominant_prefix for r in naming_prefixes(index).collect()}
    assert pref["staging"] == "stg"
    assert pref["marts"] in ("dim", "fct")  # tie → lexicographic smallest


def test_coverage_by_layer(index):
    cov = {r.layer: (r.total_columns, r.tested_columns) for r in coverage_by_layer(index).collect()}
    assert cov["marts"] == (11, 3)
    assert cov["staging"] == (12, 1)


def test_tag_frequency(index):
    tags = dict((r.tag, r.n) for r in tag_frequency(index).collect())
    assert tags["staging"] == 3
    assert tags["marts"] == 2
    assert tags["core"] == 2


def test_best_tested(index):
    bt = best_tested_model(index)
    assert bt["model_id"] == "model.webshop.fct_orders"
    # not_null, unique, accepted_values, relationships
    assert bt["test_types"] == 4


def test_extract_patterns_bundle(index):
    p = extract_patterns(index)
    assert p["stats"]["models"] == 5
    assert p["examples"]["marts"] in ("fct_orders", "dim_customers")
    assert isinstance(p["top_tags"], list)
