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


# --- z-score anomaly flags (planted spike) --------------------------------


def test_zscore_anomaly_planted_spike(spark):
    """30 flat days then one 10x spike: the spike (and only the spike)
    flags; the flat run never does. Exercises the TRUE branch the
    uniform driver data cannot reach."""
    import datetime as dt

    from ariadne_dbt_spark.workloads.timeseries import zscore_anomaly_flags

    d0 = dt.date(2024, 1, 1)
    rows = [(d0 + dt.timedelta(days=i), 1_000_000 + (i % 3) * 10_000) for i in range(30)]
    rows.append((d0 + dt.timedelta(days=30), 10_000_000))  # spike
    rows.append((d0 + dt.timedelta(days=31), 1_010_000))  # back to normal
    daily = spark.createDataFrame(rows, "event_date date, x long")
    out = {r["event_date"]: r["is_anomaly"] for r in zscore_anomaly_flags(daily).collect()}
    assert out[d0 + dt.timedelta(days=30)] is True
    flagged = [d for d, a in out.items() if a]
    assert flagged == [d0 + dt.timedelta(days=30)]


def test_k_anonymity_small_group_flags(spark):
    from ariadne_dbt_spark.operators.patterns import k_anonymity_report

    rows = [("a", "x")] * 6 + [("a", "y")] * 2 + [("b", "x")] * 2
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r["qi"]: r for r in k_anonymity_report(df, qi_cols=["qi"], sensitive_col="s").collect()}
    assert out["a"]["group_size"] == 8 and out["a"]["k_anonymous"] and out["a"]["l_diverse"]
    # group b: big enough? no (2 < 5); diverse? no (1 value)
    assert not out["b"]["k_anonymous"] and not out["b"]["l_diverse"]
