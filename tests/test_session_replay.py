"""Session-replay behavioral benchmark (reference:
benchmarks/session_analysis.py methodology over committed synthetic
transcripts)."""

from __future__ import annotations

import os

import pytest

from ariadne_dbt_spark.benchmarks.session_replay import (
    compare_session,
    detect_focus_model,
    parse_session,
    replay_sessions,
)

SESSIONS = os.path.join(os.path.dirname(__file__), "fixtures", "sessions")


def test_parse_session_phases_and_models():
    s = parse_session(os.path.join(SESSIONS, "debug_fct_orders.jsonl"))
    assert s.task.startswith("debug the failing not_null test")
    # 4 context calls before the Edit; Edit + post-impl dbt-test Bash are impl
    assert [c.name for c in s.context_calls] == ["Read", "Grep", "Read", "Bash"]
    assert len(s.impl_calls) == 2
    assert s.models_explored == {"fct_orders", "stg_payments", "stg_orders"}


def test_bash_classification():
    s = parse_session(os.path.join(SESSIONS, "debug_fct_orders.jsonl"))
    # `cat models/...` is context; `dbt test` is implementation
    ctx_bash = [c for c in s.context_calls if c.name == "Bash"]
    impl_bash = [c for c in s.impl_calls if c.name == "Bash"]
    assert len(ctx_bash) == 1 and "cat" in ctx_bash[0].input["command"]
    assert len(impl_bash) == 1 and "dbt test" in impl_bash[0].input["command"]


def test_detect_focus_model_longest_match():
    names = {"fct_orders", "stg_orders", "dim_customers"}
    assert detect_focus_model("fix the fct_orders amount bug", names) == "fct_orders"
    # longest (most specific) match wins when several appear
    assert (
        detect_focus_model("compare stg_orders with dim_customers", names)
        == "dim_customers"
    )
    assert detect_focus_model("nothing relevant here", names) is None


def test_compare_session_metrics():
    s = parse_session(os.path.join(SESSIONS, "debug_fct_orders.jsonl"))
    capsule = {
        "pivots": [{"name": "fct_orders"}],
        "upstream": [{"name": "stg_payments"}],
        "downstream": [],
        "similar_models": [],
    }
    names = {"fct_orders", "stg_payments", "stg_orders", "dim_customers"}
    row = compare_session(s, capsule, names)
    # agent explored 3 models, capsule covers 2 of them
    assert row["overlap_pct"] == round(100.0 * 2 / 3, 1)
    # saved calls: read fct_orders, grep stg_payments, read stg_payments;
    # the stg_orders cat is NOT covered
    assert row["potential_savings"] == 3


def test_ab_entry_models(index):
    from ariadne_dbt_spark.benchmarks.session_replay import ab_entry_models

    out = ab_entry_models(index, SESSIONS, early_calls=3)
    assert out["sessions"] == 3
    # feeding discovered models back can only widen coverage on this corpus
    assert out["avg_overlap_b"] >= out["avg_overlap_a"] - 1e-9
    by_id = {r["session_id"]: r for r in out["per_session"]}
    assert "fct_orders" in by_id["debug_fct_orders"]["entry_models"]


def test_diagnose_misses(index):
    from ariadne_dbt_spark.benchmarks.session_replay import diagnose_misses

    out = diagnose_misses(index, SESSIONS)
    # every miss row carries a reachability verdict
    for r in out["per_miss"]:
        assert ("min_dag_distance" in r) and isinstance(r["reachable"], bool)
    assert out["reachable_misses"] <= out["misses"]


def test_replay_against_real_capsules(index):
    out = replay_sessions(index, SESSIONS)
    assert out["sessions"] == 3
    by_id = {r["session_id"]: r for r in out["per_session"]}
    assert by_id["debug_fct_orders"]["focus_model"] == "fct_orders"
    # debug intent traverses up 2 / down 1 from fct_orders → covers
    # everything the synthetic agent explored
    assert by_id["debug_fct_orders"]["overlap_pct"] == 100.0
    assert out["avg_overlap_pct"] >= 80.0
    assert out["total_potential_savings"] >= 6


def test_ab_discover(index):
    from ariadne_dbt_spark.benchmarks.session_replay import ab_discover

    out = ab_discover(index, SESSIONS, early_calls=3)
    assert out["sessions"] == 3
    # discovery can only add coverage: B counts discovered names as seen
    assert out["avg_overlap_b"] >= out["avg_overlap_a"] - 1e-9
    for r in out["per_session"]:
        assert 0.0 <= r["overlap_a"] <= 100.0 and 0.0 <= r["overlap_b"] <= 100.0


@pytest.fixture(scope="module")
def big_index(spark, tmp_path_factory):
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "make_big_manifest",
        os.path.join(os.path.dirname(__file__), "fixtures", "make_big_manifest.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    p = tmp_path_factory.mktemp("beh") / "manifest_60.json"
    with open(p, "w") as f:
        _json.dump(mod.make_manifest(60), f)
    from ariadne_dbt_spark.ingest.indexer import AriadneIndex

    return AriadneIndex.build(spark, str(p))


SESSIONS_BIG = os.path.join(os.path.dirname(__file__), "fixtures", "sessions_big")


def test_big_replay_is_non_degenerate(big_index):
    """On a 60-model DAG the capsule genuinely misses models the agent
    explored — overlap sits strictly between 0 and 100."""
    out = replay_sessions(big_index, SESSIONS_BIG)
    assert out["sessions"] == 3
    assert 0.0 < out["avg_overlap_pct"] < 100.0
    assert any(r["overlap_pct"] < 100.0 for r in out["per_session"])


def test_big_ab_discover_uplift(big_index):
    """Discover→pick→capsule must recover coverage the plain capsule
    missed (reference ab_discover's headline claim)."""
    from ariadne_dbt_spark.benchmarks.session_replay import ab_discover

    out = ab_discover(big_index, SESSIONS_BIG)
    assert out["avg_overlap_b"] > out["avg_overlap_a"]


def test_big_miss_diagnosis_reachable(big_index):
    """The planted misses are DAG-reachable at distance 2 — the signal
    that traversal depth (not search recall) is the tuning lever."""
    from ariadne_dbt_spark.benchmarks.session_replay import diagnose_misses

    out = diagnose_misses(big_index, SESSIONS_BIG)
    assert out["misses"] >= 2
    assert out["reachable_misses"] >= 2
    assert all(r["min_dag_distance"] == 2 for r in out["per_miss"] if r["reachable"])
