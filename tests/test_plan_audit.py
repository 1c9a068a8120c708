"""Physical-plan audits: the SCALE.md claims, asserted on executedPlan.

These queries' wall-clock varies with sandbox load; their PLAN SHAPE is
the stable contract — filters reach the parquet scan, projections prune
the read schema, dims broadcast, top-k never global-sorts.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    from ariadne_dbt_spark.workloads import load_all

    return load_all()


def _plan(spark, registry, name):
    df = registry[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark, registry):
    plan = _plan(spark, registry, "pricing_summary")
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:200]
    # projection pruning: the wide lineitem scan must NOT read unused cols
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_orderkey" not in read


def test_dims_broadcast_not_shuffled(spark, registry):
    plan = _plan(spark, registry, "revenue_by_region")
    assert plan.count("BroadcastHashJoin") >= 3  # region, nation, customer(+agg side)


def test_topk_compiles_to_take_ordered(spark, registry):
    plan = _plan(spark, registry, "topk_active_users")
    assert "TakeOrderedAndProject" in plan  # no global Sort materializes


def test_semi_join_for_in_list(spark, registry):
    plan = _plan(spark, registry, "customers_with_urgent_orders")
    assert "Semi" in plan  # IN-list runs as a semi join, not inner+distinct


def test_multimodal_payload_pruned(spark, tmp_path):
    """Binary payloads must not be read by metadata-only queries."""
    from ariadne_dbt_spark.operators.multimodal import metadata_stats, synthetic_assets

    tmp = str(tmp_path / "assets.parquet")
    synthetic_assets(spark, 32).write.mode("overwrite").parquet(tmp)
    stats = metadata_stats(spark.read.parquet(tmp))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema:" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "payload" not in read


def test_bm25_query_term_filter_pushed(spark, registry):
    """The persisted-index BM25 query must push its term isin predicate
    into the postings parquet scan (SCALE.md search section)."""
    plan = _plan(spark, registry, "bm25_search")
    pushed = plan.split("PushedFilters:")[1][:300] if "PushedFilters:" in plan else ""
    assert "term" in pushed and "In(" in pushed


def test_bm25_query_runs_no_stats_aggregate(spark, registry):
    """avgdl/n_docs come from persisted index metadata — the query plan
    must not aggregate docstats beyond the per-doc dl join (no avg())."""
    plan = _plan(spark, registry, "bm25_search")
    assert "avg(" not in plan.lower().replace("avgdl", "")


def test_ngram_prefix_exchange_ceiling(spark):
    """The PPJoin prefix path's exchange count is pinned: candidate
    dedup aggregates by id_a (reusing sh's id-hash partitioning for the
    verification join) instead of a (id_a, id_b) distinct, which would
    add an extra re-shuffle before the join. A regression past this
    ceiling means a new exchange crept into the hot path."""
    from ariadne_dbt_spark.operators.dedup import _jaccard_pairs_prefix, shingle_sets

    corpus = spark.read.parquet(f"{SF}/documents.parquet")
    sh = shingle_sets(corpus, "doc_id", "text", 3).cache()
    try:
        sh.count()
        out = _jaccard_pairs_prefix(sh, 0.8, dedup_via_set=True)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 14, plan
        # the unproven-safe fallback (no max-df probe) costs at most one
        # extra exchange for its (id_a, id_b) distinct
        safe = _jaccard_pairs_prefix(sh, 0.8)
        safe_plan = safe._jdf.queryExecution().executedPlan().toString()
        assert safe_plan.count("Exchange hashpartitioning") <= 15, safe_plan
    finally:
        sh.unpersist()
