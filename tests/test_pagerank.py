"""PageRank pinned against a dense NumPy power iteration with the same
teleport + dangling-mass semantics (the workload registers rows-only —
double summation order is executor-dependent — so THIS is the
correctness evidence for the operator)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _numpy_pagerank(edge_list, damping=0.85, iters=10):
    nodes = sorted({a for a, _ in edge_list} | {b for _, b in edge_list})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edge_list:
        outdeg[ix[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        for a, b in edge_list:
            contrib[ix[b]] += r[ix[a]] / outdeg[ix[a]]
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[ix[v]] for v in nodes}


@pytest.fixture(scope="module")
def chain_and_star(spark):
    # a -> b -> c (chain, c dangling) plus hub d pointed at by a,b,c
    edges = [("a", "b"), ("b", "c"), ("a", "d"), ("b", "d"), ("c", "d")]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["parent_id", "child_id"]),
        "parent_id string, child_id string",
    )
    return edges, df


def test_matches_numpy_power_iteration(spark, chain_and_star):
    from ariadne_dbt_spark.operators.graph import pagerank

    edge_list, df = chain_and_star
    got = {r["unique_id"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    exp = _numpy_pagerank(edge_list, iters=10)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)


def test_ranks_sum_to_one(spark, chain_and_star):
    from ariadne_dbt_spark.operators.graph import pagerank

    _, df = chain_and_star
    total = sum(r["rank"] for r in pagerank(df, iters=8).collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_hub_outranks_leaves(spark, chain_and_star):
    from ariadne_dbt_spark.operators.graph import pagerank

    _, df = chain_and_star
    rows = pagerank(df, iters=10).collect()
    assert rows[0]["unique_id"] == "d"


def test_no_cache_leak(spark, chain_and_star):
    from conftest import settle_persistent

    from ariadne_dbt_spark.operators.graph import pagerank

    _, df = chain_and_star
    jsc = spark.sparkContext._jsc.sc()
    # settle leftovers from earlier tests first so `base` is a floor,
    # not a snapshot of entries already queued for ContextCleaner — give
    # this the FULL poll budget: as the suite grows, more GC-released
    # checkpoints from prior tests are still draining when this test
    # starts, and a short-settled base undercounts the floor (observed:
    # base=7 with 5s settle, then a false "leak" of entries that were
    # never pagerank's)
    settle_persistent(spark, 0, timeout=30.0)
    base = jsc.getPersistentRDDs().size()
    out = pagerank(df, iters=3)
    assert out.count() > 0
    # every per-iteration checkpoint is released; only the returned
    # result checkpoint holds storage (bfs()/ngram contract).
    # localCheckpoint release rides Python+JVM GC -> ContextCleaner,
    # so the check is a GC-nudged bounded poll, not a snapshot. At the
    # tail of a 30-minute full-suite run the cleaner's weak-ref queue
    # drains MUCH slower than in isolation (round 8: a 60s budget
    # false-flagged 6 entries that a later settle released), so the
    # budget is generous — a REAL leak (live reference) never drains,
    # no matter the budget, so patience costs nothing but wall-clock
    # in the failure case.
    after = settle_persistent(spark, base + 1, timeout=240.0)
    assert after <= base + 1, f"leaked {after - base} persistent RDDs"
    # the result is localCheckpoint'd: release = drop the reference
    # (ContextCleaner), NOT unpersist() (a no-op on a LogicalRDD plan)
    del out
    assert settle_persistent(spark, base, timeout=240.0) <= base


def _numpy_ppr(edge_list, seeds, damping=0.85, iters=10):
    nodes = sorted({a for a, _ in edge_list} | {b for _, b in edge_list})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edge_list:
        outdeg[ix[a]] += 1
    p = np.zeros(n)
    for s in seeds:
        p[ix[s]] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        for a, b in edge_list:
            contrib[ix[b]] += r[ix[a]] / outdeg[ix[a]]
        r = (1 - damping + damping * dangling) * p + damping * contrib
    return {v: r[ix[v]] for v in nodes}


def test_personalized_matches_numpy(spark, chain_and_star):
    from ariadne_dbt_spark.operators.graph import personalized_pagerank

    edge_list, df = chain_and_star
    got = {
        r["unique_id"]: r["rank"]
        for r in personalized_pagerank(df, ["a"], iters=10).collect()
    }
    exp = _numpy_ppr(edge_list, ["a"], iters=10)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)


def test_personalized_mass_conserved_and_localized(spark, chain_and_star):
    from ariadne_dbt_spark.operators.graph import personalized_pagerank

    edge_list, df = chain_and_star
    rows = personalized_pagerank(df, ["a"], iters=12).collect()
    got = {r["unique_id"]: r["rank"] for r in rows}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # teleport returns to 'a': it must outrank the symmetric non-seed 'b'
    assert got["a"] > got["b"]
    # two seeds split the teleport mass
    two = {
        r["unique_id"]: r["rank"]
        for r in personalized_pagerank(df, ["a", "c"], iters=12).collect()
    }
    assert two["c"] > got["c"]


def test_personalized_empty_seeds_raises(spark, chain_and_star):
    from ariadne_dbt_spark.operators.graph import personalized_pagerank

    _, df = chain_and_star
    with pytest.raises(ValueError):
        personalized_pagerank(df, [])
