"""The two BFS execution paths (driver-local vs distributed iterative
join) must produce identical results — pinned against each other on the
fixture DAG and a random graph."""

from __future__ import annotations

import random

import pytest

from ariadne_dbt_spark.operators.graph import (
    DOWNSTREAM,
    UPSTREAM,
    _bfs_distributed,
    _bfs_local,
)


def _norm(df):
    return sorted((r.unique_id, r.distance) for r in df.collect())


@pytest.mark.parametrize("direction,start", [
    (UPSTREAM, ["model.webshop.dim_customers"]),
    (DOWNSTREAM, ["source.webshop.raw.orders", "source.webshop.raw.payments"]),
])
def test_paths_agree_on_fixture(index, direction, start):
    local = _norm(_bfs_local(index.edges, start, direction, 10, True))
    dist = _norm(_bfs_distributed(index.edges, start, direction, 10, True))
    assert local == dist, (direction, start)


def test_paths_agree_on_random_graph(spark):
    rnd = random.Random(11)
    edges = [
        (f"n{rnd.randrange(60)}", f"n{rnd.randrange(60)}")
        for _ in range(150)
    ]
    edf = spark.createDataFrame(edges, "parent_id string, child_id string").distinct().cache()
    starts = ["n0", "n7"]
    local = _norm(_bfs_local(edf, starts, DOWNSTREAM, 3, True))
    dist = _norm(_bfs_distributed(edf, starts, DOWNSTREAM, 3, True))
    assert local == dist


def test_cycle_terminates(spark):
    edf = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "parent_id string, child_id string"
    )
    out = _norm(_bfs_local(edf, ["a"], DOWNSTREAM, 10, True))
    assert out == [("b", 1), ("c", 2)]
    out2 = _norm(_bfs_distributed(edf, ["a"], DOWNSTREAM, 10, True))
    assert out == out2


def test_paths_agree_with_ord(spark):
    """with_ord ranks identically on both paths: the local path
    enumerates its sorted rows, the distributed path ranks via
    row_number — byte-identical (ord, unique_id, distance) triples."""
    import random

    rnd = random.Random(11)
    edges = {(f"n{rnd.randrange(40)}", f"n{rnd.randrange(40)}") for _ in range(120)}
    edf = spark.createDataFrame(sorted(edges), "parent_id string, child_id string")
    local = _bfs_local(edf, ["n0", "n1"], DOWNSTREAM, 4, True, True).collect()
    dist = _bfs_distributed(edf, ["n0", "n1"], DOWNSTREAM, 4, True, True).collect()
    as_triples = lambda rows: [(r.ord, r.unique_id, r.distance) for r in rows]
    assert as_triples(local) == as_triples(dist)
    assert [r.ord for r in local] == list(range(1, len(local) + 1))


def test_distributed_bfs_cache_lifecycle(spark):
    """Level caches are scoped to the call: after consuming and
    releasing the returned frame, no persistent RDDs remain (a serving
    session doing repeated lineage calls must not accumulate
    max_depth+1 blocks per call)."""
    from conftest import settle_persistent

    jsc = spark.sparkContext._jsc.sc()
    # drain earlier tests' queue; at the tail of a full-suite run the
    # ContextCleaner drains MUCH slower than in isolation (see the same
    # note in test_pagerank.py::test_no_cache_leak), so budgets are
    # generous — a REAL leak never drains regardless of budget
    settle_persistent(spark, 0, timeout=30.0)
    base = jsc.getPersistentRDDs().size()
    edf = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], "parent_id string, child_id string"
    )
    out = _bfs_distributed(edf, ["n0"], DOWNSTREAM, 5, True)
    assert out.count() == 5

    after = settle_persistent(spark, base + 1, timeout=240.0)
    assert after <= base + 1, f"leaked {after - base} persistent RDDs"
    # the result is localCheckpoint'd: release = drop the reference
    # (ContextCleaner), NOT unpersist() (a no-op on a LogicalRDD plan)
    del out
    assert settle_persistent(spark, base, timeout=240.0) <= base
