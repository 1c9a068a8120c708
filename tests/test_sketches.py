"""Mergeable sketch tables (operators/sketches.py).

The contracts under test are the ones the 100 TB design leans on:

* CMS payload round-trip: parse(serialize(x)) is byte-identical, and
  the NumPy bucket formula reads back PLANTED EXACT counts from a
  Spark-built sketch (wide sketch, few items → zero collisions), which
  pins both the serialization layout and the hash fold against the
  engine, not against this module's own math.
* Merging per-partition CMS sketches is byte-identical to the
  monolithic sketch of the concatenated stream (the mergeability
  property the sketch-table pattern depends on), and refuses
  mismatched parameters loudly.
* CMS never underestimates (structural invariant — min over rows of
  additive cells).
* HLL sketch table + rollup: union across the finest grouping lands
  within the lgK error envelope of the exact distinct, at every
  grouping level including the global one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.sketches import (
    cms_merge,
    cms_parse,
    cms_query,
    cms_rollup_estimates,
    cms_serialize,
    cms_sketch_table,
    hll_rollup,
    hll_sketch_table,
)


def _cms_build(spark, rows, eps=0.001, conf=0.99, seed=42):
    df = spark.createDataFrame([(r,) for r in rows], "item long")
    return bytes(
        df.agg(
            F.count_min_sketch(
                "item", F.lit(float(eps)), F.lit(float(conf)), F.lit(seed)
            ).alias("c")
        ).first()["c"]
    )


MULTISET = [42] * 100 + [7] * 3 + [-5] * 17 + [2**62 + 11] * 9 + [0] * 2


def test_cms_reads_back_planted_exact_counts(spark):
    raw = _cms_build(spark, MULTISET)
    sk = cms_parse(raw)
    assert (sk["depth"], sk["width"]) == (7, 2000)
    assert sk["total"] == len(MULTISET)
    # wide sketch, 5 distinct items: collisions are (5/2000)^7-unlikely,
    # so a single wrong bucket in the hash fold would read 0, not these
    assert cms_query(raw, [42, 7, -5, 2**62 + 11, 0, 99999]) == [
        100,
        3,
        17,
        9,
        2,
        0,
    ]


def test_cms_serialize_roundtrip_bitexact(spark):
    raw = _cms_build(spark, MULTISET)
    assert cms_serialize(cms_parse(raw)) == raw


def test_cms_merge_equals_monolithic_bytes(spark):
    raw = _cms_build(spark, MULTISET)
    parts = [MULTISET[:40], MULTISET[40:90], MULTISET[90:]]
    payloads = [_cms_build(spark, p) for p in parts]
    merged = cms_merge(payloads)
    assert merged == raw  # cell-wise add IS Spark's mergeInPlace
    # associativity: fold order doesn't matter
    assert cms_merge([cms_merge(payloads[:2]), payloads[2]]) == raw


def test_cms_merge_refuses_mismatched_params(spark):
    a = _cms_build(spark, [1, 2, 3], seed=42)
    b = _cms_build(spark, [1, 2, 3], seed=43)  # different hashA
    with pytest.raises(ValueError, match="different"):
        cms_merge([a, b])
    c = _cms_build(spark, [1, 2, 3], eps=0.01)  # different width
    with pytest.raises(ValueError, match="different"):
        cms_merge([a, c])


def test_cms_never_underestimates(spark):
    # deterministic skewed multiset over 200 keys in a NARROW sketch
    # (width 20) so collisions are guaranteed: estimates may exceed but
    # must never undercut the exact counts
    rows = [k for k in range(200) for _ in range(1 + k % 7)]
    raw = _cms_build(spark, rows, eps=0.1)  # width 20
    from collections import Counter

    exact = Counter(rows)
    ests = cms_query(raw, list(range(200)))
    assert all(e >= exact[k] for k, e in zip(range(200), ests))


def test_cms_sketch_table_rollup_matches_local_query(spark):
    rows = [(d % 3, u % 11) for d in range(6) for u in range(d * 17 + 20)]
    df = spark.createDataFrame(rows, "day int, user_id long")
    table = cms_sketch_table(df, ["day"], "user_id", eps=0.01, seed=7)
    assert table.count() == 3
    items = list(range(11))
    got = {
        r["item"]: r["freq_est"]
        for r in cms_rollup_estimates(table, [], items, spark).collect()
    }
    # distributed merge+query == local merge+query of the same payloads
    payloads = [r["cms"] for r in table.collect()]
    local = cms_query(cms_merge(payloads), items)
    assert [got[i] for i in items] == local
    # and with a wide sketch the estimates are exactly the true counts
    from collections import Counter

    exact = Counter(u for _, u in rows)
    assert [got[i] for i in items] == [exact[i] for i in items]


def test_hll_sketch_table_rollup_within_error(spark):
    # 5k users spread over (type, day) cells; rollups at two levels
    df = spark.range(20_000).select(
        (F.col("id") % 4).cast("string").alias("typ"),
        (F.col("id") % 13).alias("day"),
        (F.col("id") % 5_000).alias("user_id"),
    )
    table = hll_sketch_table(df, ["typ", "day"], "user_id")
    assert table.count() == 52
    by_typ = {r["typ"]: r for r in hll_rollup(table, ["typ"]).collect()}
    exact = {
        r["typ"]: r["nd"]
        for r in df.groupBy("typ").agg(F.countDistinct("user_id").alias("nd")).collect()
    }
    for t, row in by_typ.items():
        assert abs(row["n_distinct_est"] - exact[t]) <= 0.05 * exact[t]
        assert row["n_rows"] == 5_000
    # global rollup (empty grouping): one row, all 5k users
    g = hll_rollup(table, []).collect()
    assert len(g) == 1
    assert abs(g[0]["n_distinct_est"] - 5_000) <= 0.05 * 5_000
    assert g[0]["n_rows"] == 20_000


def test_hll_rollup_shuffles_sketches_not_raw_rows(spark):
    """The scale claim: a rollup over the sketch TABLE plans one
    aggregate over table rows — the raw frame is not in the plan."""
    df = spark.range(1_000).select(
        (F.col("id") % 3).cast("string").alias("typ"),
        (F.col("id") % 5).alias("day"),
        F.col("id").alias("user_id"),
    )
    table = hll_sketch_table(df, ["typ", "day"], "user_id")
    path = None  # persisted table stands in for the 100 TB ingest output
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/sketches"
        table.write.parquet(path)
        persisted = spark.read.parquet(path)
        plan = (
            hll_rollup(persisted, ["typ"])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # the rollup reads the KB-scale sketch table (a parquet
        # relation) only — the raw row source is not in the plan
        assert "parquet" in plan and "range" not in plan.lower()


# --------------------------------------------------------------------------
# Value-histogram sketch tables (lossless mergeable order statistics)
# --------------------------------------------------------------------------


def _hist_oracle_quantile(values: list[int], p: float) -> int:
    """Lower discrete quantile: smallest value whose cumulative count
    reaches max(ceil(p*n), 1) — the module's documented convention."""
    import math

    xs = sorted(values)
    rank = max(math.ceil(p * len(xs)), 1)
    return xs[rank - 1]


def test_histogram_quantiles_match_sorted_list_oracle(spark):
    from ariadne_dbt_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram_table,
    )

    import random

    rng = random.Random(11)
    rows = [(("a" if i % 3 else "b"), rng.randrange(-50, 50)) for i in range(997)]
    df = spark.createDataFrame(rows, "g string, v long")
    table = value_histogram_table(df, ["g", "v"][:1], "v")
    probs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        (r["g"], r["p"]): (r["q"], r["n_rows"])
        for r in histogram_quantiles(table, ["g"], probs).collect()
    }
    for g in ("a", "b"):
        vals = [v for gg, v in rows if gg == g]
        for p in probs:
            assert got[(g, p)] == (_hist_oracle_quantile(vals, p), len(vals)), (g, p)


def test_histogram_rollup_is_lossless_merge(spark):
    """Quantiles read from a per-(g, day) table rolled up to g equal
    quantiles computed from a direct per-g histogram — merge loses
    nothing (the property KLL/t-digest can't give)."""
    from ariadne_dbt_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram_table,
    )

    import random

    rng = random.Random(7)
    rows = [
        ("g%d" % (i % 2), i % 5, rng.randrange(0, 30)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, day int, v long")
    fine = value_histogram_table(df, ["g", "day"], "v")
    direct = value_histogram_table(df, ["g"], "v")
    probs = [0.5, 0.95]
    a = sorted(
        map(tuple, histogram_quantiles(fine, ["g"], probs).collect())
    )
    b = sorted(
        map(tuple, histogram_quantiles(direct, ["g"], probs).collect())
    )
    assert a == b


def test_histogram_quantiles_global_group_and_edges(spark):
    from ariadne_dbt_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram_table,
    )

    df = spark.createDataFrame([(v,) for v in [5, 1, 9, 9, 3]], "v long")
    table = value_histogram_table(df, [], "v")
    got = {
        r["p"]: (r["q"], r["n_rows"])
        for r in histogram_quantiles(table, [], [0.0001, 0.5, 1.0]).collect()
    }
    # p→0 clamps to rank 1 (min); p=0.5 → ceil(2.5)=3rd of [1,3,5,9,9];
    # p=1 → max
    assert got[0.0001] == (1, 5)
    assert got[0.5] == (5, 5)
    assert got[1.0] == (9, 5)


def test_histogram_window_runs_over_distinct_values_not_rows(spark):
    """Plan shape: the rank-selection window's input is the MERGED
    histogram (one row per distinct value), so per-group window buffers
    are bounded by the value domain, never corpus rows."""
    from ariadne_dbt_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram_table,
    )

    df = spark.createDataFrame(
        [("g", i % 3) for i in range(1000)], "g string, v long"
    )
    table = value_histogram_table(df, ["g"], "v")
    out = histogram_quantiles(table, ["g"], [0.5])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the aggregate (histogram merge) must sit BELOW the window in the
    # plan: Window's child chain contains a HashAggregate
    win_at = plan.find("Window")
    assert win_at >= 0
    assert "HashAggregate" in plan[win_at:], plan
    assert out.count() == 1


# --------------------------------------------------------------------------
# KMV (bottom-k) sketch tables: set intersection / Jaccard estimation
# --------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """Groups with under k distinct values carry the exact hashed set:
    estimates are exact counts, pairwise overlap is exact too."""
    from ariadne_dbt_spark.operators.sketches import (
        kmv_estimate,
        kmv_pairwise_overlap,
        kmv_sketch_table,
    )

    rows = [("a", v) for v in range(100)] + [("b", v) for v in range(50, 130)]
    df = spark.createDataFrame(rows + rows, "g string, v long")  # dup rows too
    table = kmv_sketch_table(df, ["g"], "v", k=1024)
    est = {r["g"]: r for r in kmv_estimate(table, k=1024).collect()}
    assert est["a"]["n_distinct_est"] == 100.0 and est["a"]["n_rows"] == 200
    assert est["b"]["n_distinct_est"] == 80.0

    ov = kmv_pairwise_overlap(table, ["g"], k=1024).collect()
    assert len(ov) == 1
    r = ov[0]
    assert (r["a_g"], r["b_g"]) == ("a", "b")
    # exact: union 130, intersection 50
    assert r["union_est"] == 130.0
    assert abs(r["intersection_est"] - 50.0) < 1e-9
    assert abs(r["jaccard_est"] - 50.0 / 130.0) < 1e-9


def test_kmv_estimates_within_envelope_above_k(spark):
    from ariadne_dbt_spark.operators.sketches import (
        kmv_estimate,
        kmv_pairwise_overlap,
        kmv_sketch_table,
    )

    n, k = 30_000, 512
    rows = [("a", v) for v in range(n)] + [("b", v) for v in range(n // 2, n + n // 2)]
    df = spark.createDataFrame(rows, "g string, v long")
    table = kmv_sketch_table(df, ["g"], "v", k=k)
    est = {r["g"]: r["n_distinct_est"] for r in kmv_estimate(table, k=k).collect()}
    # RSE ~ 1/sqrt(512) ≈ 4.4%; 20% is a >4-sigma envelope
    assert abs(est["a"] - n) / n < 0.20
    r = kmv_pairwise_overlap(table, ["g"], k=k).collect()[0]
    true_union, true_inter = 1.5 * n, 0.5 * n
    assert abs(r["union_est"] - true_union) / true_union < 0.20
    assert abs(r["jaccard_est"] - 1 / 3) < 0.10
    assert abs(r["intersection_est"] - true_inter) / true_inter < 0.30


def test_kmv_rollup_is_bottom_k_of_union(spark):
    """Rolling fine sketches up equals sketching the unioned data —
    the mergeability contract."""
    from ariadne_dbt_spark.operators.sketches import kmv_rollup, kmv_sketch_table

    rows = [("g1", d, v) for d in range(4) for v in range(d * 700, d * 700 + 900)]
    rows += [("g2", d, v) for d in range(4) for v in range(d * 100, d * 100 + 300)]
    df = spark.createDataFrame(rows, "g string, day int, v long")
    k = 256
    fine = kmv_sketch_table(df, ["g", "day"], "v", k=k)
    rolled = {r["g"]: r for r in kmv_rollup(fine, ["g"], k=k).collect()}
    direct = {r["g"]: r for r in kmv_sketch_table(df, ["g"], "v", k=k).collect()}
    for g in ("g1", "g2"):
        assert rolled[g]["kmv"] == direct[g]["kmv"], g
        assert rolled[g]["n_rows"] == direct[g]["n_rows"], g


def test_kmv_global_group(spark):
    from ariadne_dbt_spark.operators.sketches import kmv_estimate, kmv_sketch_table

    df = spark.createDataFrame([(v % 37,) for v in range(500)], "v long")
    table = kmv_sketch_table(df, [], "v", k=64)
    row = kmv_estimate(table, k=64).collect()
    assert len(row) == 1
    assert row[0]["n_distinct_est"] == 37.0 and row[0]["n_rows"] == 500
