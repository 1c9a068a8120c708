"""PSI drift audit (operators/drift.py) + block packing invariants
(operators/sampling.py block_pack)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.drift import (
    bucketize,
    categorical_psi,
    numeric_psi,
    quantile_edges,
)
from ariadne_dbt_spark.operators.sampling import block_pack


def _total_psi(df):
    return sum(r["psi_term"] for r in df.collect())


def test_identical_snapshots_psi_zero(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", 10 * i) for i in range(60)],
        "id bigint, source string, x bigint",
    )
    assert abs(_total_psi(categorical_psi(df, df, "source"))) < 1e-9
    assert abs(_total_psi(numeric_psi(df, df, "x", bins=4))) < 1e-9


def test_categorical_psi_detects_shift_and_new_category(spark):
    a = spark.createDataFrame(
        [(i, "web" if i % 10 < 9 else "books") for i in range(200)],
        "id bigint, source string",
    )
    # B: books share collapses, a brand-new source appears
    b = spark.createDataFrame(
        [(i, "web" if i % 10 < 5 else "code") for i in range(200)],
        "id bigint, source string",
    )
    out = {r["bucket"]: r for r in categorical_psi(a, b, "source").collect()}
    assert set(out) == {"web", "books", "code"}
    assert out["code"]["n_a"] == 0 and out["code"]["n_b"] == 100
    total = _total_psi(categorical_psi(a, b, "source"))
    assert total > 0.25  # action-level drift
    # every term finite (Laplace smoothing)
    assert all(math.isfinite(r["psi_term"]) for r in out.values())


def test_numeric_psi_mean_shift(spark):
    a = spark.createDataFrame([(i, i % 100) for i in range(500)], "id bigint, x bigint")
    shifted = spark.createDataFrame(
        [(i, (i % 100) + 50) for i in range(500)], "id bigint, x bigint"
    )
    assert _total_psi(numeric_psi(a, shifted, "x", bins=10)) > 0.25


def test_bucketize_edges_inclusive_left(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 11)], "x bigint")
    edges = quantile_edges(df, "x", bins=2)  # median = 5.5
    got = df.select("x", bucketize(F.col("x"), edges).alias("b")).collect()
    for r in got:
        assert r["b"] == ("b01" if r["x"] <= 5.5 else "b02")


# -- block packing ------------------------------------------------------------


def test_block_pack_preserves_every_token_once(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(7))) for i in range(40)],
        "doc_id bigint, text string",
    )
    out = block_pack(docs, "doc_id", "text", block_size=16).collect()
    toks = []
    for r in out:
        ts = r["block_text"].split(" ")
        assert len(ts) == r["n_tokens"]
        toks.extend(ts)
    # every doc token exactly once + one <eos> per doc
    assert sorted(t for t in toks if t != "<eos>") == sorted(
        f"w{i}t{j}" for i in range(40) for j in range(7)
    )
    assert sum(1 for t in toks if t == "<eos>") == 40
    # all blocks full except possibly one tail per shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["block_id"])
        assert [r["block_id"] for r in rows] == list(range(len(rows)))
        assert all(r["n_tokens"] == 16 for r in rows[:-1])
        assert 1 <= rows[-1]["n_tokens"] <= 16


def test_block_pack_concatenation_order_matches_shuffle(spark):
    """Within a shard, block streams concatenate docs in the
    deterministic-shuffle order: doc boundaries (eos) respected."""
    from ariadne_dbt_spark.operators.sampling import deterministic_shuffle

    docs = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i}") for i in range(20)], "doc_id bigint, text string"
    )
    order = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in deterministic_shuffle(docs.select("doc_id"), "doc_id").collect()
    }
    blocks = block_pack(docs, "doc_id", "text", block_size=1000).collect()
    for r in blocks:
        shard = r["shard"]
        expected = []
        for pos in sorted(p for (s, p) in order if s == shard):
            d = order[(shard, pos)]
            expected += [f"a{d}", f"b{d}", f"c{d}", "<eos>"]
        assert r["block_text"].split(" ") == expected


def test_quantile_edges_distributed_path_matches_single(spark, monkeypatch):
    """The round-11 two-level distributed cumulative (range partitions +
    prefix offsets) must reproduce the single-window path bit-for-bit —
    the path choice is a size heuristic, never a semantics change."""
    import random

    rnd = random.Random(7)
    rows = [(i, rnd.randint(0, 999)) for i in range(5000)]
    # duplicates + skew so cut ranks straddle partition boundaries
    rows += [(100000 + i, 42) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, x bigint")
    single = quantile_edges(df, "x", bins=10)
    # force the distributed path: 1-byte partitions => npart = cores
    monkeypatch.setenv("SPARK_GRAFT_QE_PART_BYTES", "1")
    dist = quantile_edges(df, "x", bins=10)
    assert dist == single  # exact equality, not approx
    monkeypatch.setenv("SPARK_GRAFT_QE_PART_BYTES", str(1 << 60))
    forced_single = quantile_edges(df, "x", bins=10)
    assert forced_single == single
