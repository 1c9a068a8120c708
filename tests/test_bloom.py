"""Bloom-filter membership pruning (operators/bloom.py).

Contracts under test — the ones the BFF-style decontamination path
leans on at 100 TB:

* NO false negatives, ever (structural: every inserted item's bits are
  set; a probe ANDs those same bits).
* False-positive rate on non-members lands near the configured fpp
  (statistical envelope, wide enough to never flake).
* Per-shard builds merged with bitwise OR equal the monolithic build
  (mergeability — the sketch-table associativity contract).
* Deterministic: same data + params → byte-identical bitmap, build
  twice or build distributed.
* ``bloom_decontaminate`` produces EXACTLY ``decontamination_flags``'
  output on the same corpus (the Bloom filter changes join strategy,
  never semantics — false positives die in the verify join).
* The probe is map-only: no Exchange in a probe-over-scan plan.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_decontaminate,
    bloom_maybe_contains,
    optimal_params,
)


def _words(rng, n, prefix):
    return [f"{prefix}{rng.randrange(10**9)}_{i}" for i in range(n)]


def test_no_false_negatives(spark):
    rng = random.Random(3)
    members = _words(rng, 500, "m")
    df = spark.createDataFrame([(w,) for w in members], "w string")
    bloom = bloom_build(df, "w", n_items=500, fpp=0.01)
    out = bloom_maybe_contains(df, "w", bloom).where(~F.col("bloom_maybe"))
    assert out.count() == 0


def test_fpp_within_envelope(spark):
    rng = random.Random(5)
    members = _words(rng, 2000, "m")
    others = _words(rng, 4000, "x")
    mdf = spark.createDataFrame([(w,) for w in members], "w string")
    odf = spark.createDataFrame([(w,) for w in others], "w string")
    bloom = bloom_build(mdf, "w", n_items=2000, fpp=0.01)
    fp = bloom_maybe_contains(odf, "w", bloom).where(F.col("bloom_maybe")).count()
    # expected 40 at fpp=0.01 over 4000 probes; 4x is a >6-sigma bound
    assert fp <= 160, fp
    # occupancy-based diagnostics line up with reality
    assert 1000 < bloom.n_items_estimate < 4000
    assert bloom.fpp_estimate < 0.05


def test_merge_equals_monolithic_and_param_mismatch_raises(spark):
    rng = random.Random(7)
    words = _words(rng, 600, "m")
    a = spark.createDataFrame([(w,) for w in words[:300]], "w string")
    b = spark.createDataFrame([(w,) for w in words[300:]], "w string")
    both = spark.createDataFrame([(w,) for w in words], "w string")
    m, k = optimal_params(600, 0.01)
    fa = bloom_build(a, "w", m_bits=m, k=k)
    fb = bloom_build(b, "w", m_bits=m, k=k)
    mono = bloom_build(both, "w", m_bits=m, k=k)
    assert fa.merge(fb).bits == mono.bits
    with pytest.raises(ValueError, match="different"):
        fa.merge(BloomFilter(m + 8, k, fa.seed, b"\x00" * ((m + 8 + 7) // 8)))


def test_build_is_deterministic_across_partitionings(spark):
    rng = random.Random(9)
    words = _words(rng, 400, "m")
    df1 = spark.createDataFrame([(w,) for w in words], "w string").repartition(1)
    df8 = spark.createDataFrame([(w,) for w in words], "w string").repartition(8)
    f1 = bloom_build(df1, "w", n_items=400, fpp=0.01)
    f8 = bloom_build(df8, "w", n_items=400, fpp=0.01)
    assert f1.bits == f8.bits and f1.k == f8.k and f1.m_bits == f8.m_bits


def test_empty_build_probes_false(spark):
    empty = spark.createDataFrame([], "w string")
    bloom = bloom_build(empty, "w", n_items=1, fpp=0.01)
    df = spark.createDataFrame([("x",)], "w string")
    rows = bloom_maybe_contains(df, "w", bloom).collect()
    assert [r["bloom_maybe"] for r in rows] == [False]
    assert bloom.saturation == 0.0 and bloom.n_items_estimate == 0.0


def test_param_validation():
    with pytest.raises(ValueError, match="fpp"):
        optimal_params(100, 1.5)
    m, k = optimal_params(1, 0.5)
    assert m >= 64 and 1 <= k <= 32


def test_probe_is_map_only(spark):
    df = spark.createDataFrame([(f"w{i}",) for i in range(64)], "w string")
    bloom = bloom_build(df, "w", n_items=64, fpp=0.01)
    plan = (
        bloom_maybe_contains(df, "w", bloom)
        .where(F.col("bloom_maybe"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_bloom_decontaminate_matches_join_based_flags(spark):
    """Same corpus, both operators, identical output — the equivalence
    that makes Bloom false positives harmless."""
    from ariadne_dbt_spark.operators.dedup import decontamination_flags

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(200)]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40)))

    rows = [(i, doc()) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)

    want = sorted(
        map(
            tuple,
            decontamination_flags(
                train, bench, "doc_id", "text", n=3, min_hits=2
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            bloom_decontaminate(
                train, bench, "doc_id", "text", n=3, min_hits=2, fpp=0.001
            ).collect(),
        )
    )
    assert got == want
    # and with a DELIBERATELY saturated filter (tiny m → fpp ~1) the
    # verify join must still yield the exact same flags
    got_sat = sorted(
        map(
            tuple,
            bloom_decontaminate(
                train, bench, "doc_id", "text", n=3, min_hits=2, fpp=0.9
            ).collect(),
        )
    )
    assert got_sat == want


def test_save_load_roundtrip_and_torn_write_refusal(spark, tmp_path):
    from ariadne_dbt_spark.operators.bloom import load_bloom, save_bloom

    df = spark.createDataFrame([(f"w{i}",) for i in range(100)], "w string")
    bloom = bloom_build(df, "w", n_items=100, fpp=0.01)
    path = str(tmp_path / "idx" / "bloom")
    save_bloom(bloom, path)
    back = load_bloom(path)
    assert back == bloom
    # torn write: bin replaced for a resize, json never updated
    with open(path + ".bin", "wb") as f:
        f.write(b"\x00" * 3)
    with pytest.raises(ValueError, match="torn write"):
        load_bloom(path)


def test_persisted_decontamination_index_matches_one_shot(spark, tmp_path):
    """build-once / query-per-batch must equal the one-shot operator
    (and therefore the join-based flags) value-for-value; a second
    batch reuses the artifact without rebuilding it."""
    import os

    from ariadne_dbt_spark.operators.bloom import (
        build_decontamination_index,
        decontaminate_against_index,
    )
    from ariadne_dbt_spark.operators.dedup import decontamination_flags

    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(200)]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40)))

    rows = [(i, doc()) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)

    idx = str(tmp_path / "decon_idx")
    meta = build_decontamination_index(
        bench, idx, "doc_id", "text", n=3, fpp=0.001
    )
    assert meta["n_grams"] > 0

    want = sorted(
        map(
            tuple,
            decontamination_flags(
                train, bench, "doc_id", "text", n=3, min_hits=2
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            decontaminate_against_index(
                train, idx, "doc_id", "text", min_hits=2
            ).collect(),
        )
    )
    assert got == want

    # second batch: artifact reused as-is (no bench re-shingle — the
    # stored mtimes must not change across queries)
    stamp = os.path.getmtime(os.path.join(idx, "meta.json"))
    batch2 = spark.createDataFrame(
        [(1000 + i, doc()) for i in range(50)], "doc_id long, text string"
    )
    want2 = sorted(
        map(
            tuple,
            decontamination_flags(
                batch2, bench, "doc_id", "text", n=3, min_hits=1
            ).collect(),
        )
    )
    got2 = sorted(
        map(
            tuple,
            decontaminate_against_index(
                batch2, idx, "doc_id", "text", min_hits=1
            ).collect(),
        )
    )
    assert got2 == want2
    assert os.path.getmtime(os.path.join(idx, "meta.json")) == stamp

    # aborted build (no meta commit) is refused, not half-read
    half = str(tmp_path / "aborted_idx")
    build_decontamination_index(bench, half, "doc_id", "text", n=3)
    os.remove(os.path.join(half, "meta.json"))
    with pytest.raises(FileNotFoundError):
        decontaminate_against_index(train, half, "doc_id", "text").collect()
