"""Deterministic sampling operators: reproducibility, stability, quotas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.sampling import (
    hash_sample,
    split,
    stratified_quota_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_hash_sample_deterministic(corpus):
    a = {r.doc_id for r in hash_sample(corpus, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in hash_sample(corpus, "doc_id", 0.3).collect()}
    assert a == b
    assert abs(len(a) / 2_000 - 0.3) < 0.05


def test_hash_sample_growth_stable(corpus):
    full = {r.doc_id for r in hash_sample(corpus, "doc_id", 0.3).collect()}
    sub = {
        r.doc_id
        for r in hash_sample(corpus.where(F.col("doc_id") < 500), "doc_id", 0.3).collect()
    }
    assert sub == {d for d in full if d < 500}  # fate is a pure function of the key


def test_hash_sample_fraction_monotone(corpus):
    s10 = {r.doc_id for r in hash_sample(corpus, "doc_id", 0.1).collect()}
    s40 = {r.doc_id for r in hash_sample(corpus, "doc_id", 0.4).collect()}
    assert s10 <= s40  # smaller fraction is a prefix of the bigger one


def test_stratified_quota_exact(corpus):
    samp = stratified_quota_sample(
        corpus, "lang", {"0": 50, "1": 10, "2": 700, "3": 0}, key="doc_id"
    )
    counts = {r.lang: r.n for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 500 rows per stratum: quota binds at 50/10, stratum size at 700, 0 drops out
    assert counts == {"0": 50, "1": 10, "2": 500}


def test_stratified_deterministic(corpus):
    q = {"0": 25, "1": 25, "2": 25, "3": 25}
    a = sorted(r.doc_id for r in stratified_quota_sample(corpus, "lang", q, key="doc_id").collect())
    b = sorted(r.doc_id for r in stratified_quota_sample(corpus, "lang", q, key="doc_id").collect())
    assert a == b


def test_split_partitions_totally(corpus):
    labeled = split(corpus, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = labeled.groupBy("split").agg(F.count("*").alias("n")).collect()
    counts = {r.split: r.n for r in rows}
    assert None not in counts and sum(counts.values()) == 2_000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # membership is stable: re-labeling agrees row for row
    again = split(corpus, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert labeled.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")
    ).count() == 0


def test_split_rejects_overfull():
    with pytest.raises(ValueError):
        split(None, "doc_id", {"a": 0.9, "b": 0.2})


def test_pack_sequences_greedy_invariants(spark):
    from ariadne_dbt_spark.operators.sampling import pack_sequences
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         [(0, 100), (8, 100), (16, 80), (24, 300), (32, 50), (1, 10)]],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, "doc_id", "text", max_tokens=256, n_buckets=8)
    rows = sorted(out.collect(), key=lambda r: r.id)
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    # no pack exceeds max unless it is a single oversized doc
    for members in by_pack.values():
        total = sum(m.n_tokens for m in members)
        assert total <= 256 or len(members) == 1
    # bucket 0 greedy walk: 100+100 fits, +80 overflows, 300 alone, 50 after
    b0 = {r.id: r.pack_id for r in rows if r.bucket == 0}
    assert b0[0] == b0[8] and b0[16] != b0[0]
    assert b0[24] != b0[16] and b0[32] != b0[24]  # 80+300 > 256 -> separate
    # bucket isolation: doc 1 lives in bucket 1's (bucket << 44) pack-id space
    assert next(r.pack_id for r in rows if r.id == 1) >= (1 << 44)


def test_temperature_mixing_limits(spark):
    """tau=1 reproduces the natural mix; tau=0 is uniform; weights sum
    to ~1 and quotas to ~budget."""
    from ariadne_dbt_spark.operators.sampling import temperature_mixing

    rows = [(i, "web" if i < 90 else ("books" if i < 99 else "code")) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    nat = {r.source: r for r in temperature_mixing(df, "source", tau=1.0, budget=1000).collect()}
    assert nat["web"].weight == 0.9 and nat["web"].target_docs == 900
    assert nat["books"].weight == 0.09 and nat["code"].weight == 0.01

    uni = {r.source: r for r in temperature_mixing(df, "source", tau=0.0, budget=900).collect()}
    assert all(abs(r.weight - 1 / 3) < 1e-5 for r in uni.values())
    assert sum(r.target_docs for r in uni.values()) == 900

    # tau=0.5 sits between: small sources up-weighted vs natural
    mid = {r.source: r for r in temperature_mixing(df, "source", tau=0.5).collect()}
    assert nat["code"].weight < mid["code"].weight < uni["code"].weight
    assert abs(sum(r.weight for r in mid.values()) - 1.0) < 1e-5


def test_deterministic_shuffle_sharded_not_global(spark):
    """The shuffle's window must hash-partition by shard — never a
    single-partition global sort — and the permutation is reproducible."""
    from ariadne_dbt_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, "doc_id", seed=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan
    a = [(r.shard, r.pos, r.doc_id) for r in out.orderBy("shard", "pos").collect()]
    b = [(r.shard, r.pos, r.doc_id) for r in deterministic_shuffle(df, "doc_id", seed=3).orderBy("shard", "pos").collect()]
    assert a == b
    # positions are dense 1..n per shard and ids form a permutation
    assert sorted({x[2] for x in a}) == list(range(2000))
    from collections import Counter
    per = Counter(x[0] for x in a)
    for sh, n in per.items():
        assert sorted(x[1] for x in a if x[0] == sh) == list(range(1, n + 1))


def test_jsonl_export_order_and_file_bounds(spark, tmp_path):
    """Each shard file holds its slice of the permutation IN ORDER, file
    sizes respect maxRecordsPerFile, gzip works, nothing lost."""
    import glob
    import gzip
    import json as _json

    from ariadne_dbt_spark.operators.export import export_jsonl_shards

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("body "), F.col("doc_id").cast("string"))
    )
    out = str(tmp_path / "shards")
    export_jsonl_shards(
        df, "doc_id", out, seed=9, max_records_per_file=20, compression="gzip"
    )
    files = sorted(glob.glob(f"{out}/shard=*/*.json.gz"))
    assert files, "no shard files written"
    seen = []
    for fp in files:
        with gzip.open(fp, "rt") as f:
            rows = [_json.loads(line) for line in f]
        assert 0 < len(rows) <= 20
        pos = [r["pos"] for r in rows]
        assert pos == sorted(pos), f"unordered rows in {fp}"
        seen.extend(r["doc_id"] for r in rows)
    assert sorted(seen) == list(range(500))


# --- Efraimidis-Spirakis weighted sampling --------------------------------


def test_weighted_sample_favors_heavy_rows(spark):
    """A row with 200x the weight of 20 peers wins the k=1 draw in the
    overwhelming majority of independent (salted) draws: P(win) =
    200/220 per draw, so >=15/20 wins has p-value ~1e-4 under a fair
    implementation and ~0 under a broken one."""
    from ariadne_dbt_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0) for i in range(20)] + [(99, 200.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    wins = 0
    for s in range(20):
        top = weighted_sample(df, weight_col="w", id_col="id", k=1, salt=f"s{s}").first()
        wins += top["id"] == 99
    assert wins >= 15, f"heavy row won only {wins}/20 draws"


def test_weighted_sample_zero_weight_never_selected(spark):
    from ariadne_dbt_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 0.0), (2, 1.0), (3, 1.0)], "id long, w double")
    got = {r["id"] for r in weighted_sample(df, weight_col="w", id_col="id", k=2).collect()}
    assert got == {2, 3}


def test_weighted_sample_is_takeordered(spark):
    """Top-k must compile to TakeOrderedAndProject (per-partition heaps),
    not a global Sort + Limit."""
    from ariadne_dbt_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w"))
    out = weighted_sample(df, weight_col="w", id_col="id", k=10)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "TakeOrderedAndProject" in plan


def test_leakproof_split_keeps_clusters_whole_where_naive_leaks(spark):
    """Near-dup clusters must land WHOLE in one split; the per-doc hash
    split demonstrably scatters them on the same fixture (so the
    operator is doing real work, not vacuously passing)."""
    from ariadne_dbt_spark.operators.sampling import leakproof_split, split

    # 40 clusters x 5 members with far-apart ids (hash-independent)
    rows = [(k * 17 + i * 1_000_000,) for k in range(40) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id"])
    clusters = spark.createDataFrame(
        [(k * 17 + i * 1_000_000, k * 17) for k in range(40) for i in range(5)],
        ["id", "cluster_id"],
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakproof_split(df, "doc_id", clusters, fr)
    got = out.join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id"
    ).groupBy("cluster_id").agg(
        F.countDistinct("split").alias("ns"), F.count(F.lit(1)).alias("n")
    ).collect()
    assert len(got) == 40
    assert all(r["ns"] == 1 and r["n"] == 5 for r in got)
    # determinism + totality: rerun matches, no NULL labels
    again = leakproof_split(df, "doc_id", clusters, fr)
    assert out.exceptAll(again).count() == 0
    assert out.where(F.col("split").isNull()).count() == 0
    # naive per-doc split scatters at least one cluster on this fixture
    naive = split(df, "doc_id", fr)
    leaks = naive.join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id"
    ).groupBy("cluster_id").agg(F.countDistinct("split").alias("ns"))
    assert leaks.where(F.col("ns") > 1).count() > 0


def test_leakproof_split_unclustered_docs_follow_plain_split(spark):
    from ariadne_dbt_spark.operators.sampling import leakproof_split, split

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    empty = spark.createDataFrame([], "id long, cluster_id long")
    fr = {"train": 0.5, "test": 0.5}
    a = leakproof_split(df, "doc_id", empty, fr).orderBy("doc_id").collect()
    b = split(df, "doc_id", fr).orderBy("doc_id").collect()
    assert [r["split"] for r in a] == [r["split"] for r in b]
