"""salted_join: result parity with the plain join + salted plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.skew import hot_keys, salted_join


def _skewed_pair(spark):
    # 90% of big rows share one hot key
    big = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id").cast("string")).alias("dim")
    )
    return big, small


def test_salted_inner_join_parity(spark):
    big, small = _skewed_pair(spark)
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", salts=8).select("k", "payload", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_parity(spark):
    big, small = _skewed_pair(spark)
    # drop the hot key from the dim so left-join null preservation is exercised
    small2 = small.where(F.col("k") != 7)
    plain = big.join(small2, "k", "left").select("k", "payload", "dim")
    salted = salted_join(big, small2, "k", salts=8, how="left").select("k", "payload", "dim")
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_salt_is_in_the_join_keys(spark):
    big, small = _skewed_pair(spark)
    plan = (
        salted_join(big, small, "k", salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan  # the shuffle/join really runs on (k, _salt)


def test_hot_keys_detects_the_hot_key(spark):
    big, _ = _skewed_pair(spark)
    hot = {r["k"] for r in hot_keys(big, "k", threshold_rows=1000).collect()}
    assert hot == {7}


# -- skew pins for the banded / prefix-filtered dedup joins ------------------


def test_ngram_hot_shingle_never_enters_candidates(spark):
    """Structural skew defense of the exact-Jaccard path: a shingle
    planted into 10% of the corpus must NOT enter any doc's PPJoin
    prefix (rarest-first ordering pushes ubiquitous vocabulary out), so
    the candidate join mass is untouched by vocabulary heat — and docs
    sharing ONLY the hot phrase never become a pair."""
    import random

    from ariadne_dbt_spark.operators.dedup import (
        _prefix_postings,
        ngram_jaccard_pairs,
        shingle_sets,
    )

    rnd = random.Random(11)
    vocab = [f"tok{i}" for i in range(3000)]
    rows = []
    for i in range(500):
        words = [vocab[rnd.randrange(len(vocab))] for _ in range(40)]
        if i % 10 == 0:  # 10% of docs carry the same hot phrase
            words[17:17] = ["hot", "shared", "phrase"]
        rows.append((i, " ".join(words)))
    rows.append((9000, rows[3][1]))                      # exact clone of doc 3
    rows.append((9001, rows[7][1].replace("tok", "tok", 1)))  # identical to 7
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, strategy="prefix"
    ).collect()}
    # exactly the planted clones; no hot-phrase-only pair survives
    # (sharing just the phrase gives Jaccard ~5/77, far below 0.8)
    assert pairs == {(3, 9000), (7, 9001)}

    sh = shingle_sets(docs, "doc_id", "text", 3)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prefix = _prefix_postings(sh, 0.8, dfreq)
    hot = prefix.where(F.col("shingle") == "hot shared phrase").count()
    assert hot == 0  # the df=52 shingle is in NO prefix


def test_banded_lsh_hot_bucket_aqe_skew_split(spark):
    """Planted hot bucket for the embedding-LSH candidate join: 10% of
    vectors share one direction, so they collide in EVERY band's bucket.
    The job must (a) complete with the candidate mass bounded by the
    within-bucket pairs (all planted pairs found, nothing spurious) and
    (b) actually trigger AQE's skew-join split on the bucket join — the
    runtime backstop SCALE.md claims — verified on the executed plan."""
    import random

    from ariadne_dbt_spark.operators.similarity import pairwise_near_duplicates

    rnd = random.Random(23)
    hot_dir = [1.0, 2.0, -1.0, 0.5, 1.5, -2.0, 0.25, 1.0]
    rows = []
    for i in range(3000):
        if i % 10 == 0:  # 10%: same direction, varying magnitude
            s = 1.0 + (i % 7)
            rows.append((i, [x * s for x in hot_dir]))
        else:
            rows.append((i, [rnd.gauss(0, 1) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize"),
    }
    try:
        # scale AQE's skew thresholds down to fixture size (defaults are
        # 256 MB — correct at cluster scale, unreachable in a test)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "512b")

        out = pairwise_near_duplicates(
            emb, threshold=0.999, bands=2, planes_per_band=4, dim=8
        )
        got = {(r.id_a, r.id_b) for r in out.collect()}
        hot_ids = [i for i in range(3000) if i % 10 == 0]
        want = {(a, b) for i, a in enumerate(hot_ids) for b in hot_ids[i + 1:]}
        # bounded + exact: every within-bucket planted pair, nothing else
        assert got == want and len(got) == 300 * 299 // 2

        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in plan, plan  # AQE skew-split really fired
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_semdedup_hot_cluster_aqe_skew_split(spark):
    """Planted hot CLUSTER for SemDeDup: 20% of vectors share one
    direction (scaled copies -> cosine-argmax sends them to the same
    cluster bit-identically), so one cluster holds 600 of 3000 vectors.
    The within-cluster join must (a) produce exactly the right keep
    set — every hot vector except the lowest id drops, nothing else —
    and (b) trigger AQE's skew-join split, the runtime backstop
    SCALE.md claims for hot clusters."""
    import random

    from ariadne_dbt_spark.operators.similarity import semantic_dedup

    rnd = random.Random(31)
    hot_dir = [1.0, 0.5, -1.0, 2.0, 0.25, -0.5, 1.5, 1.0]
    rows = []
    for i in range(3000):
        if i % 5 == 0:
            s = 1.0 + (i % 9)
            rows.append((i, [x * s for x in hot_dir]))
        else:
            rows.append((i, [rnd.gauss(0, 1) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0 if j == i else 0.0 for j in range(8)] for i in range(4)]

    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize"),
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "512b")

        out = semantic_dedup(emb, eps=0.9999, centroids=cents)
        flags = {r.vec_id: r.keep for r in out.collect()}
        hot_ids = {i for i in range(3000) if i % 5 == 0}
        dropped = {i for i, k in flags.items() if not k}
        assert dropped == hot_ids - {0}, (
            f"extra={sorted(dropped - hot_ids)[:5]} missing={sorted(hot_ids - {0} - dropped)[:5]}"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in plan, "AQE skew split did not fire"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_jaccard_distinct_fallback_mega_clone_cluster(spark):
    """The distinct()-fallback verification join under a planted
    MEGA-clone cluster (the exact shape that forces the fallback): a
    120-member identical-text cluster plus unique docs. The hot ids
    route through the salted join; results must equal the exact
    all-pairs answer — C(120,2) jaccard-1.0 pairs, nothing else."""
    from ariadne_dbt_spark.operators.dedup import (
        _jaccard_pairs_prefix,
        shingle_sets,
    )

    m = 120
    clone_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, clone_text) for i in range(m)] + [
        (1000 + i, f"unique{i} text{i} body{i} words{i} tail{i}")
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = shingle_sets(docs, "doc_id", "text", 3)
    out = _jaccard_pairs_prefix(sh, 0.8, dedup_via_set=None)  # safe fallback path
    got = {(r.id_a, r.id_b) for r in out.collect()}
    want = {(a, b) for a in range(m) for b in range(a + 1, m)}
    assert got == want
    assert all(
        r.jaccard == 1.0 for r in out.collect()
    )
    # the split is physically in the plan: salted branch's join carries
    # the _salt key next to id_a
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
