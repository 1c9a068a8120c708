"""Sampling workloads (training-pipeline extensions) over `documents`.

xxhash64 is engine-private, so the oracles check the EXACT provable
contracts instead of row identity: per-stratum quota counts equal
``least(quota, stratum_size)`` (SQL-computable without knowing which
rows were chosen), hash-sampling is growth-stable (a row's fate never
changes when the corpus shrinks/grows), and hash-range splits partition
the corpus totally. Row-level determinism is pinned in
tests/test_sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.sampling import (
    hash_sample,
    split,
    stratified_quota_sample,
)
from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


@query(
    "stratified_sample_counts",
    oracle="""
    SELECT lang, CAST(LEAST(30, COUNT(*)) AS BIGINT) AS n_sampled
    FROM documents GROUP BY lang ORDER BY lang
    """,
    survey="sampling-stratified",
    doc="Exact per-language quotas (30) drawn in deterministic hash order "
    "(window row_number over xxhash64(doc_id)); the sampled count per "
    "stratum is provably least(quota, stratum_size), which the oracle "
    "recomputes from the raw table.",
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents(spark, sf_dir)
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    samp = stratified_quota_sample(docs, "lang", {la: 30 for la in langs}, key="doc_id")
    return (
        samp.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled")).orderBy("lang")
    )


@query(
    "hash_sample_stability",
    oracle="SELECT 0 AS n_violations, TRUE AS fraction_within_5pct",
    survey="sampling-hash",
    doc="Hash-keyed sampling invariants, oracle-checked: sampling the "
    "even-id half of the corpus must select a SUBSET of what sampling "
    "the full corpus selects (a row's fate is a pure function of its "
    "key — retry/growth stability), and the realized fraction lands "
    "within 5 points of the requested 25%.",
)
def hash_sample_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents(spark, sf_dir).select("doc_id")
    s_full = hash_sample(docs, "doc_id", 0.25)
    s_half = hash_sample(docs.where(F.col("doc_id") % 2 == 0), "doc_id", 0.25)
    violations = s_half.join(s_full, "doc_id", "left_anti").count()
    frac = s_full.count() / docs.count()
    return spark.createDataFrame(
        [(violations, abs(frac - 0.25) < 0.05)],
        "n_violations int, fraction_within_5pct boolean",
    )


@query(
    "split_partition_check",
    oracle="""
    SELECT COUNT(*) AS n_total, COUNT(*) AS n_labeled, 0 AS n_unlabeled
    FROM documents
    """,
    survey="sampling-split",
    doc="80/10/10 train/val/test by hash range: the three buckets tile "
    "[0, 1e6) exactly, so every row gets exactly one stable label — the "
    "oracle checks total coverage from the raw table.",
)
def split_partition_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents(spark, sf_dir).select("doc_id")
    labeled = split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return labeled.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("split").alias("n_labeled"),
        (F.count(F.lit(1)) - F.count("split")).cast("int").alias("n_unlabeled"),
    )


# Greedy sequence packing — the recurrence is sequential per bucket, so
# the oracle walks it with a recursive CTE (one chain per bucket).
@query(
    "sequence_packing",
    oracle="""
    WITH RECURSIVE sized AS (
        SELECT doc_id AS id, CAST(doc_id % 8 AS INT) AS bucket,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n
        FROM documents),
    ordered AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY id) AS rn
        FROM sized),
    rec AS (
        SELECT bucket, rn, id, n, 0 AS pack, n AS fill
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.id, o.n,
               CASE WHEN r.fill > 0 AND r.fill + o.n > 256
                    THEN r.pack + 1 ELSE r.pack END,
               CASE WHEN r.fill > 0 AND r.fill + o.n > 256
                    THEN o.n ELSE r.fill + o.n END
        FROM rec r JOIN ordered o ON o.bucket = r.bucket AND o.rn = r.rn + 1)
    SELECT id AS doc_id, bucket,
           CAST(bucket * 17592186044416 + pack AS BIGINT) AS pack_id, -- (bucket << 44) | pack
           n AS n_tokens
    FROM rec
    """,
    survey="sequence-packing",
    doc="Greedy first-fit packing of documents into <=256-token training "
    "sequences, bucket-parallel (applyInPandas recurrence vs recursive-"
    "CTE oracle).",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return pack_sequences(docs, "doc_id", "text", max_tokens=256, n_buckets=8).select(
        F.col("id").alias("doc_id"), "bucket", "pack_id", "n_tokens"
    )


@query(
    "temperature_mixing_weights",
    oracle="""
    WITH counts AS (SELECT lang AS source, COUNT(*) AS n_docs
                    FROM documents GROUP BY 1),
    powered AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS p FROM counts),
    tot AS (SELECT SUM(p) AS t FROM powered)
    SELECT source, n_docs,
           ROUND(p / t, 6) AS weight,
           CAST(ROUND(p / t * 100000) AS BIGINT) AS target_docs
    FROM powered CROSS JOIN tot
    ORDER BY source
    """,
    survey="sampling-mixing",
    doc="Temperature-scaled source mixing (tau=0.5 -> sqrt, IEEE-exact "
    "across engines): per-language weights n^tau / sum(n^tau) and the "
    "per-source doc quota for a 100k-doc epoch. tau<1 up-weights small "
    "sources vs the natural mix — the standard multi-source balancing "
    "recipe; quotas feed stratified_quota_sample directly.",
)
def temperature_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import temperature_mixing

    docs = documents(spark, sf_dir)
    return temperature_mixing(docs, "lang", tau=0.5, budget=100_000)


@query(
    "per_source_cap_sample",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 <> 0 THEN 'megacrawl' ELSE source END AS source
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM tagged
    )
    SELECT doc_id, source FROM ranked WHERE rn <= 10
    ORDER BY source, doc_id
    """,
    survey="sampling-domain-cap",
    doc="Per-domain document cap (C4/RefinedWeb recipe): a derived "
    "corpus where 80% of docs collapse into one 'megacrawl' source; "
    "keep at most 10 docs per source by deterministic md5 priority — "
    "the dominant domain is cut to the cap, small sources pass whole, "
    "and the exact kept set is hash-checked (md5, not xxhash, so the "
    "oracle replays the selection byte-for-byte).",
)
def per_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import per_source_cap

    docs = documents(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 != 0, F.lit("megacrawl"))
        .otherwise(F.col("source"))
        .alias("source"),
    )
    return per_source_cap(docs, "source", "doc_id", cap=10).orderBy(
        "source", "doc_id"
    )


@query(
    "deterministic_shuffle_order",
    oracle="""
    SELECT doc_id,
           substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           ROW_NUMBER() OVER (
               PARTITION BY substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 1)
               ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS pos
    FROM documents
    ORDER BY shard, pos
    """,
    survey="sampling-shuffle-order",
    doc="Reproducible global training-order shuffle: md5-keyed order, "
    "sharded per-first-hex-char windows (never one global sort), "
    "positions exact vs the oracle. Reading shards in name order / "
    "rows in pos order yields a deterministic uniform permutation.",
)
def deterministic_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import deterministic_shuffle

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select("doc_id")
    return deterministic_shuffle(docs, "doc_id", seed=7).select(
        "doc_id", "shard", "pos"
    ).orderBy("shard", "pos")


@query(
    "jsonl_export_roundtrip",
    oracle="""
    SELECT substring(md5('5:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           COUNT(*) AS n_docs,
           SUM(length(text)) AS total_chars
    FROM documents
    GROUP BY 1 ORDER BY shard
    """,
    survey="sink-jsonl-shards",
    doc="Sharded-JSONL corpus export roundtrip (the training-stack "
    "interchange sink): documents are written as shard=<hex>/*.json via "
    "the deterministic md5 shuffle, read back as JSON, and per-shard "
    "doc counts + character mass must equal the oracle's direct "
    "derivation from the source table — proving the sink is complete, "
    "non-duplicating, and shard assignment matches the pinned hash.",
)
def jsonl_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ariadne_dbt_spark.operators.export import export_jsonl_shards

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select("doc_id", "text")
    out = os.path.join(
        tempfile.gettempdir(),
        # md5, not hash(): PYTHONHASHSEED salts hash() per process, which
        # would leak a fresh orphan dir on every crashed run
        "ariadne_jsonl_export_"
        + __import__("hashlib").md5(sf_dir.encode()).hexdigest()[:8],
    )
    shutil.rmtree(out, ignore_errors=True)
    try:
        export_jsonl_shards(docs, "doc_id", out, seed=5, max_records_per_file=200)
        back = spark.read.json(out)
        res = (
            back.groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.length("text")).alias("total_chars"),
            )
            .orderBy("shard")
        )
        # materialize driver-side before the temp dir is removed
        import pandas as pd

        pdf = res.toPandas()
        return spark.createDataFrame(pdf, "shard string, n_docs bigint, total_chars bigint")
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fo
        FROM documents
    ),
    new_snap AS (
        SELECT doc_id,
               md5(regexp_replace(trim(lower(
                   CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END
               )), '\\s+', ' ', 'g')) AS fn
        FROM documents WHERE doc_id % 13 <> 0
        UNION ALL
        SELECT doc_id + 200000 AS doc_id,
               md5(regexp_replace(trim(lower('brand new doc ' || CAST(doc_id AS VARCHAR))), '\\s+', ' ', 'g')) AS fn
        FROM documents WHERE doc_id % 11 = 0
    ),
    j AS (
        SELECT COALESCE(o.doc_id, n.doc_id) AS id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN fo <> fn THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
    )
    SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status
    """,
    survey="corpus-versioning-diff",
    doc="Corpus snapshot diff (training-data versioning audit): old = "
    "documents; new = documents minus every 13th (removed), every 7th "
    "edited (changed), plus brand-new docs for every 11th id (added). "
    "One full-outer fingerprint join; status counts exact vs the "
    "oracle's independent derivation.",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.versioning import corpus_diff

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select("doc_id", "text")
    edited = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" edited")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("brand new doc "), F.col("doc_id").cast("string")).alias("text"),
    )
    new_snap = edited.union(added)
    return (
        corpus_diff(docs, new_snap, "doc_id", "text")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


# Weighted sampling without replacement (Efraimidis-Spirakis): top-50
# documents by ln(u)/n_chars key with u replayed from md5(ws:doc_id) —
# fully deterministic, so the oracle re-ranks the identical keys. Both
# sides rank on the key ROUNDED to 9 decimals (ln is ~1-ulp across
# libms) with doc_id tiebreak; TakeOrdered keeps the Spark side a
# per-partition-heap top-k, never a global sort.
@query(
    "weighted_sample_docs",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               round(
                   ln((CAST(CONCAT('0x', substr(md5(CONCAT('ws:', CAST(doc_id AS VARCHAR))), 1, 13)) AS BIGINT) + 1.0)
                      / 4503599627370497.0)
                   / CAST(n_chars AS DOUBLE), 9) AS es_key
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT 50
    """,
    survey="weighted-sampling,O1,§8.5",
    doc="Efraimidis-Spirakis weighted sample (k=50, weight=n_chars) "
    "with md5-replayed uniforms: the distributed one-pass form of "
    "weighted reservoir sampling for source-balanced corpus draws.",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return weighted_sample(
        docs.select("doc_id", "n_chars"),
        weight_col="n_chars",
        id_col="doc_id",
        k=50,
        key_decimals=9,
    ).select("doc_id", F.col("n_chars").cast("long").alias("n_chars"), "es_key")


# curriculum learning's data layout: easy→hard phases by exact score
# percentiles, deterministic md5 shuffle within phase (sharded windows —
# no global sort/ntile anywhere; see operators/sampling.py).
@query(
    "curriculum_phase_order",
    oracle="""
    WITH b AS (SELECT quantile_cont(n_chars, 1.0/3) AS b1,
                      quantile_cont(n_chars, 2.0/3) AS b2
               FROM documents),
    ph AS (SELECT doc_id, n_chars,
                  CASE WHEN n_chars <= b1 THEN 1
                       WHEN n_chars <= b2 THEN 2
                       ELSE 3 END AS phase
           FROM documents, b)
    SELECT doc_id, n_chars, phase,
           substring(md5('3:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           ROW_NUMBER() OVER (
               PARTITION BY phase, substring(md5('3:' || CAST(doc_id AS VARCHAR)), 1, 1)
               ORDER BY md5('3:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS pos
    FROM ph ORDER BY phase, shard, pos
    """,
    survey="sampling-curriculum",
    doc="Curriculum ordering: 3 difficulty phases by exact n_chars "
    "terciles (distributed percentile, literal CASE — no global ntile), "
    "md5-sharded deterministic shuffle within each phase.",
)
def curriculum_phase_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import curriculum_order

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", "n_chars"
    )
    return curriculum_order(docs, "doc_id", "n_chars", n_phases=3, seed=3).select(
        "doc_id", "n_chars", "phase", "shard", "pos"
    ).orderBy("phase", "shard", "pos")


# pretraining's zero-waste data layout: concat token streams with <eos>,
# cut fixed blocks ACROSS doc boundaries (vs pack_sequences' greedy
# whole-sample packing for SFT). Every window per-shard; blocks bounded.
@query(
    "block_pack_chunks",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_concat(list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1), ['<eos>']) AS toks,
               md5('0:' || CAST(doc_id AS VARCHAR)) AS key,
               substring(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM documents
    ),
    ordered AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
        FROM d
    ),
    offs AS (
        SELECT *, COALESCE(SUM(len(toks)) OVER (
            PARTITION BY shard ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM ordered
    ),
    tokrows AS (
        SELECT shard,
               unnest(list_transform(range(1, len(toks) + 1),
                      i -> {'g': off + i - 1, 'tok': toks[i]})) AS s
        FROM offs
    )
    SELECT shard,
           CAST(s.g // 128 AS BIGINT) AS block_id,
           CAST(COUNT(*) AS INTEGER) AS n_tokens,
           string_agg(s.tok, ' ' ORDER BY s.g) AS block_text
    FROM tokrows
    GROUP BY shard, s.g // 128
    ORDER BY shard, block_id
    """,
    survey="sampling-block-pack",
    doc="Concat-and-chunk block packing (block=128, <eos> separators, "
    "md5-sharded deterministic doc order): block contents exact vs a "
    "window-cumsum SQL rebuild, including partial tail blocks.",
)
def block_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import block_pack

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select("doc_id", "text")
    return block_pack(docs, "doc_id", "text", block_size=128, seed=0).orderBy(
        "shard", "block_id"
    )


def _psi_block(src_a: str, src_b: str, bucket_expr: str, feature: str, tag: str) -> str:
    """One PSI feature as SQL CTE text (mirrors operators/drift.py
    term-for-term: Laplace (n+1)/(N+k), psi from UNROUNDED ps)."""
    return f"""
    {tag}_ca AS (SELECT {bucket_expr} AS bucket, COUNT(*) AS n_a FROM {src_a} GROUP BY 1),
    {tag}_cb AS (SELECT {bucket_expr} AS bucket, COUNT(*) AS n_b FROM {src_b} GROUP BY 1),
    {tag}_cj AS (SELECT COALESCE(a.bucket, b.bucket) AS bucket,
                        COALESCE(a.n_a, 0) AS n_a, COALESCE(b.n_b, 0) AS n_b
                 FROM {tag}_ca a FULL OUTER JOIN {tag}_cb b ON a.bucket = b.bucket),
    {tag}_ct AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb, COUNT(*) AS k FROM {tag}_cj),
    {tag}_out AS (
        SELECT '{feature}' AS feature, bucket AS drift_bucket, n_a, n_b,
               ROUND((n_a + 1.0) / (ta + k), 6) AS p_a,
               ROUND((n_b + 1.0) / (tb + k), 6) AS p_b,
               ROUND(((n_b + 1.0) / (tb + k) - (n_a + 1.0) / (ta + k))
                     * ln(((n_b + 1.0) / (tb + k)) / ((n_a + 1.0) / (ta + k))), 6)
                   AS psi_term
        FROM {tag}_cj, {tag}_ct)
    """


def _decile_case() -> str:
    conds = "".join(
        f" WHEN n_chars <= e.e{i} THEN 'b{i:02d}'" for i in range(1, 10)
    )
    return f"CASE{conds} ELSE 'b10' END"


_DRIFT_ORACLE = f"""
    WITH snap_a AS (SELECT * FROM documents),
    snap_b AS (SELECT * FROM documents WHERE n_chars >= 120),
    e AS (SELECT {", ".join(f"quantile_cont(n_chars, {i}/10.0) AS e{i}" for i in range(1, 10))}
          FROM snap_a),
    ab AS (SELECT {_decile_case()} AS nbucket FROM snap_a, e),
    bb AS (SELECT {_decile_case()} AS nbucket FROM snap_b, e),
    {_psi_block("snap_a", "snap_b", "source", "source", "s")},
    {_psi_block("ab", "bb", "nbucket", "n_chars", "n")}
    SELECT * FROM s_out UNION ALL SELECT * FROM n_out
    ORDER BY feature, drift_bucket
"""


# corpus-monitoring: PSI drift between snapshots — the alarm a
# continuously-rebuilt corpus needs when a filter/crawl change shifts
# the mix. B simulates deploying a min-length filter over A.
@query(
    "corpus_drift_psi",
    oracle=_DRIFT_ORACLE,
    survey="sampling-drift-psi",
    doc="Population-stability-index drift between corpus snapshots: "
    "per-source categorical PSI + baseline-decile numeric PSI over "
    "n_chars, Laplace-smoothed, exact SQL mirror per term.",
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.drift import categorical_psi, numeric_psi

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    snap_b = docs.where(F.col("n_chars") >= 120)
    cat = categorical_psi(docs, snap_b, "source")
    num = numeric_psi(docs, snap_b, "n_chars", bins=10, feature="n_chars")
    return (
        cat.unionByName(num)
        .withColumnRenamed("bucket", "drift_bucket")
        .orderBy("feature", "drift_bucket")
    )


@query(
    "leakproof_split_audit",
    oracle="""
    SELECT doc_id AS cluster_id,
           CAST(5 AS BIGINT) AS n_members,
           TRUE AS leak_free
    FROM documents WHERE doc_id % 10 = 0
    ORDER BY cluster_id
    """,
    survey="sampling-leakproof-split",
    doc="Near-dup-atomic split audit: 5-member near-dup chains (the "
    "near_dup_clusters construction) are split by their cluster "
    "representative's hash, so every cluster lands WHOLE in one split. "
    "leak_free is the operator's CONTRACT — the oracle pins it TRUE per "
    "cluster with the exact member count; a split that scattered any "
    "chain flips the live value to FALSE and fails the hash. (Split "
    "membership itself is xxhash64 = engine-private, same rule as the "
    "other sampling oracles; per-row determinism + the naive-split-"
    "actually-leaks contrast live in tests/test_sampling.py.)",
)
def leakproof_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import dedup_clusters
    from ariadne_dbt_spark.operators.sampling import leakproof_split

    ks = documents(spark, sf_dir).where(F.col("doc_id") % 10 == 0)
    members = ks.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(4))).alias("i")
    ).select((F.col("doc_id") + F.col("i") * 1000000).alias("doc_id"))
    corpus = (
        documents(spark, sf_dir)
        .select("doc_id")
        .union(members.where(F.col("doc_id") >= 1000000))
    )
    pairs = ks.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    ).select(
        (F.col("doc_id") + F.col("i") * 1000000).alias("id_a"),
        (F.col("doc_id") + (F.col("i") + 1) * 1000000).alias("id_b"),
    )
    clusters = dedup_clusters(pairs)
    out = leakproof_split(
        corpus, "doc_id", clusters,
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return (
        out.join(
            clusters.select(F.col("id").alias("doc_id"), "cluster_id"), "doc_id"
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (F.countDistinct("split") == 1).alias("leak_free"),
        )
        .orderBy("cluster_id")
    )
