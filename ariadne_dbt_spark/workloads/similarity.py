"""Similarity-search workloads over `embeddings` (north-star extensions).

The brute-force oracle re-derives cosine in explicit double precision
(DuckDB's list_cosine_similarity computes in float32 and would drift);
both engines fold the 64 dims left-to-right in doubles, so even the raw
doubles agree — rounding to 6 decimals removes any residual risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.similarity import (
    brute_force_topk,
    pairwise_near_duplicates,
)
from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query

_COS_SQL = """
    list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "embeddings"))


@query(
    "ann_brute_force_topk",
    oracle=f"""
    SELECT b.vec_id, ROUND({_COS_SQL}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
    ORDER BY {_COS_SQL} DESC, b.vec_id
    LIMIT 10
    """,
    survey="similarity-bruteforce",
    doc="Exact cosine top-10 neighbors of vec_id=0 (the ANN baseline).",
)
def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = embeddings(spark, sf_dir)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    topk = brute_force_topk(emb, qvec, k=10, exclude_self=0)
    return topk.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


@query(
    "stream_ann_ivf_topk",
    oracle=f"""
    SELECT b.vec_id, ROUND({_COS_SQL}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
    ORDER BY {_COS_SQL} DESC, b.vec_id
    LIMIT 10
    """,
    survey="similarity-ivf,streaming-index-upsert,E5",
    doc="Streaming vector-index maintenance driven as a REAL stream "
    "(3 micro-batch files: the first trains the IVF cells, each later "
    "one is a gen-guarded O(batch) append): a full-probe query served "
    "from the streamed-built index equals brute-force cosine over "
    "everything ingested, which the oracle recomputes from scratch — "
    "any lost/duplicated batch changes the ranking and fails the hash.",
)
def stream_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ariadne_dbt_spark.operators.similarity import ivf_query_index
    from ariadne_dbt_spark.streaming.vector_stream import ivf_ingest_stream

    emb = embeddings(spark, sf_dir).select("vec_id", "embedding")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    work = tempfile.mkdtemp(prefix="ariadne_vector_stream_")
    try:
        src = os.path.join(work, "src")
        idx = os.path.join(work, "idx")
        emb.repartition(3).write.parquet(src)
        n_batches = ivf_ingest_stream(spark, src, idx, n_centroids=8, iters=2)
        assert n_batches >= 2  # train + at least one append
        # full probe → exact ranking; vec 0 itself (cos 1.0, lowest id)
        # leads and is dropped, leaving the oracle's exact top-10
        served = ivf_query_index(spark, idx, qvec, k=11, nprobe=8)
        top = (
            served.where(F.col("vec_id") != 0)
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(10)
            .select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))
        )
        # LocalRelation: the temp index is deleted below, the returned
        # frame must not re-read it
        return spark.createDataFrame(top.toPandas(), top.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "embedding_label_centroids_sim",
    oracle=f"""
    WITH pairs AS (
        SELECT a.label AS label_a, b.label AS label_b, {_COS_SQL} AS cs
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < b.vec_id AND a.vec_id % 7 = 0 AND b.vec_id % 7 = 0
    )
    SELECT label_a, label_b, COUNT(*) AS n_pairs,
           ROUND(AVG(cs), 4) AS avg_cos
    FROM pairs GROUP BY 1, 2 ORDER BY label_a, label_b
    """,
    survey="similarity-allpairs",
    doc="Within/between-cluster mean cosine on a deterministic 1/7 sample "
    "(pairwise joins stay bounded).",
)
def embedding_label_centroids_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import cosine_similarity

    emb = embeddings(spark, sf_dir).where(F.col("vec_id") % 7 == 0)
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).withColumn(
        "cs", cosine_similarity(F.col("va"), F.col("vb"))
    )
    return (
        pairs.groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.round(F.avg("cs"), 4).alias("avg_cos"))
        .orderBy("label_a", "label_b")
    )


@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH bf AS (
        SELECT b.vec_id,
               ROW_NUMBER() OVER (ORDER BY {_COS_SQL} DESC, b.vec_id) AS bf_rank
        FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0)
    SELECT 10 AS k, 10 AS n_returned, 0 AS n_outside_bf_top25
    """,
    survey="similarity-lsh",
    doc="Multi-probe LSH ANN invariant, oracle-checked at its convergence "
    "bound: the probe budget is set to the corpus size, so the widening "
    "loop must expand hamming-ordered buckets until every vector is "
    "probed and the re-ranked top-10 coincides exactly with the "
    "brute-force ranking the oracle recomputes from first principles "
    "(this holds at EVERY scale factor by construction — a fixed probe "
    "budget's subset-of-top-25 recall is corpus-size-dependent and is "
    "pinned instead by tests/test_similarity.py recall@10 ≥ 0.9). Any "
    "widening/re-rank bug changes n_outside_bf_top25 and fails the hash.",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = embeddings(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") != 0)
    n = corpus.count()
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    lsh = lsh_topk(corpus, qvec, k=10, n_planes=4, min_candidates=n)
    bf25 = brute_force_topk(emb, qvec, k=25, exclude_self=0).select("vec_id")
    outside = lsh.join(bf25, "vec_id", "left_anti")
    return spark.createDataFrame(
        [(10, lsh.count(), outside.count())],
        "k int, n_returned int, n_outside_bf_top25 int",
    )


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH bf AS (
        SELECT b.vec_id,
               ROW_NUMBER() OVER (ORDER BY {_COS_SQL} DESC, b.vec_id) AS bf_rank
        FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0)
    SELECT 10 AS k, 10 AS n_returned, 0 AS n_outside_bf_top25
    """,
    survey="similarity-ivf",
    doc="IVF ANN invariant, oracle-checked: deterministic Lloyd k-means "
    "partitions the corpus into 8 Voronoi cells (init = lowest "
    "xxhash64(id) rows, 3 iterations), the query probes its 3 nearest "
    "cells, exact cosine re-ranks inside probed cells only — the IVF "
    "top-10 must return exactly k results, every one inside the exact "
    "brute-force top-25 recomputed from first principles by the oracle. "
    "A recall miss changes n_outside_bf_top25 and fails the hash. This "
    "is the cell-pruned scale path: training samples, assignment is "
    "map-only, and unprobed cells are never ranked (never read, with "
    "cell-partitioned storage).",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = embeddings(spark, sf_dir)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    ivf = ivf_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10, n_centroids=8, nprobe=3, iters=3
    )
    bf25 = brute_force_topk(emb, qvec, k=25, exclude_self=0).select("vec_id")
    outside = ivf.join(bf25, "vec_id", "left_anti")
    return spark.createDataFrame(
        [(10, ivf.count(), outside.count())],
        "k int, n_returned int, n_outside_bf_top25 int",
    )


_CLONE_EMB_SQL = """
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           list_transform(embedding, x -> x + x) AS embedding
    FROM embeddings WHERE vec_id % 10 = 0
"""


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH corpus AS ({_CLONE_EMB_SQL})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS_SQL}, 6) AS cos_sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.9
    ORDER BY id_a, id_b
    """,
    survey="dedup-embedding-cosine",
    doc="Embedding near-dup pairs (cos ≥ 0.9) via LSH blocking + exact "
    "re-rank inside buckets, on a corpus with planted direction-identical "
    "clones (every 10th vector doubled). The oracle computes ALL pairs "
    "≥ 0.9 by exhaustive SQL cosine — the LSH-blocked plan must find "
    "every one (identical directions provably share every bucket; the "
    "raw corpus tops out at cos ≈ 0.51, so the truth set is exactly the "
    "planted pairs).",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = embeddings(spark, sf_dir).select("vec_id", "embedding")
    clones = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + x).alias("embedding"),
    )
    corpus = emb.union(clones)
    return pairwise_near_duplicates(
        corpus, threshold=0.9, bands=3, planes_per_band=4
    ).orderBy("id_a", "id_b")


#: shared by the exact batch path and the bucketed batch path at its
#: convergence bound (radius = n_planes probes every bucket → must equal
#: the exact ranking row for row)
_BATCH_TOPK_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT a.query_id, b.vec_id, {_COS_SQL} AS cs
        FROM q a JOIN embeddings b ON b.vec_id <> a.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, cs,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, ROUND(cs, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query(
    "ann_batch_topk",
    oracle=_BATCH_TOPK_ORACLE,
    survey="similarity-batch",
    doc="Batch exact retrieval: top-5 cosine neighbors for EVERY query "
    "in a deterministic query set (vec_id % 100 = 0), one corpus scan "
    "for the whole batch (broadcast query side + per-query window "
    "top-k with group-limit pruning) — the production shape; the "
    "single-query functions re-scan per call.",
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import topk_per_query

    emb = embeddings(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # dim pinned to the corpus schema: skips the one-row dispatch probe
    return topk_per_query(
        emb, queries, k=5, exclude_self=True, dim=64
    ).orderBy("query_id", "rank")


@query(
    "ann_batch_lsh_topk",
    oracle=_BATCH_TOPK_ORACLE,
    survey="similarity-batch-lsh",
    doc="Bucketed batch ANN at its convergence bound: every query "
    "explodes into its Hamming-radius probe buckets and candidates "
    "come from a bucket EQUI-join (cost ~ bucket occupancy, never "
    "|corpus| x |batch|); with radius = n_planes every bucket is "
    "probed, so the result must equal the exact batch ranking row for "
    "row (the same oracle as ann_batch_topk). Partial-radius recall "
    "and the per-query exact fallback are pinned by pytest.",
)
def ann_batch_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import batch_lsh_topk

    emb = embeddings(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return batch_lsh_topk(
        emb, queries, k=5, n_planes=6, radius=6, exclude_self=True
    ).orderBy("query_id", "rank")


# -- product quantization (lossless construction) ---------------------------

#: 4 codebook points per subspace, m=4 subspaces of width 2 (dim 8).
#: Every value is a small dyadic rational (0, ±1, ±0.5) and the query
#: below is dyadic too, so every product and partial sum is EXACT in
#: IEEE double — the ADC per-subspace lookup-sum and the oracle's
#: straight dot product agree bit for bit, not just to 6 decimals.
_PQ_POINTS = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.5], [0.5, -1.0]]
_PQ_M = 4
_PQ_QUERY = [0.25, -0.75, 1.0, 0.5, -0.5, 1.25, 0.0, 0.75]


def _pq_point_index(j: int):
    # deterministic subspace-j point choice per vec_id (SQL-mirrorable)
    return (F.col("vec_id") * (j + 3) + F.lit(j)) % 4


def _pq_lut() -> list[list[float]]:
    return [
        [
            _PQ_QUERY[2 * j] * p[0] + _PQ_QUERY[2 * j + 1] * p[1]
            for p in _PQ_POINTS
        ]
        for j in range(_PQ_M)
    ]


def _pq_oracle() -> str:
    # constant-fold the per-subspace contribution into CASE literals
    lut = _pq_lut()
    terms = []
    for j in range(_PQ_M):
        cases = " ".join(
            f"WHEN {p} THEN CAST({lut[j][p]!r} AS DOUBLE)" for p in range(4)
        )
        terms.append(f"(CASE (vec_id * {j + 3} + {j}) % 4 {cases} END)")
    score = " + ".join(terms)
    return f"""
    SELECT vec_id, ROUND({score}, 6) AS adc_score
    FROM embeddings
    ORDER BY {score} DESC, vec_id
    LIMIT 20
    """


@query(
    "ann_pq_lossless_topk",
    oracle=_pq_oracle(),
    survey="similarity-pq",
    doc="Product-quantization retrieval on a LOSSLESS construction: "
    "every vector's 2-wide subvectors sit exactly on a codebook point "
    "(derived deterministically from vec_id), so pq_encode recovers the "
    "exact point indices and the ADC lookup-sum equals the true dot "
    "product — the oracle ranks by the straight dot, and the PQ path "
    "must reproduce it exactly. Exercises encode (map-only argmin per "
    "subspace) + ADC top-k (m table lookups per row, TakeOrdered).",
)
def ann_pq_lossless_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import pq_encode, pq_topk

    pts = F.array(*[F.array(*[F.lit(x) for x in p]) for p in _PQ_POINTS])
    corpus = embeddings(spark, sf_dir).select(
        "vec_id",
        F.flatten(
            F.array(
                *[
                    F.element_at(pts, _pq_point_index(j).cast("int") + 1)
                    for j in range(_PQ_M)
                ]
            )
        ).alias("embedding"),
    )
    codebooks = [_PQ_POINTS] * _PQ_M
    codes = pq_encode(corpus, codebooks)
    out = pq_topk(codes, codebooks, _PQ_QUERY, k=20)
    return out.select("vec_id", F.round("adc_score", 6).alias("adc_score"))


def _sem_centroids(k: int = 4, dim: int = 64) -> list[list[float]]:
    """Data-independent pinned centroids (LCG, values in [-1, 1], 6
    decimals so the repr-literal parses to the identical double in both
    engines). The workload pins ASSIGNMENT + PRUNE semantics against
    the SQL mirror; trained-centroid quality is pinned by pytest."""
    out, x = [], 123456789
    for _ in range(k):
        row = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) % (1 << 31)
            row.append(round(x / (1 << 30) - 1.0, 6))
        out.append(row)
    return out


_SEM_CENTS = _sem_centroids()
_SEM_CENTS_SQL = ",\n        ".join(
    "({i}, [{vals}], {norm!r})".format(
        i=i,
        vals=", ".join(repr(v) for v in c),
        norm=__import__("math").sqrt(sum(v * v for v in c)),
    )
    for i, c in enumerate(_SEM_CENTS)
)

_COS_XY = _COS_SQL.replace("a.embedding", "x.embedding").replace(
    "b.embedding", "y.embedding"
)


@query(
    "semantic_dedup_flags",
    oracle=f"""
    WITH corpus AS ({_CLONE_EMB_SQL}),
    cents(cid, c, cnorm) AS (VALUES
        {_SEM_CENTS_SQL}),
    d AS (
        SELECT corpus.vec_id, corpus.embedding, cents.cid,
               list_sum(list_transform(range(1, len(corpus.embedding) + 1),
                        i -> CAST(corpus.embedding[i] AS DOUBLE) * c[i]))
               / (sqrt(list_sum(list_transform(corpus.embedding,
                        e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) * cnorm) AS cs
        FROM corpus CROSS JOIN cents),
    asg AS (
        SELECT vec_id, embedding, cid AS cluster
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
              FROM d)
        WHERE rn = 1),
    dropped AS (
        SELECT DISTINCT x.vec_id
        FROM asg x JOIN asg y ON x.cluster = y.cluster AND y.vec_id < x.vec_id
        WHERE {_COS_XY} >= 0.99)
    SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster, dr.vec_id IS NULL AS keep
    FROM asg a LEFT JOIN dropped dr ON a.vec_id = dr.vec_id
    ORDER BY a.vec_id
    """,
    survey="dedup-semantic",
    doc="SemDeDup (cluster-then-prune semantic dedup) on the planted-"
    "clone corpus with PINNED centroids: cosine-argmax assignment "
    "(scale-invariant, so each 2x clone lands bit-identically in its "
    "original's cluster), within-cluster smaller-id-wins pruning at "
    "cos >= 0.99. The oracle re-derives assignment and pruning from "
    "first principles; the trained-centroid (Lloyd) path and the "
    "Arrow blockwise path are pinned by tests/test_semdedup.py.",
)
def semantic_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import semantic_dedup

    emb = embeddings(spark, sf_dir).select("vec_id", "embedding")
    clones = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + x).alias("embedding"),
    )
    corpus = emb.union(clones)
    return semantic_dedup(
        corpus, eps=0.99, centroids=_SEM_CENTS
    ).orderBy("vec_id")


# Int8 embedding quantization audit: quantize (map-only, tinyint codes +
# per-vector scale), dequantize, and verify per label that every vector
# reconstructs within the analytic maxabs/253 bound and every code is in
# range. Booleans are rounding-tie-robust (a tie flips between two codes
# that BOTH satisfy the bound), so the summary hash-verifies cross-engine
# even though raw reconstructions are floats.
@query(
    "int8_quant_audit",
    oracle="""
    WITH m AS (
        SELECT label,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
               embedding
        FROM embeddings
    ),
    e AS (
        SELECT label, maxabs,
               list_max(list_transform(embedding, x ->
                   abs(CAST(x AS DOUBLE)
                       - round(CAST(x AS DOUBLE) * 127 /
                               (CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs END))
                         * (maxabs / 127.0)))) AS max_err,
               list_max(list_transform(embedding, x ->
                   abs(round(CAST(x AS DOUBLE) * 127 /
                             (CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs END))))) AS max_code
        FROM m
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN max_err <= maxabs / 253 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_bound,
           CAST(SUM(CASE WHEN max_code > 127 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_range
    FROM e
    GROUP BY label
    ORDER BY label
    """,
    survey="int8-quant,§8.2",
    doc="Symmetric per-vector int8 quantization (4x serving-index "
    "shrink): round(x*127/maxabs) tinyint codes + scale, dequant "
    "error bounded by maxabs/253, audited per label.",
)
def int8_quant_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.similarity import dequantize_int8, quantize_int8

    emb = embeddings(spark, sf_dir)
    dim = 64  # driver embeddings schema; passing it skips the probe job
    deq = dequantize_int8(quantize_int8(emb, dim=dim))
    joined = emb.join(deq, "vec_id")
    err = F.array_max(
        F.zip_with(
            F.col("embedding"),
            F.col("vec_approx"),
            lambda x, a: F.abs(x.cast("double") - a),
        )
    )
    code_max = F.array_max(F.transform(F.col("codes"), lambda c: F.abs(c.cast("int"))))
    bound = F.col("qscale") * 127 / 253
    return (
        joined.select(
            F.col("label").cast("long").alias("label"),
            (err <= bound).cast("int").alias("ok"),
            (code_max > 127).cast("int").alias("oor"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("ok").cast("long").alias("n_within_bound"),
            F.sum("oor").cast("long").alias("n_out_of_range"),
        )
        .orderBy("label")
    )


_COS16_SQL = """
    list_sum(list_transform(range(1, 17),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding[1:16], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(b.embedding[1:16], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


# Matryoshka-style dimension truncation audit: retrieval over a 16-dim
# PREFIX of the 64-dim embeddings (MRL-trained models make prefixes
# usable; truncation is the standard 4x storage/compute cut) with the
# overlap vs the full-dim top-k measured per rank. At 100 TB the prefix
# slice is a map-only projection that cuts candidate-scan bytes 4x
# before any exact full-dim re-rank of the shortlist.
@query(
    "ann_matryoshka_audit",
    oracle=f"""
    WITH fullk AS (
        SELECT b.vec_id
        FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
        ORDER BY {_COS_SQL} DESC, b.vec_id
        LIMIT 10
    ),
    trunck AS (
        SELECT b.vec_id, ROUND({_COS16_SQL}, 6) AS cos_trunc,
               ROW_NUMBER() OVER (ORDER BY {_COS16_SQL} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
    )
    SELECT rank, vec_id, cos_trunc,
           vec_id IN (SELECT vec_id FROM fullk) AS in_full_topk
    FROM trunck WHERE rank <= 10 ORDER BY rank
    """,
    survey="similarity-matryoshka",
    doc="Matryoshka truncation audit: top-10 by 16-dim prefix cosine "
    "with per-rank membership in the full 64-dim top-10 — the "
    "storage/recall trade-off measurement for dimension-truncated "
    "retrieval.",
)
def ann_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = embeddings(spark, sf_dir)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    trunc = brute_force_topk(emb16, q[:16], k=10, exclude_self=0)
    full_ids = [
        int(r["vec_id"])
        for r in brute_force_topk(emb, q, k=10, exclude_self=0).collect()
    ]
    w = Window.orderBy(F.desc("cos_sim"), "vec_id")
    return trunc.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "vec_id",
        F.round("cos_sim", 6).alias("cos_trunc"),
        F.col("vec_id").isin(full_ids).alias("in_full_topk"),
    ).orderBy("rank")
