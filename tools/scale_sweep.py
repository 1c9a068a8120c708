"""Scale-curve evidence for the flagship scale operators.

Generates a deterministic synthetic corpus (documents + embeddings) with
IDENTICAL statistical structure at several sizes — same vocabulary mix,
same planted-duplicate rate, same embedding cluster geometry — then
times each flagship op at every size and fits the log-log growth slope.
Structure consistency is the point: hand-inflating an existing corpus by
unioning mutated copies changes its duplicate density between scale
points, which corrupts exactly the curve this tool exists to measure.

A slope of 1.0 is linear, 2.0 quadratic; every banded/prefix-filtered op
here must stay well under 2 (the all-pairs baseline it replaces). Run
via ``python bench.py --scale-sweep``; one JSON line to stdout.

All corpus generation is JVM-side column expressions (xxhash64-derived
tokens/vectors — no Python row loop, no RNG state), written once under
``.tmp/sweep_corpus_<n>`` and reused by later runs.
"""

from __future__ import annotations

import json
import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: corpus sizes (docs and vectors). 4x steps — a 16x span with a middle
#: point, big enough that the largest point dwarfs the Spark stage floor
SWEEP_SIZES = (4_000, 16_000, 64_000)

_VOCAB_SIZE = 4_000
_HOT_WORDS = 20          # ~15% of tokens come from a 20-word hot head
_TOKENS_PER_DOC = 100
_EMB_DIM = 64
#: cluster COUNT scales with corpus size (constant ~125-vector cluster
#: mass). A fixed cluster count would grow cluster SIZE linearly with n,
#: baking a quadratic within-cluster candidate mass into the DATA — the
#: curve would then measure the corpus' geometry, not the algorithm's
#: scaling. Growing modes with volume is also what real corpora do.
_CLUSTER_MASS = 125


def _vocab() -> list[str]:
    # deterministic pronounceable-ish tokens: w<k> with a letter prefix
    return [f"w{k}" for k in range(_VOCAB_SIZE)]


def make_corpus(spark: SparkSession, n_docs: int, out_dir: str) -> None:
    """Write ``documents.parquet`` and ``embeddings.parquet`` for one
    sweep point. Idempotent: skips when both outputs already exist."""
    docs_path = os.path.join(out_dir, "documents.parquet")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(docs_path) and os.path.exists(emb_path):
        return
    vocab = _vocab()
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    hot_arr = F.array(*[F.lit(w) for w in vocab[:_HOT_WORDS]])

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # every 10th doc (except 0) re-uses the text of doc_id-5: a planted
    # ~10% duplicate rate with cluster size ≤2, CONSTANT across sizes
    seed = F.when(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 5,
    ).otherwise(F.col("doc_id"))
    pos = F.sequence(F.lit(1), F.lit(_TOKENS_PER_DOC))
    tok = lambda s, i: F.when(  # noqa: E731
        F.pmod(F.xxhash64(s, i, F.lit(7)), F.lit(7)) == 0,
        F.element_at(hot_arr, (F.pmod(F.xxhash64(s, i, F.lit(11)), F.lit(_HOT_WORDS)) + 1).cast("int")),
    ).otherwise(
        F.element_at(vocab_arr, (F.pmod(F.xxhash64(s, i), F.lit(_VOCAB_SIZE)) + 1).cast("int"))
    )
    docs = base.select(
        "doc_id",
        F.array_join(
            F.transform(pos, lambda i: tok(seed, i)), " "
        ).alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(docs_path)

    # embeddings: equal-weight cluster centroid + per-vector noise, both
    # xxhash64-derived in [-1, 1] — same-cluster cosine concentrates
    # near 0.5 (64 dims), giving IVF learnable structure while staying
    # FAR below the 0.9 near-dup threshold (a 0.9 centroid weight put
    # every within-cluster pair over the threshold: ~250k "near-dups"
    # at n=4000 — quadratic result mass baked into the data, which
    # measures the corpus, not the algorithm). Every 20th vector is a
    # direction-identical clone (scaled 2x) of vec_id-7 — planted
    # near-dup pairs at a constant ~5% rate
    vec = spark.range(n_docs).select(F.col("id").alias("vec_id"))
    src = F.when(
        (F.col("vec_id") % 20 == 0) & (F.col("vec_id") > 0),
        F.col("vec_id") - 7,
    ).otherwise(F.col("vec_id"))
    scale = F.when(
        (F.col("vec_id") % 20 == 0) & (F.col("vec_id") > 0), F.lit(2.0)
    ).otherwise(F.lit(1.0))
    cluster = F.pmod(src, F.lit(max(32, n_docs // _CLUSTER_MASS)))
    dims = F.sequence(F.lit(1), F.lit(_EMB_DIM))

    def unit(h) -> F.Column:
        # xxhash64 → [-1, 1] double
        return (F.pmod(h, F.lit(2_000_001)) - F.lit(1_000_000)) / F.lit(1_000_000.0)

    emb = vec.select(
        "vec_id",
        F.transform(
            dims,
            lambda j: (
                (unit(F.xxhash64(cluster, j)) * F.lit(0.5)
                 + unit(F.xxhash64(src, j, F.lit(3))) * F.lit(0.5)) * scale
            ).cast("float"),
        ).alias("embedding"),
        cluster.cast("int").alias("label"),
    )
    emb.repartition(32).write.mode("overwrite").parquet(emb_path)


def _ops() -> dict:
    from ariadne_dbt_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from ariadne_dbt_spark.operators.similarity import (
        ivf_topk,
        pairwise_near_duplicates,
    )

    def run_exact(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        return exact_duplicates(docs, "doc_id", "text").count()

    def run_ngram(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
        n = out.count()
        out.unpersist()
        return n

    def run_minhash(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        return minhash_lsh_candidates(
            docs, "doc_id", "text", n=3, num_perm=64, bands=16
        ).count()

    def run_banded_lsh(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        return pairwise_near_duplicates(
            emb, threshold=0.9, bands=4, planes_per_band=8, dim=_EMB_DIM
        ).count()

    def run_banded_lsh_auto(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # default parameterization: (b, r) derived per corpus size by
        # auto_lsh_params — the curve this is meant to flatten vs the
        # pinned (4,8) row above, which degrades toward quadratic as
        # fixed-width buckets fill up
        n = emb.count()
        return pairwise_near_duplicates(
            emb, threshold=0.9, dim=_EMB_DIM, n_rows=n
        ).count()

    def run_ivf(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        q = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
        return ivf_topk(emb, q, k=10, n_centroids=16, nprobe=3, iters=2).count()

    def run_pq_encode(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        from ariadne_dbt_spark.operators.similarity import pq_encode

        # fixed deterministic codebooks: this curve measures the
        # map-only encode pass (m·k distance evals per row), not
        # training — expected slope ~1 (linear) with a high flat floor
        cb = [
            [
                [((i * 7 + j * 3 + t) % 13 - 6) / 6.0 for t in range(8)]
                for i in range(16)
            ]
            for j in range(8)
        ]
        return pq_encode(emb, cb).count()

    def run_lm_score(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # self-scoring bigram LM: two aggs + two key joins + per-doc agg,
        # all keyed on tokens/doc-id — expected slope ~1
        from ariadne_dbt_spark.operators.lm import lm_cross_entropy

        return lm_cross_entropy(docs, "doc_id", "text").count()

    def run_shared_spans(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # k-gram postings join with the stop-gram cap: candidate mass is
        # bounded by per-gram df ≤ max_df, planted dup rate is constant
        # across sizes — expected slope ~1 (never the all-pairs 2)
        from ariadne_dbt_spark.operators.dedup import shared_span_pairs

        return shared_span_pairs(
            docs, "doc_id", "text", k=8, min_span=15, max_df=20
        ).count()

    def run_containment(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # postings join with the max_df stop-shingle cap: candidate mass
        # bounded by max_df x postings (never all-pairs) - expected
        # slope ~1 like shared_spans, which shares the shape
        from ariadne_dbt_spark.operators.dedup import containment_pairs

        return containment_pairs(
            docs, "doc_id", "text", n=3, threshold=0.9, max_df=20
        ).count()

    def run_block_pack(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # concat-and-chunk layout: one skinny per-shard offset window +
        # one token shuffle into bounded (shard, block) groups —
        # expected slope ~1 (token mass is linear in docs)
        from ariadne_dbt_spark.operators.sampling import block_pack

        return block_pack(docs, "doc_id", "text", block_size=512).count()

    def run_entity_resolution(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # blocked Levenshtein + min-label components over synthesized
        # short names: 40-name blocks (constant size, count grows with
        # n) bound the candidate mass to C(40,2)·(n/40) ~ linear; every
        # 10th name is a 1-char mutation of id-5's → constant planted
        # match rate. Expected slope ~1, never the all-pairs 2.
        from ariadne_dbt_spark.operators.dedup import (
            dedup_clusters,
            edit_distance_near_dups,
        )

        adj = F.array(*[F.lit(f"maker{k}") for k in range(50)])
        noun = F.array(*[F.lit(f"widget{k}") for k in range(50)])
        is_clone = (F.col("doc_id") % 10 == 0) & (F.col("doc_id") > 0)
        seed = F.when(is_clone, F.col("doc_id") - 5).otherwise(F.col("doc_id"))
        name = F.concat(
            F.element_at(adj, (F.pmod(F.xxhash64(seed, F.lit(1)), F.lit(50)) + 1).cast("int")),
            F.when(is_clone, F.lit("x")).otherwise(F.lit("")),
            F.lit(" "),
            F.element_at(noun, (F.pmod(F.xxhash64(seed, F.lit(2)), F.lit(50)) + 1).cast("int")),
            F.lit(" b"),
            (F.col("doc_id") / 40).cast("bigint").cast("string"),
        )
        names = docs.select("doc_id", name.alias("name"))
        block = F.element_at(F.split(F.col("name"), " "), -1)
        pairs = edit_distance_near_dups(names, "doc_id", "name", block, max_dist=3)
        return dedup_clusters(pairs).count()

    def run_quality_survivors(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # the near_dup_quality_survivors composition: PPJoin pairs →
        # min-label clusters → hash-derived quality → per-cluster argmax.
        # Candidate and cluster mass are both bounded by the constant
        # planted dup rate — expected slope ~1.
        from pyspark.sql.window import Window

        from ariadne_dbt_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
        pairs_ck = pairs.localCheckpoint(eager=True)
        pairs.unpersist()
        clusters = dedup_clusters(pairs_ck)
        q = docs.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000)).alias("quality")
        )
        memb = clusters.join(q, clusters.id == q.doc_id).select(
            "cluster_id", "doc_id", "quality"
        )
        w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), "doc_id")
        surv = memb.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
        return surv.count()

    def run_triangles(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # ring graph with chords: each node → +1 and +2, so every node
        # closes one triangle (i, i+1, i+2) — triangle count linear in
        # n, constant degree (no hubs). Expected slope ~1.
        from ariadne_dbt_spark.operators.graph import triangle_counts

        ids = docs.select(F.col("doc_id").alias("src"))
        edges = ids.select("src", (F.col("src") + 1).alias("dst")).unionByName(
            ids.select("src", (F.col("src") + 2).alias("dst"))
        )
        return triangle_counts(edges).count()

    def run_excision(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # ExactSubstr removal in its scale configuration (hash_grams:
        # 64-bit shuffle keys instead of 15-token strings); every 16th
        # doc re-appears as a clone so the duplicated-window fraction is
        # constant across sizes. One gram-keyed count shuffle + dup
        # semi-join + churn-sized covered-set groupBy + rebuild left
        # join (array_except drops covered positions; no corpus-wide
        # (id,pos) anti-join) — expected ~1.
        from ariadne_dbt_spark.operators.dedup import excise_duplicate_spans

        clones = docs.where(F.col("doc_id") % 16 == 0).select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
        )
        return (
            excise_duplicate_spans(
                docs.union(clones), "doc_id", "text", L=15, hash_grams=True
            )
            .where(F.col("n_removed") > 0)
            .count()
        )

    def run_bloom_decon(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        # BFF-style pruning: bench = every 10th doc -> Bloom bitmap ->
        # map-only corpus probe -> candidate-sized exact verify join.
        # Shingle build is linear, probe is map-only, verify shuffles
        # only candidates (constant fraction by construction here) —
        # expected ~1.
        from ariadne_dbt_spark.operators.bloom import bloom_decontaminate

        bench = docs.where(F.col("doc_id") % 10 == 0)
        train = docs.where(F.col("doc_id") % 10 != 0)
        return (
            bloom_decontaminate(train, bench, "doc_id", "text", n=3, min_hits=5)
            .where(F.col("contaminated"))
            .count()
        )

    return {
        "exact_dedup": run_exact,
        "ngram_jaccard": run_ngram,
        "bloom_decontaminate": run_bloom_decon,
        "substring_excision": run_excision,
        "block_pack": run_block_pack,
        "minhash_lsh": run_minhash,
        "embedding_banded_lsh": run_banded_lsh,
        "embedding_banded_lsh_auto": run_banded_lsh_auto,
        "ivf_topk": run_ivf,
        "pq_encode": run_pq_encode,
        "lm_score": run_lm_score,
        "shared_spans": run_shared_spans,
        "containment": run_containment,
        "entity_resolution": run_entity_resolution,
        "quality_survivors": run_quality_survivors,
        "triangle_counts": run_triangles,
    }


def _needs_shingle_rebuild(idx: str) -> bool:
    """True when the per-corpus index is absent OR predates the bloom
    sidecar (a stale .tmp index from an earlier round would silently
    measure the prefilter-disabled path)."""
    import json
    import os

    meta_path = os.path.join(idx, "meta.json")
    if not os.path.exists(meta_path):
        return True
    with open(meta_path) as f:
        return "bloom" not in json.load(f)


def _incremental_indexed_novel_op(out_dir: str):
    """Fixed 1000-doc FULLY-NOVEL batch against the persisted shingle
    index — the bloom sidecar's headline path: every batch shingle is
    provably absent, so the postings join and the bucket scan are both
    skipped (the stored side folds to an empty relation; plan-pinned in
    tests/test_shingle_bloom.py). Expected: flat AND cheaper than the
    all-dup `incremental_indexed_1k_batch` twin at every size — the
    residual cost is the batch shingle pass + the broadcast bitmap
    probe."""
    import os

    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        incremental_near_dup_flags,
    )

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        idx = os.path.join(out_dir, "shingle_index")
        if _needs_shingle_rebuild(idx):
            build_shingle_index(docs, idx, "doc_id", "text", n=3)
        batch = docs.where(F.col("doc_id") < 1000).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            # novel vocabulary: no shingle can exist in the index
            F.concat(
                F.lit("zq"), F.col("doc_id").cast("string"),
                F.lit(" xv"), (F.col("doc_id") * 7).cast("string"),
                F.lit(" wk"), (F.col("doc_id") * 13).cast("string"),
                F.lit(" jn"), (F.col("doc_id") * 17).cast("string"),
                F.lit(" qb"), (F.col("doc_id") * 19).cast("string"),
            ).alias("text"),
        )
        return incremental_near_dup_flags(
            None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        ).count()

    return run


def _incremental_indexed_op(out_dir: str):
    """Fixed 1000-doc batch flagged against a PERSISTED shingle index of
    the whole corpus — the continuously-ingested-corpus serving shape.
    The batch size is constant across sweep points, so this curve
    isolates the corpus-size dependence of one ingest: near-flat slope
    = the batch-bounded claim, measured (cost grows only with
    per-shingle document frequency, not corpus rows). The index build
    is amortized setup (one-time per corpus) and is excluded from the
    timed region, like ivf_build_index vs ivf_query_index."""
    import os

    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        incremental_near_dup_flags,
    )

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        idx = os.path.join(out_dir, "shingle_index")
        if _needs_shingle_rebuild(idx):
            build_shingle_index(docs, idx, "doc_id", "text", n=3)
        batch = docs.where(F.col("doc_id") < 1000).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
        return incremental_near_dup_flags(
            None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        ).count()

    return run


def _ivf_pq_query_op(out_dir: str):
    """Serve one query from a per-corpus PERSISTED IVF-PQ index
    (codes-only partitions, nprobe=3 of 16 cells): the timed region is
    the pruned probe + ADC + re-rank against the source table; the
    index build is amortized one-time setup, excluded like
    ivf_build_index. Expected near-flat: probed bytes ~ 3/16 of a
    corpus already shrunk to m ints per vector."""
    import os

    from ariadne_dbt_spark.operators.similarity import (
        ivf_pq_build_index,
        ivf_pq_query_index,
    )

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        idx = os.path.join(out_dir, "ivfpq_index")
        if not os.path.exists(os.path.join(idx, "index_meta.json")):
            ivf_pq_build_index(
                emb, idx, n_centroids=16, iters=2, m=8, k_sub=16, dim=_EMB_DIM
            )
        q = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
        return ivf_pq_query_index(
            spark, idx, q, k=10, nprobe=3, refine=4, embeddings=emb
        ).count()

    return run


def _table_merge_op(out_dir: str):
    """Constant 1000-row upsert batch MERGEd into a PERSISTED managed
    table of the whole corpus (merge_table): the nightly-upsert serving
    shape. Table build + key-clustering are one-time setup (excluded
    via min-of-2 — the first run pays them); the timed region is one
    COW merge. Footer pruning + hard-link carry must keep it
    O(batch + touched files): the batch keys sit in the lowest id band,
    so while the table grows 16x the touched file set stays ~constant —
    near-flat slope = the claim, measured."""
    import os

    from ariadne_dbt_spark.operators.table_store import (
        merge_table,
        optimize_table,
        write_table,
    )

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        tdir = os.path.join(out_dir, "merge_table_t")
        if not os.path.isdir(tdir):
            base = docs.select(
                "doc_id",
                F.substring("text", 1, 64).alias("snippet"),
                F.length("text").cast("bigint").alias("n_chars"),
            )
            write_table(spark, base, tdir)
            optimize_table(spark, tdir, target_file_mb=1, cluster_by=["doc_id"])
        batch = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("upd"), F.col("id").cast("string")).alias("snippet"),
            (F.col("id") + 1).cast("bigint").alias("n_chars"),
        )
        rep = merge_table(spark, tdir, batch, ["doc_id"])
        return rep["rows_updated"] + rep["rows_inserted"]

    return run


def _view_refresh_1k_batch_op(out_dir: str):
    """Constant 1000-row upsert + incremental VIEW refresh folded from
    the change-feed LOG (incremental_view.refresh_agg_view): the
    streaming-aggregate serving shape. Table + view build are one-time
    setup; the timed region is one merge commit plus one log-fold
    refresh — O(batch churn) + a view merge on the affected groups, so
    while the base grows 16x the fold stays batch-sized: near-flat
    slope = the O(churn) claim, measured. The op RAISES if the refresh
    leaves the log path (a diff or rebuild would silently re-linearize
    the curve)."""
    import os

    from ariadne_dbt_spark.operators.incremental_view import (
        build_agg_view,
        refresh_agg_view,
    )
    from ariadne_dbt_spark.operators.table_store import (
        enable_change_feed,
        merge_table,
        optimize_table,
        write_table,
    )

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        tdir = os.path.join(out_dir, "view_base_t")
        vdir = os.path.join(out_dir, "view_agg_t")
        if not os.path.isdir(tdir):
            base = docs.select(
                "doc_id",
                F.pmod(F.xxhash64("doc_id", F.lit(9)), F.lit(50)).alias("grp"),
                F.length("text").cast("bigint").alias("n_chars"),
            )
            write_table(spark, base, tdir)
            optimize_table(spark, tdir, target_file_mb=1, cluster_by=["doc_id"])
            enable_change_feed(tdir)
            build_agg_view(
                spark, tdir, vdir,
                row_keys=["doc_id"], group_by=["grp"],
                measures={"chars": ("sum", "n_chars"), "n": ("count", None)},
            )
        batch = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(9)), F.lit(50)).alias("grp"),
            (F.col("id") % 997 + 1).cast("bigint").alias("n_chars"),
        )
        merge_table(spark, tdir, batch, ["doc_id"], retention_sec=3600)
        rep = refresh_agg_view(spark, vdir)
        if rep.get("mode") not in ("log", "noop"):
            raise RuntimeError(f"view refresh left the log path: {rep}")
        return rep.get("groups_upserted", 0)

    return run


def _scd2_merge_op(out_dir: str):
    """Constant 2000-event batch merged into a PERSISTED SCD2 history of
    the whole corpus (scd2_merge): the nightly-merge serving shape. The
    history build is amortized one-time setup (excluded, like the index
    builds); the timed region is the batch windows + the join against
    current rows — near-flat slope = the O(batch + touched keys) claim,
    measured."""
    import os

    from ariadne_dbt_spark.operators.asof import scd2_history, scd2_merge

    def _events(src: DataFrame) -> DataFrame:
        return src.select(
            (F.col("doc_id") / 20).cast("bigint").alias("user_id"),
            F.col("doc_id").alias("ts"),
            F.pmod(F.xxhash64("doc_id", F.lit(5)), F.lit(5)).cast("string").alias("state"),
        )

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        hist_path = os.path.join(out_dir, "scd2_history.parquet")
        if not os.path.exists(hist_path):
            scd2_history(
                _events(docs), key_col="user_id", attr_col="state",
                ts_col="ts", tiebreak_col="ts",
            ).write.mode("overwrite").parquet(hist_path)
        existing = spark.read.parquet(hist_path)
        # append-only contract: batch ts sits far above every history ts
        batch = spark.range(2000).select(
            (F.col("id") % 100).alias("user_id"),
            (F.col("id") + F.lit(1_000_000_000)).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit(9)), F.lit(5)).cast("string").alias("state"),
        )
        return scd2_merge(
            existing, batch, key_col="user_id", attr_col="state",
            ts_col="ts", tiebreak_col="ts",
        ).count()

    return run


def _neardup_ingest_gated_op(out_dir: str):
    """One full dedup-gated ingest cycle (flag batch vs persisted
    shingle index → append accepted postings) for a constant 1000-doc
    batch — the continuously-ingested-corpus shape INCLUDING the index
    maintenance write, one step beyond incremental_indexed_1k_batch's
    read-only flags. Batch ids are unique per run so appends never
    collide; the index grows by ≤1k docs/run, noise against the 4k-64k
    corpus. Expected near-flat."""
    import itertools
    import os

    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        ingest_batch_dedup_gated,
    )

    counter = itertools.count()

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        idx = os.path.join(out_dir, "shingle_index_gated")
        if not os.path.exists(os.path.join(idx, "meta.json")):
            build_shingle_index(docs, idx, "doc_id", "text", n=3)
        # pid folds in so a RE-RUN of the sweep against the reused
        # per-corpus index still ingests fresh ids (a batch of already-
        # indexed ids would flag 100% dup and skip the append work,
        # silently shrinking the timed region)
        run_id = next(counter) + (os.getpid() % 997) * 100
        # half the batch is corpus clones (rejected by the gate), half
        # carries a novel token suffix (accepted → exercises the append
        # write, not just the flags join)
        novel_text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda j: F.concat(
                    F.lit(f"nv{run_id}w"),
                    j.cast("string"),
                    F.lit("x"),
                    F.col("doc_id").cast("string"),
                ),
            ),
        )
        batch = docs.where(F.col("doc_id") < 1000).select(
            (F.col("doc_id") + 20_000_000 + run_id * 10_000).alias("doc_id"),
            F.when(F.col("doc_id") % 2 == 1, novel_text)
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return ingest_batch_dedup_gated(
            batch, idx, "doc_id", "text", threshold=0.8
        ).count()

    return run


def _video_neardup_op(out_dir: str):
    """Frame-hash + banded video near-dup over n/16 generated AVI-MPNG
    assets (4 frames of 8x8 each; every 10th asset a byte-identical
    re-encode of id-3 → constant planted pair rate). Generation is
    one-time per corpus (parquet beside it, Arrow-batched encode);
    the timed region is hash + band join + per-pair aggregation —
    map-only hashing and collision-bounded candidates, expected ~1."""
    import os

    from ariadne_dbt_spark.operators.video import video_frame_hashes, video_near_dups

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        from pyspark.sql import types as T

        # v2: 16x16 frames (dhash needs ≥9px width), non-linear pixels
        assets_path = os.path.join(out_dir, "video_assets_v2.parquet")
        if not os.path.exists(assets_path):
            n_docs = docs.count()
            n_videos = max(64, n_docs // 16)

            def gen(batches):
                import pandas as pd

                from ariadne_dbt_spark.operators.multimodal import encode_png
                from ariadne_dbt_spark.operators.video import encode_avi

                for pdf in batches:
                    payloads = []
                    import hashlib

                    for vid in pdf["asset_id"]:
                        vid = int(vid)
                        seed = vid - 3 if (vid % 10 == 0 and vid > 0) else vid
                        # 16x16 (dhash resamples to a 9x8 grid → ≥9px
                        # wide) NOISE frames via md5 — smooth/gradient
                        # pixels would dhash-collide across seeds and
                        # bake a quadratic pair mass into the DATA,
                        # corrupting the very curve this measures
                        frames = []
                        for f in range(4):
                            raw = b"".join(
                                hashlib.md5(f"sv:{seed}:{f}:{i}".encode()).digest()
                                for i in range(48)
                            )
                            frames.append(encode_png(16, 16, 3, list(raw)))
                        payloads.append(encode_avi(frames, width=16, height=16))
                    yield pd.DataFrame(
                        {"asset_id": pdf["asset_id"], "payload": payloads}
                    )

            schema = T.StructType(
                [
                    T.StructField("asset_id", T.LongType()),
                    T.StructField("payload", T.BinaryType()),
                ]
            )
            spark.range(n_videos).select(
                F.col("id").alias("asset_id")
            ).repartition(32).mapInPandas(gen, schema).write.mode(
                "overwrite"
            ).parquet(assets_path)
        assets = spark.read.parquet(assets_path)
        hashes = video_frame_hashes(assets, id_col="asset_id", payload_col="payload")
        return video_near_dups(hashes, id_col="asset_id").count()

    return run


def _rrf_hybrid_op(out_dir: str):
    """The rrf_hybrid_retrieval serving composition against a per-corpus
    PERSISTED BM25 index + the embeddings table: BM25 top-50 pre-cut
    (TakeOrderedAndProject) → rank window over ≤50 rows, brute-force
    cosine top-50, reciprocal-rank fusion, final top-15. Index build is
    amortized one-time setup (excluded, like the other *_query ops).
    Expected slope ≪ 2: the BM25 side is postings-pruned by the query's
    isin literal, the window never sees more than 50 rows at ANY corpus
    size (the round-7 fix this curve exists to pin), and the cosine side
    is one linear map + partial top-k."""
    import os

    from pyspark.sql.window import Window

    from ariadne_dbt_spark.operators.search import bm25
    from ariadne_dbt_spark.operators.search_index import (
        build_search_index,
        read_search_index,
    )
    from ariadne_dbt_spark.operators.similarity import brute_force_topk

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        idx = os.path.join(out_dir, "bm25_index")
        if not os.path.exists(os.path.join(idx, "meta.json")):
            build_search_index(docs, "doc_id", {"text": "text"}, idx)
        postings, docstats, n_docs, avgdl = read_search_index(spark, idx)
        bm = bm25(
            postings, docstats, n_docs, "w0 w1 w2",
            field_weights={"text": 1.0}, avgdl_by_field=avgdl,
        ).select(
            F.col("unique_id").cast("bigint").alias("doc_id"), "bm25_score"
        )
        bm_top = bm.orderBy(F.desc("bm25_score"), "doc_id").limit(50)
        wb = Window.orderBy(F.desc("bm25_score"), "doc_id")
        bm_r = bm_top.select("doc_id", F.row_number().over(wb).alias("r_bm"))
        qvec = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
        cos = brute_force_topk(emb, qvec, k=50, exclude_self=1).select(
            F.col("vec_id").alias("doc_id"), "cos_sim"
        )
        wc = Window.orderBy(F.desc("cos_sim"), "doc_id")
        cos_r = cos.select("doc_id", F.row_number().over(wc).alias("r_cos"))
        fused = bm_r.join(cos_r, "doc_id", "full_outer").select(
            "doc_id",
            (
                F.coalesce(1.0 / (F.lit(60) + F.col("r_bm")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(60) + F.col("r_cos")), F.lit(0.0))
            ).alias("score"),
        )
        return fused.orderBy(F.desc("score"), "doc_id").limit(15).count()

    return run


def _ccnet_buckets_op():
    """ccnet_perplexity_buckets' composition over the sweep corpus with
    a synthesized 4-language key (doc_id % 4 — constant distribution
    across sizes): one bigram-LM scoring pass + the round-8
    value-histogram tercile selection (group by (lang, xent), window
    over DISTINCT rounded xents only). Expected slope ~1 — LM-pass
    dominated; the tercile aggregation never buffers a language's full
    score list, which is exactly what this curve pins."""
    from ariadne_dbt_spark.operators.lm import perplexity_buckets

    def run(spark: SparkSession, docs: DataFrame, emb: DataFrame) -> int:
        langed = docs.select(
            "doc_id",
            F.concat(F.lit("l"), F.pmod(F.col("doc_id"), F.lit(4)).cast("string")).alias("lang"),
            "text",
        )
        return perplexity_buckets(langed, "doc_id", "text", lang_col="lang").count()

    return run


def _fit_slope(xs: list[float], ys: list[float]) -> float:
    """Least-squares slope of log(y) on log(x)."""
    lx = [math.log(x) for x in xs]
    ly = [math.log(max(y, 1e-6)) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return round(num / den, 3)


def run_sweep(
    spark: SparkSession,
    base_dir: str,
    sizes=SWEEP_SIZES,
    only: set[str] | None = None,
) -> dict:
    """``only=`` restricts the sweep to the named ops (targeted
    re-measure after a change; CLI: ``tools/scale_sweep.py op1 op2``).
    Unknown names raise rather than silently measuring nothing."""
    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - non-unix
        load_1m = None
    corpora = []
    for n in sizes:
        # v2: equal-weight cluster/noise embedding mix (see make_corpus)
        out_dir = os.path.join(base_dir, f"sweep_corpus_v2_{n}")
        make_corpus(spark, n, out_dir)
        corpora.append((n, out_dir))

    results: dict[str, dict] = {}
    first = True
    ops = dict(_ops())
    # None marks per-corpus ops: their persisted index lives beside
    # each corpus, so the callable is built per sweep point below
    ops["ccnet_perplexity_buckets"] = _ccnet_buckets_op()
    per_corpus = {
        "incremental_indexed_1k_batch": _incremental_indexed_op,
        "incremental_indexed_novel_1k": _incremental_indexed_novel_op,
        "ivf_pq_query": _ivf_pq_query_op,
        "scd2_merge_2k_batch": _scd2_merge_op,
        "table_merge_1k_batch": _table_merge_op,
        "view_refresh_1k_batch": _view_refresh_1k_batch_op,
        "neardup_ingest_gated_1k": _neardup_ingest_gated_op,
        "video_neardup": _video_neardup_op,
        "rrf_hybrid_retrieval": _rrf_hybrid_op,
    }
    for name in per_corpus:
        ops[name] = None
    if only:
        unknown = set(only) - set(ops)
        if unknown:
            raise ValueError(f"unknown sweep ops: {sorted(unknown)}")
        ops = {k: v for k, v in ops.items() if k in only}
    for op_name, base_fn in ops.items():
        pts = {}
        for n, d in corpora:
            fn = base_fn if base_fn is not None else per_corpus[op_name](d)
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            if first:
                # one unmeasured warm-up execution: the first job of a
                # session carries 20s+ of JVM/codegen/Python-worker
                # startup, which would otherwise land entirely on the
                # smallest point and bend every slope negative
                fn(spark, docs, emb)
                first = False
            # min of 2: a slope fit amplifies per-point noise, and this
            # sandbox shows ±25%+ single-run variance
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, docs, emb)
                runs.append(round(time.perf_counter() - t0, 3))
            pts[n] = {"sec": min(runs), "runs": runs, "result_rows": rows}
        slope = _fit_slope([float(n) for n in pts], [p["sec"] for p in pts.values()])
        results[op_name] = {"points": pts, "loglog_slope": slope}
    return {
        "metric": "scale_sweep",
        "unit": "loglog_slope",
        "sizes": list(sizes),
        "host_load_1m": load_1m,
        "ops": results,
        "value": max(r["loglog_slope"] for r in results.values()),
    }


def main() -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ariadne_dbt_spark.session import get_spark

    spark = get_spark("ariadne-scale-sweep")
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp"
    )
    os.makedirs(base, exist_ok=True)
    only = set(sys.argv[1:]) or None
    print(json.dumps(run_sweep(spark, base, only=only)))


if __name__ == "__main__":
    main()
