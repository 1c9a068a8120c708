"""Deduplication workloads over `documents` (north-star scale extensions).

The raw corpus has no planted duplicates, so each workload derives a
corpus-with-dups deterministically (original docs UNION a mutated copy)
— Spark and the SQL oracle construct the identical corpus, making the
dedup result exactly checkable. MinHash-LSH and SimHash use engine
hashing (xxhash64) the oracle can't reproduce → rows-only checks there,
with invariants pinned by pytest instead (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.functions.text import tokenize
from ariadne_dbt_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from ariadne_dbt_spark.operators.text import with_simhash
from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


def corpus_with_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 10th doc re-appears under id+1000000 with identical text."""
    docs = documents(spark, sf_dir).select("doc_id", "text")
    clones = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return docs.union(clones)


_EXACT_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def corpus_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 20th doc re-appears with its first word dropped → high-but-
    not-1.0 Jaccard near-duplicates."""
    docs = documents(spark, sf_dir).select("doc_id", "text")
    mutated = docs.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return docs.union(mutated)


_NEAR_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           substring(text, strpos(text, ' ') + 1) AS text
    FROM documents WHERE doc_id % 20 = 0
"""


@query(
    "exact_dedup_groups",
    oracle=f"""
    WITH corpus AS ({_EXACT_CORPUS_SQL}),
    fps AS (
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM corpus
    )
    SELECT fingerprint, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
    FROM fps GROUP BY fingerprint HAVING COUNT(*) > 1
    ORDER BY keep_id
    """,
    survey="dedup-exact,E5",
    doc="Exact duplicate groups by normalized-text hash (hash-groupBy; one "
    "shuffle on the fingerprint at any scale).",
)
def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_exact_dups(spark, sf_dir)
    return exact_duplicates(corpus, "doc_id", "text").orderBy("keep_id")


@query(
    "ngram_jaccard_near_dups",
    oracle=f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    toked AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1) AS toks
        FROM corpus
    ),
    shingled AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 3 + 2),
                                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
              FROM toked)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingled GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8
    ORDER BY id_a, id_b
    """,
    survey="dedup-ngram-jaccard",
    doc="Exact 3-gram Jaccard near-dup pairs (threshold 0.8); candidates "
    "pruned via the shingle self-join.",
)
def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_near_dups(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8)
    # honor the operator's cache contract WITHOUT a driver round-trip:
    # localCheckpoint re-materializes the (already computed) pair set as
    # executor-local blocks with the lineage cut, so the explicit cache
    # can be released immediately; the checkpoint blocks are dropped by
    # the ContextCleaner when the frame goes out of scope. At corpus
    # scale the pair set is NOT driver-sized — nothing here collects.
    out = pairs.localCheckpoint(eager=True)
    pairs.unpersist()
    return out.orderBy("id_a", "id_b")


@query(
    "minhash_lsh_candidates",
    # xxhash64 signatures aren't SQL-reproducible, but this PROVABLE
    # invariant is: identical-text clones have identical shingle sets →
    # identical MinHash signatures → they share every band bucket, so every
    # planted clone pair MUST appear among the LSH candidates. The oracle
    # derives the planted-pair count from first principles; any recall miss
    # flips n_found/n_missed and fails the hash. (Recall vs exact Jaccard
    # on *near*-dups stays pinned in tests/test_dedup.py.)
    oracle="""
    SELECT COUNT(*) AS n_planted, COUNT(*) AS n_found, 0 AS n_missed
    FROM documents
    WHERE doc_id % 10 = 0
      AND len(list_filter(string_split_regex(
            regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
            t -> length(t) >= 1)) >= 3
    """,
    survey="dedup-minhash-lsh",
    doc="MinHash(64 perms)+LSH(16 bands) candidate generation on a corpus "
    "with planted exact clones — oracle-checked via the guaranteed-recall "
    "invariant (identical docs must collide in every band).",
)
def minhash_lsh_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_exact_dups(spark, sf_dir)
    cands = minhash_lsh_candidates(corpus, "doc_id", "text", n=3, num_perm=64, bands=16)
    # planted pairs that can shingle (≥3 tokens — same tokenizer as the op)
    planted = (
        documents(spark, sf_dir)
        .where(
            (F.col("doc_id") % 10 == 0)
            & (F.size(tokenize(F.col("text"), min_len=1, stop=False)) >= 3)
        )
        .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1000000).alias("id_b"))
    )
    hit = planted.join(cands.withColumn("_hit", F.lit(1)), ["id_a", "id_b"], "left")
    return hit.agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_found"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).cast("int").alias("n_missed"),
    )


@query(
    "simhash_fingerprints",
    # xxhash64 bit votes aren't SQL-reproducible; the identity invariant
    # is: a byte-identical clone must get a bit-identical 64-bit
    # fingerprint (hamming distance 0) — any drift in tokenization,
    # shingling, or bit voting between the two copies fails the hash.
    oracle="""
    SELECT COUNT(*) AS n_clones, COUNT(*) AS n_hamming_zero, 0 AS n_hamming_nonzero
    FROM documents WHERE doc_id % 10 = 0
    """,
    survey="dedup-simhash",
    doc="64-bit SimHash fingerprints over word 2-shingles on a corpus with "
    "planted exact clones — oracle-checked via the determinism invariant "
    "hamming(simhash(doc), simhash(clone)) = 0.",
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_exact_dups(spark, sf_dir)
    fps = with_simhash(
        corpus, "text", repartition_to=spark.sparkContext.defaultParallelism
    ).select("doc_id", "simhash")
    orig = fps.where(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("k"), F.col("simhash").alias("h_a")
    )
    clone = fps.where(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("k"), F.col("simhash").alias("h_b")
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return clone.join(orig, "k").agg(
        F.count(F.lit(1)).alias("n_clones"),
        F.sum(F.when(ham == 0, 1).otherwise(0)).alias("n_hamming_zero"),
        F.sum(F.when(ham != 0, 1).otherwise(0)).cast("int").alias("n_hamming_nonzero"),
    )


# End-to-end training-corpus pipeline: quality filter → exact dedup →
# token accounting, every stage deterministic and re-derived by the
# oracle over the identical planted-duplicate corpus. This is the
# composition a real 100 TB data pipeline runs nightly; each stage is
# individually oracle-verified elsewhere (doc_quality_scores,
# exact_dedup_groups, doc_token_stats) — this row proves they compose.
_QUALITY_SQL = f"""
    SELECT doc_id, text,
           least(CAST(length(text) AS BIGINT) * 800, 400000)
           + (CASE WHEN length(text) > 0
                   THEN 300000 - least((CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT) * 1200000) // length(text), 300000)
                   ELSE 300000 END)
           + (CASE WHEN list_count(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'), t -> length(t) >= 1)) > 0
                   THEN least((CAST(list_count(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'), t -> length(t) >= 1 AND t IN ({{stops}}))) AS BIGINT) * 1500000)
                              // list_count(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'), t -> length(t) >= 1)), 300000)
                   ELSE 0 END) AS quality
    FROM corpus
"""


def _pipeline_oracle() -> str:
    from ariadne_dbt_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    quality = _QUALITY_SQL.format(stops=stops)
    return f"""
    WITH corpus AS ({_EXACT_CORPUS_SQL}),
    scored AS ({quality}),
    passed AS (SELECT doc_id, text FROM scored WHERE quality >= 600000),
    fps AS (SELECT doc_id, text,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
            FROM passed),
    keep AS (SELECT fp, MIN(doc_id) AS keep_id FROM fps GROUP BY fp),
    uniq AS (SELECT f.doc_id, f.text FROM fps f JOIN keep k ON f.doc_id = k.keep_id)
    SELECT (SELECT COUNT(*) FROM corpus) AS n_input,
           (SELECT COUNT(*) FROM passed) AS n_quality,
           (SELECT COUNT(*) FROM uniq) AS n_unique,
           (SELECT CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
            FROM uniq) AS total_ws_tokens
    """


@query(
    "training_corpus_pipeline",
    oracle=_pipeline_oracle(),
    survey="pipeline-composition,quality-scoring,dedup-exact,token-counting",
    doc="Quality-filter (integer-millionths score >= 600000) → exact "
    "dedup (min-id survivor per normalized fingerprint) → whitespace "
    "token accounting, over the planted-duplicate corpus; the oracle "
    "re-derives every stage and the stage counts must agree exactly.",
)
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import dedup_exact
    from ariadne_dbt_spark.operators.text import (
        quality_score_millionths,
        whitespace_token_count,
    )

    corpus = corpus_with_exact_dups(spark, sf_dir)
    passed = corpus.where(quality_score_millionths("text") >= 600000)
    uniq = dedup_exact(passed, "doc_id", "text")
    n_input = corpus.count()
    n_quality = passed.count()
    stats = uniq.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(whitespace_token_count("text").cast("bigint")).alias("total_ws_tokens"),
    ).first()
    return spark.createDataFrame(
        [(n_input, n_quality, stats["n_unique"], stats["total_ws_tokens"])],
        "n_input bigint, n_quality bigint, n_unique bigint, total_ws_tokens bigint",
    )


# Connected components over near-dup pairs (the collapse step of a dedup
# pipeline — near-duplication is not transitive, so A~B, B~C must merge
# into one keep-decision even without an A~C pair). The pair graph here
# is deterministic 5-node CHAINS (k+i·1M)—(k+(i+1)·1M), so min-label
# propagation must run the full component diameter, not just one hop;
# the oracle states the closed-form component membership.
@query(
    "near_dup_clusters",
    oracle="""
    WITH ks AS (SELECT doc_id AS k FROM documents WHERE doc_id % 10 = 0)
    SELECT k + i * 1000000 AS doc_id, k AS cluster_id
    FROM ks CROSS JOIN UNNEST(range(0, 5)) AS t(i)
    """,
    survey="dedup-clusters (beyond reference)",
    doc="Iterative min-label connected components (driver-loop joins, "
    "graph diameter rounds) assigning every chained near-dup to the "
    "min-id canonical cluster.",
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import dedup_clusters

    ks = documents(spark, sf_dir).where(F.col("doc_id") % 10 == 0)
    pairs = (
        ks.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"))
        .select(
            (F.col("doc_id") + F.col("i") * 1000000).alias("id_a"),
            (F.col("doc_id") + (F.col("i") + 1) * 1000000).alias("id_b"),
        )
    )
    return dedup_clusters(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


# Test-set decontamination: benchmark = every 10th doc, train = the rest;
# a training doc is contaminated when it shares >= 5 distinct 3-gram
# shingles with any benchmark doc. The tiny synthetic vocabulary makes
# shingle collisions common, so n_hits values are non-trivial.
@query(
    "decontamination_check",
    oracle=r"""
    WITH toked AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+'),
                   t -> length(t) >= 1) AS toks
        FROM documents
    ),
    shingled AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 3 + 2),
                                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
              FROM toked)
    ),
    bench AS (SELECT DISTINCT shingle FROM shingled WHERE doc_id % 10 = 0),
    train AS (SELECT * FROM shingled WHERE doc_id % 10 <> 0),
    hits AS (
        SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_hits
        FROM train t JOIN bench b ON t.shingle = b.shingle
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) >= 5 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    survey="decontamination",
    doc="Benchmark-overlap decontamination: training docs sharing >=5 "
    "distinct 3-gram shingles with the held-out set are flagged.",
)
def decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import decontamination_flags

    docs = documents(spark, sf_dir).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    return decontamination_flags(
        train, bench, "doc_id", "text", n=3, min_hits=5
    ).select(F.col("id").alias("doc_id"), "n_hits", "contaminated")


# -- incremental (batch-vs-corpus) dedup -------------------------------------
# Existing corpus = even doc_ids; incoming batch = odd doc_ids UNION
# near-dup mutations of every 20th even doc (first word dropped,
# id+2000000) — so the batch contains both genuinely-new docs and docs
# that collide with the existing corpus. Both engines build the
# identical split, making the per-batch-doc flags exactly checkable.
_SHINGLE_SQL = """
        SELECT doc_id,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1) AS toks
        FROM {src}
"""


#: shared by the on-the-fly and persisted-index workloads — both must
#: produce byte-identical flags, so they pin the SAME oracle
_INCREMENTAL_ORACLE = f"""
    WITH existing AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id,
               substring(text, strpos(text, ' ') + 1) AS text
        FROM documents WHERE doc_id % 20 = 0
    ),
    etoks AS ({_SHINGLE_SQL.format(src="existing")}),
    btoks AS ({_SHINGLE_SQL.format(src="batch")}),
    esh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3 + 2),
                                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
            FROM etoks)
    ),
    bsh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3 + 2),
                                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
            FROM btoks)
    ),
    esz AS (SELECT doc_id, COUNT(*) AS sz FROM esh GROUP BY 1),
    bsz AS (SELECT doc_id, COUNT(*) AS sz FROM bsh GROUP BY 1),
    inter AS (
        SELECT b.doc_id AS b_id, e.doc_id AS e_id, COUNT(*) AS inter
        FROM bsh b JOIN esh e ON b.shingle = e.shingle
        GROUP BY 1, 2
    ),
    hits AS (
        SELECT i.b_id, COUNT(*) AS n_dups,
               ROUND(MAX(CAST(i.inter AS DOUBLE)
                         / CAST(bz.sz + ez.sz - i.inter AS DOUBLE)), 6) AS max_jaccard
        FROM inter i
        JOIN bsz bz ON bz.doc_id = i.b_id
        JOIN esz ez ON ez.doc_id = i.e_id
        WHERE CAST(i.inter AS DOUBLE) / CAST(bz.sz + ez.sz - i.inter AS DOUBLE) >= 0.8
        GROUP BY 1
    )
    SELECT b.doc_id AS id,
           CAST(COALESCE(h.n_dups, 0) AS BIGINT) AS n_dups,
           h.max_jaccard,
           COALESCE(h.n_dups, 0) > 0 AS is_dup
    FROM (SELECT DISTINCT doc_id FROM batch) b
    LEFT JOIN hits h ON h.b_id = b.doc_id
    ORDER BY id
    """


def _incremental_split(spark: SparkSession, sf_dir: str):
    docs = documents(spark, sf_dir).select("doc_id", "text")
    existing = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1).union(
        docs.where(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    return existing, batch


@query(
    "incremental_dedup_flags",
    oracle=_INCREMENTAL_ORACLE,
    survey="dedup-incremental",
    doc="Incremental ingestion dedup: flag each incoming-batch doc that "
    "near-duplicates (Jaccard >= 0.8 on word 3-grams) any EXISTING "
    "corpus doc — batch-bounded cost, the existing side contributes "
    "only its (persistable) posting list; planted mutations of even "
    "docs must flag, genuinely-new odd docs must not.",
)
def incremental_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import incremental_near_dup_flags

    existing, batch = _incremental_split(spark, sf_dir)
    return incremental_near_dup_flags(
        existing, batch, "doc_id", "text", n=3, threshold=0.8
    ).orderBy("id")


@query(
    "incremental_dedup_indexed",
    oracle=_INCREMENTAL_ORACLE,
    survey="dedup-incremental-index",
    doc="Incremental dedup served from a PERSISTED shingle-postings "
    "index (build_shingle_index): the existing corpus is shingled once "
    "and written as bucket-partitioned parquet; the batch query joins "
    "against that index with the scan pruned to the batch's own "
    "shingle-hash buckets — the corpus is never re-shingled. Pinned to "
    "the SAME oracle as the on-the-fly path: the index must change "
    "nothing but the physical plan.",
)
def incremental_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        incremental_near_dup_flags,
    )

    existing, batch = _incremental_split(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join(tempfile.gettempdir(), f"ariadne_shingle_idx_{tag}")
    build_shingle_index(existing, index_dir, "doc_id", "text", n=3)
    return incremental_near_dup_flags(
        None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=index_dir
    ).orderBy("id")


@query(
    "stream_neardup_kept",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(COUNT(*) AS BIGINT) AS n_rejected,
           CAST(2 * COUNT(*) AS BIGINT) AS n_input
    FROM documents WHERE doc_id % 10 = 0
    """,
    survey="dedup-streaming-neardup",
    doc="Streaming NEAR-dup rejection at ingest, driven as a REAL "
    "stream (4 micro-batch files, foreachBatch vs a persisted shingle "
    "index built from the corpus, accepted postings appended between "
    "batches): the batch holds one exact clone (reject, J=1 vs the "
    "corpus) and one id-tokenized synthetic doc (accept, shares no "
    "shingle with anything) per every-10th corpus doc, so the kept/"
    "rejected counts are arrival-order independent and SQL-exact.",
)
def stream_neardup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pandas as pd

    from ariadne_dbt_spark.operators.dedup import build_shingle_index
    from ariadne_dbt_spark.streaming.neardup_stream import near_dup_ingest_stream

    docs = documents(spark, sf_dir).select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="ariadne_neardup_stream_")
    try:
        idx = os.path.join(work, "idx")
        out = os.path.join(work, "out")
        src = os.path.join(work, "src")
        tenth = docs.where(F.col("doc_id") % 10 == 0)
        # the index holds exactly the docs the clones must hit — the
        # rejection decision is identical with the full corpus indexed,
        # this just keeps the gate row's build cost proportional to the
        # planted structure
        build_shingle_index(tenth, idx, "doc_id", "text", n=3)
        synth_text = F.concat_ws(
            " ",
            *[
                F.concat(F.lit(w), F.col("doc_id").cast("string"))
                for w in ("synthdoc", "alpha", "beta", "gamma", "delta", "omega")
            ],
        )
        batch = tenth.select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
        ).union(
            tenth.select((F.col("doc_id") + 3_000_000).alias("doc_id"), synth_text.alias("text"))
        )
        n_input = batch.count()
        batch.repartition(2).write.parquet(src)
        n_kept = near_dup_ingest_stream(
            spark, src, idx, out, n=3, threshold=0.8, max_files_per_trigger=1
        )
        # LocalRelation result: the temp corpus/index/output are deleted
        # below, so the returned frame must not re-read them
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "n_kept": [n_kept],
                    "n_rejected": [n_input - n_kept],
                    "n_input": [n_input],
                }
            ).astype("int64")
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "doc_boilerplate_removal",
    oracle="""
    WITH corpus AS (
        SELECT doc_id,
               'doc ' || doc_id || ' body' || chr(10) ||
               'SHARED FOOTER NOTICE' || chr(10) || text AS t
        FROM documents
    ),
    lines AS (
        SELECT doc_id,
               UNNEST(str_split(t, chr(10))) AS line,
               UNNEST(generate_series(1, len(str_split(t, chr(10))))) AS pos
        FROM corpus
    ),
    boiler AS (
        SELECT trim(line) AS nline
        FROM lines WHERE trim(line) <> ''
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    kept AS (
        SELECT * FROM lines
        WHERE trim(line) = '' OR trim(line) NOT IN (SELECT nline FROM boiler)
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_total FROM lines GROUP BY doc_id),
    re AS (
        SELECT doc_id,
               string_agg(line, chr(10) ORDER BY pos) AS text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id AS id,
           COALESCE(re.text, '') AS text,
           CAST(COALESCE(re.n_kept, 0) AS INT) AS n_lines_kept,
           CAST(t.n_total - COALESCE(re.n_kept, 0) AS INT) AS n_lines_dropped
    FROM totals t LEFT JOIN re ON t.doc_id = re.doc_id
    ORDER BY id
    """,
    survey="dedup-boilerplate-lines",
    doc="C4-style line-level boilerplate removal on a constructed "
    "multi-line corpus (per-doc unique line + a footer planted in "
    "every doc + the natural text): lines whose trimmed form appears "
    "in >= 2 distinct docs are dropped, survivors rejoin in original "
    "order, fully-boilerplate docs survive as empty text. The oracle "
    "is an exact SQL mirror (distinct-doc line frequency computed the "
    "same way), so natural cross-doc repeats in the data are handled "
    "identically by both engines.",
)
def doc_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import remove_boilerplate_lines

    corpus = documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("doc "), F.col("doc_id").cast("string"), F.lit(" body\n"),
            F.lit("SHARED FOOTER NOTICE\n"), F.col("text"),
        ).alias("text"),
    )
    return remove_boilerplate_lines(corpus, "doc_id", "text", min_df=2).orderBy("id")


_SPAN_LEADS = " || ' ' || ".join(
    ["tok"] + [f"LEAD(tok, {i}) OVER w" for i in range(1, 8)]
)


@query(
    "shared_span_pairs",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id,
               'quoted passage begins here now ' ||
               array_to_string(string_split_regex(trim(lower(text)), '\\s+')[4:25], ' ') ||
               ' quoted passage ends here now' AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
               UNNEST(generate_series(0, len(string_split_regex(trim(lower(text)), '\\s+')) - 1)) AS pos
        FROM corpus
    ),
    grams AS (
        SELECT doc_id, pos, {_SPAN_LEADS} AS gram
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    g2 AS (SELECT doc_id, pos, gram FROM grams WHERE gram IS NOT NULL),
    capped AS (SELECT gram FROM g2 GROUP BY gram HAVING COUNT(DISTINCT doc_id) <= 20),
    g3 AS (SELECT g2.doc_id, g2.pos, g2.gram FROM g2 JOIN capped USING (gram)),
    m AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a,
               a.pos - b.pos AS diag
        FROM g3 a JOIN g3 b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    isl AS (
        SELECT id_a, id_b, diag, pos_a,
               pos_a - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS island
        FROM m
    ),
    spans AS (
        SELECT id_a, id_b, MAX(pos_a) - MIN(pos_a) + 8 AS span_tokens
        FROM isl GROUP BY id_a, id_b, diag, island
        HAVING MAX(pos_a) - MIN(pos_a) + 8 >= 15
    )
    SELECT id_a, id_b, CAST(COUNT(*) AS INT) AS n_spans,
           CAST(MAX(span_tokens) AS INT) AS max_span_tokens
    FROM spans GROUP BY id_a, id_b ORDER BY id_a, id_b
    """,
    survey="dedup-substring-spans",
    doc="Exact shared-substring span detection (Lee et al. 2022 analog): "
    "every 10th doc spawns a 'quoting' doc embedding a verbatim 22-token "
    "slice; pairs sharing any >=15-token span are found via the k-gram "
    "postings join + diagonal gaps-and-islands run merge (k=8, "
    "max_df=20 stop-gram cap). The oracle re-derives spans from first "
    "principles with the identical windows.",
)
def shared_span_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import shared_span_pairs

    docs = documents(spark, sf_dir).select("doc_id", "text")
    quotes = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("quoted passage begins here now "),
            F.array_join(
                F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 4, 22), " "
            ),
            F.lit(" quoted passage ends here now"),
        ).alias("text"),
    )
    corpus = docs.union(quotes)
    return shared_span_pairs(
        corpus, "doc_id", "text", k=8, min_span=15, max_df=20
    ).orderBy("id_a", "id_b")


@query(
    "exact_substring_excision",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id,
               'quoted passage begins here now ' ||
               array_to_string(string_split_regex(trim(lower(text)), '\s+')[4:25], ' ') ||
               ' quoted passage ends here now' AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM corpus
    ),
    grams AS (
        SELECT doc_id,
               UNNEST(generate_series(0, len(t) - 15)) AS start,
               UNNEST(list_transform(generate_series(0, len(t) - 15),
                                     i -> array_to_string(t[i + 1 : i + 15], ' '))) AS gram
        FROM toks WHERE len(t) >= 15
    ),
    dups AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    cov AS (
        SELECT DISTINCT g.doc_id, g.start + o AS pos
        FROM grams g JOIN dups USING (gram), UNNEST(generate_series(0, 14)) AS u(o)
    ),
    pos AS (
        SELECT doc_id,
               UNNEST(t) AS tok,
               UNNEST(generate_series(0, len(t) - 1)) AS pos
        FROM toks
    ),
    kept AS (
        SELECT p.doc_id, p.pos, p.tok
        FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
        WHERE c.pos IS NULL
    ),
    reb AS (
        SELECT doc_id, COUNT(*) AS kept_n,
               string_agg(tok, ' ' ORDER BY pos) AS text_clean
        FROM kept GROUP BY doc_id
    ),
    base AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_tokens - COALESCE(r.kept_n, 0) AS BIGINT) AS n_removed,
           COALESCE(r.text_clean, '') AS text_clean
    FROM base b LEFT JOIN reb r USING (doc_id)
    WHERE b.n_tokens - COALESCE(r.kept_n, 0) > 0
    ORDER BY b.doc_id
    """,
    survey="dedup-substring-excision",
    doc="Corpus-level exact-substring REMOVAL (the ExactSubstr dedup of "
    "Lee et al. 2022, distributed-window form): every token position "
    "covered by a 15-token window occurring >=2x corpus-wide is cut from "
    "every occurrence; affected docs return (n_tokens, n_removed, "
    "text_clean). The fixture plants 'quoting' docs embedding a verbatim "
    "22-token slice of every 10th doc; the oracle re-derives the covered "
    "union and the rebuilt text from first principles.",
)
def exact_substring_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import excise_duplicate_spans

    docs = documents(spark, sf_dir).select("doc_id", "text")
    quotes = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("quoted passage begins here now "),
            F.array_join(
                F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 4, 22), " "
            ),
            F.lit(" quoted passage ends here now"),
        ).alias("text"),
    )
    corpus = docs.union(quotes)
    return (
        excise_duplicate_spans(corpus, "doc_id", "text", L=15)
        .where(F.col("n_removed") > 0)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


@query(
    "exact_substring_dedup_first",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id,
               'quoted passage begins here now ' ||
               array_to_string(string_split_regex(trim(lower(text)), '\s+')[4:25], ' ') ||
               ' quoted passage ends here now' AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM corpus
    ),
    grams AS (
        SELECT doc_id,
               UNNEST(generate_series(0, len(t) - 15)) AS start,
               UNNEST(list_transform(generate_series(0, len(t) - 15),
                                     i -> array_to_string(t[i + 1 : i + 15], ' '))) AS gram
        FROM toks WHERE len(t) >= 15
    ),
    ranked AS (
        SELECT doc_id, start,
               COUNT(*) OVER (PARTITION BY gram) AS c,
               ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, start) AS rn
        FROM grams
    ),
    cov AS (
        SELECT DISTINCT r.doc_id, r.start + o AS pos
        FROM ranked r, UNNEST(generate_series(0, 14)) AS u(o)
        WHERE r.c >= 2 AND r.rn > 1
    ),
    pos AS (
        SELECT doc_id, UNNEST(t) AS tok,
               UNNEST(generate_series(0, len(t) - 1)) AS pos
        FROM toks
    ),
    kept AS (
        SELECT p.doc_id, p.pos, p.tok
        FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
        WHERE c.pos IS NULL
    ),
    reb AS (
        SELECT doc_id, COUNT(*) AS kept_n,
               string_agg(tok, ' ' ORDER BY pos) AS text_clean
        FROM kept GROUP BY doc_id
    ),
    base AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
    SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_tokens - COALESCE(r.kept_n, 0) AS BIGINT) AS n_removed,
           COALESCE(r.text_clean, '') AS text_clean
    FROM base b LEFT JOIN reb r USING (doc_id)
    WHERE b.n_tokens - COALESCE(r.kept_n, 0) > 0
    ORDER BY b.doc_id
    """,
    survey="dedup-substring-excision-keep-first",
    doc="Keep-first ExactSubstr DEDUP (vs the remove-all redaction row): "
    "each duplicated 15-token window's canonical occurrence — min "
    "(doc_id, start), so the source doc keeps the quoted span whole — "
    "survives and only redundant copies are cut. Same planted-quote "
    "fixture as exact_substring_excision; the oracle re-derives the "
    "canonical ranking with a window over the identical grams.",
)
def exact_substring_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import excise_duplicate_spans

    docs = documents(spark, sf_dir).select("doc_id", "text")
    quotes = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("quoted passage begins here now "),
            F.array_join(
                F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 4, 22), " "
            ),
            F.lit(" quoted passage ends here now"),
        ).alias("text"),
    )
    corpus = docs.union(quotes)
    return (
        excise_duplicate_spans(corpus, "doc_id", "text", L=15, keep="first")
        .where(F.col("n_removed") > 0)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


@query(
    "decontamination_excision",
    oracle=r"""
    WITH train AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT doc_id + 200000 AS doc_id,
               'paraphrase lead in ' ||
               array_to_string(string_split_regex(trim(lower(text)), '\s+')[4:25], ' ') ||
               ' trailing commentary words' AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    btoks AS (
        SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE doc_id % 10 = 0
    ),
    bgrams AS (
        SELECT DISTINCT UNNEST(list_transform(generate_series(0, len(t) - 13),
                               i -> array_to_string(t[i + 1 : i + 13], ' '))) AS gram
        FROM btoks WHERE len(t) >= 13
    ),
    toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM train
    ),
    grams AS (
        SELECT doc_id,
               UNNEST(generate_series(0, len(t) - 13)) AS start,
               UNNEST(list_transform(generate_series(0, len(t) - 13),
                                     i -> array_to_string(t[i + 1 : i + 13], ' '))) AS gram
        FROM toks WHERE len(t) >= 13
    ),
    cov AS (
        SELECT DISTINCT g.doc_id, g.start + o AS pos
        FROM grams g JOIN bgrams USING (gram), UNNEST(generate_series(0, 12)) AS u(o)
    ),
    pos AS (
        SELECT doc_id, UNNEST(t) AS tok,
               UNNEST(generate_series(0, len(t) - 1)) AS pos
        FROM toks
    ),
    kept AS (
        SELECT p.doc_id, p.pos, p.tok
        FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
        WHERE c.pos IS NULL
    ),
    reb AS (
        SELECT doc_id, COUNT(*) AS kept_n,
               string_agg(tok, ' ' ORDER BY pos) AS text_clean
        FROM kept GROUP BY doc_id
    ),
    base AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
    SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_tokens - COALESCE(r.kept_n, 0) AS BIGINT) AS n_removed,
           COALESCE(r.text_clean, '') AS text_clean
    FROM base b LEFT JOIN reb r USING (doc_id)
    WHERE b.n_tokens - COALESCE(r.kept_n, 0) > 0
    ORDER BY b.doc_id
    """,
    survey="decontamination-excision",
    doc="Span-level test-set decontamination (GPT-3/PaLM 13-gram "
    "convention): every training-doc position covered by a 13-token "
    "window present verbatim in the benchmark split is cut — the "
    "surgical alternative to whole-doc dropping. The fixture plants "
    "'leaky' train docs embedding a 22-token slice of every benchmark "
    "doc; the oracle re-derives covered positions and rebuilt text from "
    "first principles.",
)
def decontamination_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import excise_contaminated_spans

    docs = documents(spark, sf_dir).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    leaky = bench.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(
            F.lit("paraphrase lead in "),
            F.array_join(
                F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 4, 22), " "
            ),
            F.lit(" trailing commentary words"),
        ).alias("text"),
    )
    train = docs.where(F.col("doc_id") % 10 != 0).union(leaky)
    return (
        excise_contaminated_spans(train, bench, "doc_id", "text", L=13)
        .where(F.col("n_removed") > 0)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


_R5_TOKS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> length(x) >= 1)"


@query(
    "corpus_build_pipeline",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
               UNNEST(generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')))) AS pos
        FROM documents
    ),
    bg AS (
        SELECT doc_id, tok AS w1,
               LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
    ),
    bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
    lm AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg2 GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT tok) AS vocab_v FROM toks),
    scores AS (
        SELECT b.doc_id, ROUND(AVG(-ln((l.c12 + 1.0) / (c.c1 + v.vocab_v))), 6) AS xent
        FROM bg2 b JOIN lm l ON b.w1 = l.w1 AND b.w2 = l.w2
        JOIN ctx c ON b.w1 = c.w1 CROSS JOIN v
        GROUP BY b.doc_id
    ),
    feats AS (
        SELECT doc_id, text,
               len({_R5_TOKS}) AS n_words,
               len(list_filter({_R5_TOKS}, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
               len(string_split(text, '#')) - 1
                 + len(string_split_regex(text, '\\.\\.\\.')) - 1 AS n_sym,
               list_sum(list_transform({_R5_TOKS}, x -> length(x))) AS total_chars
        FROM documents
    ),
    kept AS (
        SELECT f.doc_id, f.text, f.n_words
        FROM feats f JOIN scores s ON f.doc_id = s.doc_id
        WHERE f.n_words >= 30
          AND 10 * f.alpha_words >= 8 * f.n_words
          AND 10 * f.n_sym <= f.n_words
          AND f.total_chars >= 3 * f.n_words AND f.total_chars <= 10 * f.n_words
          AND s.xent <= 3.4
    ),
    sur AS (
        SELECT doc_id, n_words,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM kept
    ),
    ded AS (
        SELECT doc_id, n_words
        FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keep FROM sur)
        WHERE doc_id = keep
    ),
    sh AS (
        SELECT doc_id, n_words,
               substring(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM ded
    )
    SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM sh GROUP BY shard ORDER BY shard
    """,
    survey="pipeline-corpus-build-r5",
    doc="End-to-end corpus build composing the round-5 stages: Gopher "
    "ratio rules (integer-exact) + bigram-LM cross-entropy threshold "
    "(perplexity filter) -> exact dedup (min-id survivor per "
    "fingerprint) -> deterministic md5 shuffle -> per-shard doc/token "
    "mass. Every stage's mirror is the same one its standalone gate row "
    "uses, chained into one oracle — proving the operators compose "
    "without semantic drift.",
)
def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import dedup_exact
    from ariadne_dbt_spark.operators.lm import lm_cross_entropy
    from ariadne_dbt_spark.operators.sampling import deterministic_shuffle
    from ariadne_dbt_spark.operators.text import gopher_quality_flags

    docs = documents(spark, sf_dir).select("doc_id", "text")
    g = gopher_quality_flags(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"),
        "n_words",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_alpha_words",
    )
    scores = lm_cross_entropy(docs, "doc_id", "text").select("doc_id", "xent")
    kept = (
        docs.join(g, "doc_id")
        .join(scores, "doc_id")
        .where(
            (F.col("n_words") >= 30)
            & F.col("r_alpha_words")
            & F.col("r_symbol_ratio")
            & F.col("r_mean_word_len")
            & (F.col("xent") <= 3.4)
        )
        .select("doc_id", "text", "n_words")
    )
    ded = dedup_exact(kept, "doc_id", "text").select("doc_id", "n_words")
    sh = deterministic_shuffle(ded, "doc_id", seed=11)
    return (
        sh.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
        .orderBy("shard")
    )


# Record-linkage-style fuzzy matching on a short field: Levenshtein with
# last-token blocking + length prefilter over part names. Aggregated per
# block so the output is small and stable at any SF.
@query(
    "editdist_name_pairs",
    oracle="""
    WITH side AS (
        SELECT p_partkey AS id, p_name AS name,
               string_split(p_name, ' ')[-1] AS block
        FROM part
    ),
    pairs AS (
        SELECT a.block, levenshtein(a.name, c.name) AS dist
        FROM side a JOIN side c ON a.block = c.block AND a.id < c.id
        WHERE abs(length(a.name) - length(c.name)) <= 3
    )
    SELECT block,
           COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_le3,
           CAST(MIN(dist) AS INT) AS min_dist
    FROM pairs GROUP BY block ORDER BY block
    """,
    survey="editdist-dedup",
    doc="Blocked Levenshtein near-dup over part names (record-linkage "
    "shape): equi-join on the last-token blocking key bounds candidate "
    "mass, |len diff| prunes before the O(len^2) distance, all "
    "JVM-codegen. Per-block candidate/match counts.",
)
def editdist_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import edit_distance_near_dups

    parts = spark.read.parquet(table_path(sf_dir, "part"))
    block = F.element_at(F.split(F.col("p_name"), " "), -1)
    pairs = edit_distance_near_dups(
        parts, "p_partkey", "p_name", block, max_dist=3, keep_candidates=True
    )
    # keep_candidates: every length-surviving candidate is counted; the
    # dist <= 3 match bar is applied in the rollup
    return (
        pairs.groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.when(F.col("dist") <= 3, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_pairs_le3"),
            F.min("dist").cast("int").alias("min_dist"),
        )
        .orderBy("block")
    )


# Asymmetric containment: plant 30-word excerpts (id+3000000) of every
# 25th doc, then find snippet→container pairs that symmetric Jaccard
# would score ~0.3 and miss at any sane threshold.
@query(
    "containment_snippet_pairs",
    oracle=f"""
    WITH snips AS (
        SELECT doc_id + 3000000 AS doc_id,
               array_to_string(list_filter(string_split_regex(trim(text), '\\s+'),
                                           t -> t <> '')[10:39], ' ') AS text
        FROM documents WHERE doc_id % 25 = 0
    ),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM snips
    ),
    ctoks AS ({_SHINGLE_SQL.format(src="corpus")}),
    csh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3 + 2),
                                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
            FROM ctoks)
    ),
    csz AS (SELECT doc_id, COUNT(*) AS sz FROM csh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM csh a JOIN csh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           ROUND(CAST(i.inter AS DOUBLE) / CAST(z.sz AS DOUBLE), 6) AS containment
    FROM inter i JOIN csz z ON z.doc_id = i.id_a
    WHERE CAST(i.inter AS DOUBLE) / CAST(z.sz AS DOUBLE) >= 0.9
    ORDER BY id_a, id_b
    """,
    survey="dedup-containment",
    doc="Containment (asymmetric) near-dup pairs |A∩B|/|A| >= 0.9 on "
    "3-gram shingles: planted 30-word excerpts must pair with their "
    "source doc (containment 1.0) even though their symmetric Jaccard "
    "is far below any dedup threshold. Postings-join shape; denominator "
    "is the contained side only.",
)
def containment_snippet_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import containment_pairs

    docs = documents(spark, sf_dir)
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    snips = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(F.slice(toks, 10, 30), " ").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(snips)
    return containment_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.9
    ).orderBy("id_a", "id_b")


# Entity resolution end-to-end: blocked Levenshtein pairs -> connected
# components -> one canonical record per entity (min-id survivor's
# name) with member count. The oracle recomputes the SAME pair graph,
# then closes it with a recursive min-label CTE — so the full
# composition (matching + transitive clustering + survivor pick), not
# just the pair stage, is hash-verified.
@query(
    "entity_resolution_parts",
    oracle="""
    WITH RECURSIVE side AS (
        SELECT p_partkey AS id, p_name AS name,
               string_split(p_name, ' ')[-1] AS block
        FROM part
    ),
    p0 AS (
        SELECT a.id AS id_a, c.id AS id_b
        FROM side a JOIN side c ON a.block = c.block AND a.id < c.id
        WHERE abs(length(a.name) - length(c.name)) <= 3
          AND levenshtein(a.name, c.name) <= 3
    ),
    und AS (
        SELECT id_a AS a, id_b AS b FROM p0
        UNION
        SELECT id_b, id_a FROM p0
    ),
    walk(id, lbl) AS (
        SELECT DISTINCT a, a FROM und
        UNION
        SELECT u.b, w.lbl FROM walk w JOIN und u ON u.a = w.id
    ),
    comp AS (SELECT id, MIN(lbl) AS cluster_id FROM walk GROUP BY id)
    SELECT comp.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(pr.p_name) AS canonical_name
    FROM comp
    JOIN part pr ON pr.p_partkey = comp.cluster_id
    GROUP BY comp.cluster_id
    ORDER BY cluster_id
    """,
    survey="entity-resolution,editdist-dedup,dedup-clusters,§8.1",
    doc="Entity resolution over part names: blocked Levenshtein match "
    "(last-token block + length prefilter), min-label connected "
    "components for transitive closure, min-id survivor's record as "
    "the canonical entity. Oracle closes the identical pair graph "
    "with a recursive CTE.",
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import dedup_clusters, edit_distance_near_dups

    parts = spark.read.parquet(table_path(sf_dir, "part"))
    block = F.element_at(F.split(F.col("p_name"), " "), -1)
    pairs = edit_distance_near_dups(parts, "p_partkey", "p_name", block, max_dist=3)
    comp = dedup_clusters(pairs)
    canon = parts.select(
        F.col("p_partkey").alias("cluster_id"), F.col("p_name").alias("canonical_name")
    )
    return (
        comp.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(canon, "cluster_id")
        .select(
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("n_members").cast("long").alias("n_members"),
            "canonical_name",
        )
        .orderBy("cluster_id")
    )


# Train/test split-leakage audit: after an md5-range holdout split, how
# many TRAIN docs share >= 5 distinct 3-gram shingles with ANY test doc?
# The pre-training QA step that catches benchmark leakage the split
# itself cannot see. md5 (not xxhash64) keys the split here so the
# oracle replays the exact membership, then the decontamination mirror
# counts the same shingle hits.
@query(
    "split_leakage_audit",
    oracle=r"""
    WITH toked AS (
        SELECT doc_id,
               CAST(CONCAT('0x', substr(md5(CONCAT('split:', CAST(doc_id AS VARCHAR))), 1, 13))
                    AS BIGINT) < 450359962737049 AS is_test,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+'),
                   t -> length(t) >= 1) AS toks
        FROM documents
    ),
    shingled AS (
        SELECT DISTINCT doc_id, is_test, shingle
        FROM (SELECT doc_id, is_test,
                     unnest(list_transform(range(1, len(toks) - 3 + 2),
                                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
              FROM toked)
    ),
    testset AS (SELECT DISTINCT shingle FROM shingled WHERE is_test),
    hits AS (
        SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_hits
        FROM shingled t JOIN testset b ON t.shingle = b.shingle
        WHERE NOT t.is_test
        GROUP BY 1
    ),
    flagged AS (
        SELECT d.doc_id, COALESCE(h.n_hits, 0) >= 5 AS leaky,
               COALESCE(h.n_hits, 0) AS n_hits
        FROM (SELECT doc_id FROM toked WHERE NOT is_test) d
        LEFT JOIN hits h ON h.doc_id = d.doc_id
    )
    SELECT leaky, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_hits) AS BIGINT) AS max_hits
    FROM flagged GROUP BY leaky ORDER BY leaky
    """,
    survey="split-leakage,decontamination,§8.5",
    doc="Split-leakage audit: md5-range 10% holdout, then every train "
    "doc checked for >=5 shared 3-gram shingles with the test side "
    "(decontamination operator re-aimed at the split boundary).",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import decontamination_flags

    docs = documents(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("split"), F.col("doc_id").cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    labeled = docs.withColumn("_is_test", bucket < 450359962737049)
    train = labeled.where(~F.col("_is_test"))
    test_set = labeled.where(F.col("_is_test"))
    flags = decontamination_flags(train, test_set, "doc_id", "text", n=3, min_hits=5)
    return (
        flags.groupBy(F.col("contaminated").alias("leaky"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_hits").cast("long").alias("max_hits"),
        )
        .orderBy("leaky")
    )


def _rejection_oracle() -> str:
    from ariadne_dbt_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    quality = _QUALITY_SQL.format(stops=stops)
    bench_toks = _SHINGLE_SQL.format(
        src="(SELECT doc_id, text FROM documents WHERE doc_id % 50 = 7)"
    )
    surv_toks = _SHINGLE_SQL.format(src="surv")
    return f"""
    WITH corpus AS ({_EXACT_CORPUS_SQL}),
    scored AS ({quality}),
    passed AS (SELECT doc_id, text FROM scored WHERE quality >= 600000),
    fps AS (SELECT doc_id, text,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
            FROM passed),
    keep AS (SELECT fp, MIN(doc_id) AS keep_id FROM fps GROUP BY fp),
    surv AS (SELECT f.doc_id, f.text FROM fps f
             JOIN keep k ON f.fp = k.fp AND f.doc_id = k.keep_id),
    btoks AS ({bench_toks}),
    bsh AS (SELECT DISTINCT shingle FROM (
        SELECT unnest(list_transform(range(1, len(toks) - 3 + 2),
                      i -> array_to_string(toks[i:i+2], ' '))) AS shingle
        FROM btoks)),
    stoks AS ({surv_toks}),
    ssh AS (SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3 + 2),
                              i -> array_to_string(toks[i:i+2], ' '))) AS shingle
        FROM stoks)),
    hits AS (SELECT s.doc_id, COUNT(*) AS nh
             FROM ssh s JOIN bsh b ON s.shingle = b.shingle GROUP BY 1)
    SELECT s.doc_id,
           CASE WHEN s.quality < 600000 THEN 'quality'
                WHEN s.doc_id <> k.keep_id THEN 'exact_dup'
                WHEN COALESCE(h.nh, 0) >= 5 THEN 'contaminated'
                ELSE 'kept' END AS verdict
    FROM scored s
    LEFT JOIN fps f ON s.doc_id = f.doc_id
    LEFT JOIN keep k ON f.fp = k.fp
    LEFT JOIN hits h ON s.doc_id = h.doc_id
    ORDER BY s.doc_id
    """


# governance/debuggability: WHY was each doc dropped? First-failing-
# stage verdict per document through quality → exact-dedup →
# decontamination — the audit trail a production corpus build ships
# with its dataset card (every stage reuses its own verified mirror).
@query(
    "corpus_rejection_audit",
    oracle=_rejection_oracle(),
    survey="pipeline-composition,quality-scoring,dedup-exact,dedup-decontamination",
    doc="Per-document rejection audit over the planted-duplicate corpus: "
    "verdict in {quality, exact_dup, contaminated, kept} with first-"
    "failing-stage priority (dedup judged among quality survivors, "
    "decontamination among dedup survivors, >=5 shared 3-gram shingles "
    "vs the every-50th-doc benchmark set).",
)
def corpus_rejection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.dedup import decontamination_flags
    from ariadne_dbt_spark.operators.text import (
        fingerprint_md5,
        quality_score_millionths,
    )

    corpus = corpus_with_exact_dups(spark, sf_dir)
    scored = corpus.select(
        "doc_id", "text", quality_score_millionths("text").alias("_q")
    )
    passed = scored.where(F.col("_q") >= 600000)
    fps = passed.select("doc_id", "text", fingerprint_md5("text").alias("fp"))
    keep = fps.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    surv = (
        fps.join(keep, "fp")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text")
    )
    bench = documents(spark, sf_dir).where(F.col("doc_id") % 50 == 7).select(
        "doc_id", "text"
    )
    contam = (
        decontamination_flags(surv, bench, "doc_id", "text", n=3, min_hits=5)
        .where(F.col("contaminated"))
        .select(F.col("id").alias("doc_id"), F.lit(True).alias("_c"))
    )
    verdict = (
        F.when(F.col("_q") < 600000, F.lit("quality"))
        .when(F.col("doc_id") != F.col("keep_id"), F.lit("exact_dup"))
        .when(F.coalesce(F.col("_c"), F.lit(False)), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return (
        scored.join(fps.select("doc_id", "fp"), "doc_id", "left")
        .join(keep, "fp", "left")
        .join(contam, "doc_id", "left")
        .select("doc_id", verdict.alias("verdict"))
        .orderBy("doc_id")
    )


def _survivor_oracle() -> str:
    from ariadne_dbt_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    quality = _QUALITY_SQL.format(stops=stops)
    return f"""
    WITH RECURSIVE corpus AS ({_NEAR_CORPUS_SQL}),
    toked AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1) AS toks
        FROM corpus
    ),
    shingled AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 3 + 2),
                                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
              FROM toked)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingled GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairsq AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairsq
              UNION SELECT id_b, id_a FROM pairsq),
    reach(id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT re.id, e.b FROM reach re JOIN edges e ON re.r = e.a
    ),
    clus AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    scored AS ({quality}),
    memb AS (SELECT c.cluster_id, c.doc_id, s.quality
             FROM clus c JOIN scored s ON c.doc_id = s.doc_id),
    surv AS (SELECT cluster_id, doc_id AS survivor_id, quality AS survivor_q,
                    ROW_NUMBER() OVER (PARTITION BY cluster_id
                                       ORDER BY quality DESC, doc_id) AS rn
             FROM memb),
    cnt AS (SELECT cluster_id, COUNT(*) AS n_members FROM memb GROUP BY 1)
    SELECT s.cluster_id, s.survivor_id, s.survivor_q, c.n_members
    FROM surv s JOIN cnt c ON s.cluster_id = c.cluster_id
    WHERE s.rn = 1 ORDER BY s.cluster_id
    """


# the collapse step a REAL dedup pipeline runs after clustering: keep
# the best-QUALITY member of each near-dup cluster (min-id is the
# deterministic fallback, but quality survivorship is what corpus
# builds actually want). Oracle re-derives pairs exactly, closes them
# transitively with a recursive CTE, and argmaxes the quality mirror.
@query(
    "near_dup_quality_survivors",
    oracle=_survivor_oracle(),
    survey="dedup-clusters,quality-scoring,A12",
    doc="Quality survivorship per near-dup cluster: exact Jaccard pairs "
    "-> connected components -> keep the highest-quality member "
    "(ties to lowest id); cluster ids, survivors, sizes all "
    "SQL-verified via recursive transitive closure.",
)
def near_dup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ariadne_dbt_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs
    from ariadne_dbt_spark.operators.text import quality_score_millionths

    corpus = corpus_with_near_dups(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8)
    # cache-release without a driver collect (see ngram_jaccard_near_dups)
    pairs_ck = pairs.localCheckpoint(eager=True)
    pairs.unpersist()
    clusters = dedup_clusters(pairs_ck)
    q = corpus.select("doc_id", quality_score_millionths("text").alias("quality"))
    memb = clusters.join(q, clusters.id == q.doc_id).select(
        "cluster_id", "doc_id", "quality"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), "doc_id")
    surv = (
        memb.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_id"),
            F.col("quality").alias("survivor_q"),
        )
    )
    cnt = memb.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    return surv.join(cnt, "cluster_id").orderBy("cluster_id")


_FORGOTTEN_ORACLE = _INCREMENTAL_ORACLE.replace(
    "WITH existing AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),",
    "WITH existing AS (SELECT doc_id, text FROM documents\n"
    "                  WHERE doc_id % 2 = 0 AND doc_id % 10 <> 0),",
)


# governance in the hard gate: after forgetting every 10th doc from the
# persisted index, incremental dedup must behave EXACTLY as if those
# docs had never been indexed — the clone batch (mutations of %20 docs,
# all forgotten) flips to non-duplicate. Same flags contract as the
# other two incremental rows, oracle over the post-erasure corpus.
@query(
    "incremental_dedup_forgotten",
    oracle=_FORGOTTEN_ORACLE,
    survey="dedup-incremental-index,E5",
    doc="Right-to-be-forgotten through the serving path: every 10th doc "
    "tombstoned out of the persisted shingle index "
    "(delete_from_shingle_index); the batch's clones of forgotten docs "
    "must come back non-duplicate, byte-identical to an index that "
    "never held them.",
)
def incremental_dedup_forgotten(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        delete_from_shingle_index,
        incremental_near_dup_flags,
    )

    existing, batch = _incremental_split(spark, sf_dir)
    # fresh pid-keyed dir: this workload MUTATES the index (tombstones),
    # so it must not share the read-only siblings' cached build
    index_dir = os.path.join(
        tempfile.gettempdir(), f"ariadne_shingle_forget_{os.getpid()}"
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    build_shingle_index(existing, index_dir, "doc_id", "text", n=3)
    forgotten = existing.where(F.col("doc_id") % 10 == 0).select("doc_id")
    delete_from_shingle_index(spark, index_dir, forgotten)
    return incremental_near_dup_flags(
        None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=index_dir
    ).orderBy("id")


@query(
    "bloom_decontamination_check",
    oracle=r"""
    WITH toked AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+'),
                   t -> length(t) >= 1) AS toks
        FROM documents
    ),
    shingled AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 3 + 2),
                                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
              FROM toked)
    ),
    bench AS (SELECT DISTINCT shingle FROM shingled WHERE doc_id % 10 = 0),
    train AS (SELECT * FROM shingled WHERE doc_id % 10 <> 0),
    hits AS (
        SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_hits
        FROM train t JOIN bench b ON t.shingle = b.shingle
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) >= 3 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    survey="decontamination,bloom-filter-pruning",
    doc="BFF-style Bloom-pruned decontamination: benchmark 3-gram "
    "shingles -> broadcast Bloom bitmap (fpp 1e-3) -> MAP-ONLY corpus "
    "probe -> exact verify join over the candidate sliver. Same flags "
    "contract as decontamination_check (the oracle is join-based and "
    "knows nothing of the Bloom filter — false positives must die in "
    "the verify join for this row to hash-match), different physical "
    "route: the shuffle into the verify join is candidate-sized, not "
    "corpus-sized.",
)
def bloom_decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.bloom import bloom_decontaminate

    docs = documents(spark, sf_dir).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    return bloom_decontaminate(
        train, bench, "doc_id", "text", n=3, min_hits=3, fpp=0.001
    ).select(F.col("id").alias("doc_id"), "n_hits", "contaminated")


@query(
    "decontamination_index_check",
    oracle=r"""
    WITH toked AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+'),
                   t -> length(t) >= 1) AS toks
        FROM documents
    ),
    shingled AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 3 + 2),
                                           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
              FROM toked)
    ),
    bench AS (SELECT DISTINCT shingle FROM shingled WHERE doc_id % 10 = 0),
    train AS (SELECT * FROM shingled WHERE doc_id % 10 <> 0),
    hits AS (
        SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_hits
        FROM train t JOIN bench b ON t.shingle = b.shingle
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) >= 2 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    survey="decontamination,bloom-filter-pruning,persisted-index",
    doc="Decontamination against a PERSISTED benchmark artifact "
    "(build_decontamination_index: distinct bench shingles parquet + "
    "sized Bloom bitmap, built once per eval-suite release): each "
    "training batch pays a map-only bitmap probe loaded from disk + a "
    "candidate-sized verify join against the stored shingles — the "
    "benchmark is never re-shingled. Same join-based oracle as the "
    "one-shot bloom row (min_hits=2 here): the persisted route must "
    "hash-match it value-for-value.",
)
def decontamination_index_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ariadne_dbt_spark.operators.bloom import (
        build_decontamination_index,
        decontaminate_against_index,
    )

    docs = documents(spark, sf_dir).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    tag = os.path.basename(os.path.normpath(sf_dir))
    index_dir = os.path.join(
        tempfile.gettempdir(), f"ariadne_decon_idx_{tag}_{os.getpid()}"
    )
    build_decontamination_index(
        bench, index_dir, "doc_id", "text", n=3, fpp=0.001
    )
    return decontaminate_against_index(
        train, index_dir, "doc_id", "text", min_hits=2
    ).select(F.col("id").alias("doc_id"), "n_hits", "contaminated")
