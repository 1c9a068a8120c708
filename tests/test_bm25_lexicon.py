"""Round-11 bm25 index internals: the persisted lexicon (per-term
df/ttf) must score identically to the per-query df aggregation it
replaces, and the footer-based corpus count must survive multi-file
parquet directories (the normal layout at any real scale)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _corpus(spark):
    rows = [
        (1, "spark stream spark table"),
        (2, "vector stream window"),
        (3, "spark vector vector join"),
        (4, "table window sort"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lexicon_dfreq_scores_identical_to_fallback(spark):
    from ariadne_dbt_spark.operators.search import bm25, build_postings

    docs = _corpus(spark)
    postings, docstats = build_postings(docs, "doc_id", {"text": "text"})
    # the lexicon a build persists: COUNT per (field, term) == df because
    # postings are unique per (unique_id, field, term) by construction
    lexicon = postings.groupBy("field", "term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
    )
    kwargs = dict(field_weights={"text": 1.0})
    base = bm25(postings, docstats, 4, "spark vector stream", **kwargs)
    via_lex = bm25(
        postings, docstats, 4, "spark vector stream", dfreq=lexicon, **kwargs
    )
    a = sorted((r.unique_id, round(r.bm25_score, 10)) for r in base.collect())
    b = sorted((r.unique_id, round(r.bm25_score, 10)) for r in via_lex.collect())
    # docs 1-3 match at least one query term; doc 4 matches none
    assert a == b and len(a) == 3


def test_lexicon_df_equals_distinct_doc_count(spark):
    """COUNT(*) per (field, term) over postings == COUNT(DISTINCT doc):
    the uniqueness contract the lexicon (and the fallback's plain COUNT)
    rely on."""
    from ariadne_dbt_spark.operators.search import build_postings

    postings, _ = build_postings(_corpus(spark), "doc_id", {"text": "text"})
    bad = (
        postings.groupBy("field", "term")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.countDistinct("unique_id").alias("d"),
        )
        .where(F.col("c") != F.col("d"))
        .count()
    )
    assert bad == 0


def test_parquet_num_rows_multi_file_dir(spark, tmp_path):
    """VERDICT r10 item 5: a multi-file documents directory must not
    break the footer-based corpus count (old code called
    pq.ParquetFile on the directory path and threw)."""
    from ariadne_dbt_spark.workloads.text_search import _parquet_num_rows

    out = str(tmp_path / "documents.parquet")
    spark.range(0, 97).select(
        F.col("id").alias("doc_id"), F.lit("spark stream").alias("text")
    ).repartition(4).write.parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) > 1, "fixture must be multi-file to exercise the path"
    assert _parquet_num_rows(out) == 97
    # single-file path still works
    single = os.path.join(out, files[0])
    import pyarrow.parquet as pq

    assert _parquet_num_rows(single) == pq.ParquetFile(single).metadata.num_rows


def test_built_index_lexicon_matches_postings(spark, tmp_path, monkeypatch):
    """build_bm25_index persists a lexicon consistent with its own
    postings (df = posting count, ttf = Σtf per (field, term))."""
    import ariadne_dbt_spark.workloads.text_search as ts

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    _corpus(spark).write.parquet(os.path.join(sf_dir, "documents.parquet"))
    monkeypatch.setattr(ts, "_REPO", str(tmp_path))
    out = ts.build_bm25_index(spark, sf_dir, force=True)
    postings = spark.read.parquet(os.path.join(out, "postings"))
    lexicon = spark.read.parquet(os.path.join(out, "lexicon"))
    expected = postings.groupBy("field", "term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
    )
    diff = lexicon.exceptAll(expected).count() + expected.exceptAll(lexicon).count()
    assert diff == 0
    # multi-file n_docs: 4 docs regardless of file count
    import json

    with open(os.path.join(out, "_BUILT")) as f:
        meta = json.load(f)
    assert meta["n_docs"] == 4


def test_index_build_avgdl_identical_without_observe(spark, tmp_path, monkeypatch):
    """The speculation fallback (dedicated avgdl aggregate instead of
    the write-riding observation) must produce the identical _BUILT
    metadata."""
    import json
    import shutil

    from ariadne_dbt_spark.workloads import text_search as tsw

    def build(sf_dir):
        out = tsw.build_bm25_index(spark, sf_dir, force=True)
        with open(os.path.join(out, "_BUILT")) as f:
            return json.load(f)

    sf_dir = "/root/testdata/sf0.001"
    with_obs = build(sf_dir)
    from ariadne_dbt_spark.operators import table_store as ts

    monkeypatch.setattr(ts, "_counts_via_observe", lambda _s: False)
    without_obs = build(sf_dir)
    assert with_obs == without_obs
    assert with_obs["avgdl"]  # non-trivial metadata
