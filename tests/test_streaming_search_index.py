"""Streaming FTS maintenance (streaming/search_stream.py): per-batch
upserts equal a batch rebuild; checkpoint bookkeeping is exactly-once."""

from __future__ import annotations

import os

from ariadne_dbt_spark.operators.search import bm25
from ariadne_dbt_spark.operators.search_index import (
    build_search_index,
    read_search_index,
)
from ariadne_dbt_spark.streaming.search_stream import search_index_ingest_stream

ROWS = [(i, f"spark stream doc{i} " + "join " * (i % 4)) for i in range(24)]


def _ranked(spark, idx):
    postings, docstats, n_docs, avgdl = read_search_index(spark, idx)
    return [
        (r["unique_id"], round(r["bm25_score"], 9))
        for r in bm25(
            postings, docstats, n_docs, "spark join",
            field_weights={"text": 1.0}, avgdl_by_field=avgdl,
        ).collect()
    ], n_docs


def test_streamed_index_equals_batch_build(spark, tmp_path):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)

    idx = str(tmp_path / "idx")
    n_batches = search_index_ingest_stream(spark, src, idx)
    assert n_batches >= 2  # genuinely multi-batch

    ref = str(tmp_path / "ref")
    build_search_index(docs, "doc_id", {"text": "text"}, ref)
    got, n_docs = _ranked(spark, idx)
    want, n_ref = _ranked(spark, ref)
    assert n_docs == n_ref == 24
    assert got == want


def test_rerun_with_checkpoint_is_idempotent(spark, tmp_path):
    docs = spark.createDataFrame(ROWS[:8], "doc_id long, text string")
    src = str(tmp_path / "src")
    docs.repartition(2).write.parquet(src)
    idx = str(tmp_path / "idx")
    search_index_ingest_stream(spark, src, idx)
    first, n1 = _ranked(spark, idx)
    # same source, same checkpoint: committed files must be skipped
    n_batches = search_index_ingest_stream(spark, src, idx)
    assert n_batches == 0
    again, n2 = _ranked(spark, idx)
    assert first == again and n1 == n2 == 8
    # a NEW file is picked up incrementally
    more = spark.createDataFrame(
        [(100, "spark join fresh"), (101, "stream only")], "doc_id long, text string"
    )
    more.coalesce(1).write.mode("append").parquet(src)
    assert search_index_ingest_stream(spark, src, idx) >= 1
    _, n3 = _ranked(spark, idx)
    assert n3 == 10
