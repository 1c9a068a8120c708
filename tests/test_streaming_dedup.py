"""Streaming exact-dedup invariants: one survivor per fingerprint over a
REAL stream (memory sink), clone injection on/off, and the event-time
shift that keeps the first cohort above the initial watermark."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sdocs")
    rows = [
        (i, f"doc body number {i}", "en", "web", 20) for i in range(40)
    ] + [(100, "doc body number 0", "en", "web", 20)]  # natural dup of doc 0
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    # a written table is a DIRECTORY of part files; stream it directly
    # (pathGlobFilter matches leaf file names, so the sf_dir-style glob
    # would see nothing here)
    return str(d / "documents.parquet")


def test_stream_dedup_one_survivor_per_fp(spark, docs_dir):
    from ariadne_dbt_spark.streaming.dedup_stream import run_dedup_stream_once

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    kept = run_dedup_stream_once(
        spark, docs_dir, path_glob=None, query_name="t_sdedup"
    ).collect()
    fps = [r.fingerprint for r in kept]
    # 41 input + 5 injected clones (doc_id % 10 == 0) = 46 rows,
    # 40 distinct texts -> exactly one survivor each, zero-ts cohort included
    assert len(fps) == 40
    assert len(set(fps)) == 40


def test_stream_dedup_no_clone_injection(spark, docs_dir):
    from ariadne_dbt_spark.streaming.dedup_stream import (
        dedup_docs_stream,
    )

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    out = dedup_docs_stream(spark, docs_dir, path_glob=None, clone_every=0)
    q = out.writeStream.outputMode("append").format("memory").queryName("t_sdedup2").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    kept = spark.sql("SELECT * FROM t_sdedup2").collect()
    assert len(kept) == 40  # only the natural dup collapses
