"""Streaming statistics store (streaming/stats_stream.py).

Contracts under test:

* A REAL multi-micro-batch stream's merged stats equal the one-shot
  batch sketch computation over the full data (HLL union losslessness,
  end to end through the store).
* Re-running the stream on the same checkpoint appends nothing.
* A simulated crash-replay (the same batch appended twice) changes no
  answer — the read side dedups by (group, _batch).
* Auto-fold fires past the file-count threshold, collapses the table
  to ~one row per group via an epoch flip, and changes no answer.
* fold_sketch_stats honors max_batch_exclusive: the excluded batch's
  rows pass through unfolded, so a replay after a fold still dedups
  instead of double-counting.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.epoch_store import read_epoch
from ariadne_dbt_spark.operators.sketches import hll_rollup, hll_sketch_table
from ariadne_dbt_spark.streaming.stats_stream import (
    fold_sketch_stats,
    read_sketch_stats,
    sketch_stats_ingest_stream,
)

GROUPS = ["event_type", "day"]


def _events_df(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60)
        ).alias("ts"),
        (F.col("id") % 223).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )


def _expected(spark, ev):
    src = ev.select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    return {
        tuple(r[c] for c in GROUPS): (r["n_rows"], r["n_distinct_est"])
        for r in hll_rollup(hll_sketch_table(src, GROUPS, "user_id"), GROUPS).collect()
    }


def _got(spark, tdir):
    return {
        tuple(r[c] for c in GROUPS): (r["n_rows"], r["n_distinct_est"])
        for r in read_sketch_stats(spark, tdir, GROUPS).collect()
    }


def test_stream_equals_batch_and_checkpoint_idempotent(spark, tmp_path):
    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    ev = _events_df(spark)
    src = str(tmp_path / "src")
    tdir = str(tmp_path / "stats")
    ev.repartition(3).write.parquet(src)

    n1 = sketch_stats_ingest_stream(spark, src, tdir, auto_fold=False)
    assert n1 == 3
    got = _got(spark, tdir)
    assert got == _expected(spark, ev)

    # same checkpoint, no new files -> nothing applied, stats unchanged
    n2 = sketch_stats_ingest_stream(spark, src, tdir, auto_fold=False)
    assert n2 == 0
    assert _got(spark, tdir) == got


def test_replayed_batch_append_changes_nothing(spark, tmp_path):
    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    ev = _events_df(spark, n=1200)
    src = str(tmp_path / "src")
    tdir = str(tmp_path / "stats")
    # single source file -> exactly one micro-batch (_batch=0), so the
    # simulated replay below re-appends IDENTICAL batch content
    ev.coalesce(1).write.parquet(src)
    sketch_stats_ingest_stream(spark, src, tdir, auto_fold=False)
    before = _got(spark, tdir)

    # simulate an at-least-once replay: re-append batch 0's rows
    from ariadne_dbt_spark.streaming.stats_stream import _live_dir

    batch = ev.select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    rows = hll_sketch_table(batch, GROUPS, "user_id").withColumn(
        "_batch", F.lit(0).cast("long")
    )
    rows.coalesce(1).write.mode("append").parquet(_live_dir(tdir))
    assert _got(spark, tdir) == before


def test_auto_fold_fires_and_preserves_answers(spark, tmp_path):
    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    ev = _events_df(spark)
    src = str(tmp_path / "src")
    tdir = str(tmp_path / "stats")
    ev.repartition(6).write.parquet(src)

    sketch_stats_ingest_stream(spark, src, tdir, fold_max_files=3)
    assert read_epoch(tdir) >= 1  # at least one fold committed
    got = _got(spark, tdir)
    assert got == _expected(spark, ev)


def test_fold_excludes_in_flight_batch_then_replay_dedups(spark, tmp_path):
    ev = _events_df(spark, n=900)
    tdir = str(tmp_path / "stats")
    from ariadne_dbt_spark.streaming.stats_stream import _live_dir

    batchify = ev.select("event_type", F.to_date("ts").alias("day"), "user_id")
    for b in (0, 1, 2):
        part = batchify.where(F.col("user_id") % 3 == b)
        hll_sketch_table(part, GROUPS, "user_id").withColumn(
            "_batch", F.lit(b).cast("long")
        ).coalesce(1).write.mode("append").parquet(_live_dir(tdir))
    before = _got(spark, tdir)

    # fold as if batch 2 were still in flight, then replay batch 2
    fold_sketch_stats(spark, tdir, GROUPS, max_batch_exclusive=2)
    assert read_epoch(tdir) == 1
    part2 = batchify.where(F.col("user_id") % 3 == 2)
    hll_sketch_table(part2, GROUPS, "user_id").withColumn(
        "_batch", F.lit(2).cast("long")
    ).coalesce(1).write.mode("append").parquet(_live_dir(tdir))
    after = _got(spark, tdir)
    assert {k: v[0] for k, v in after.items()} == {
        k: v[0] for k, v in before.items()
    }  # exact n_rows identical — replay did not double-count
