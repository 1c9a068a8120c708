"""Stateful streaming sessionization (applyInPandasWithState) vs the
batch gap-split twin.

Timeline (gap = 30 min, watermark = 1 s):

* batch 1 — user 1: t0, t0+5m (one open session); user 2: t0, t0+40m
  (gap closes [t0, t0] immediately, opens a tail at t0+40m).
* batch 2 — user 3: t0+3h. The watermark after batch 1 sits at
  t0+40m-1s, past user 1's timeout (last + gap = t0+35m), so user 1's
  tail closes via EventTimeTimeout during batch 2. The batch-2 data
  advances the watermark to t0+3h-1s, and Spark runs a no-data timeout
  batch that closes user 2's tail (timeout t0+70m) as well; only user
  3's tail (timeout t0+3h30m) stays open in the state store.
"""

from __future__ import annotations

import datetime as dt

import pytest


T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _write(spark, rows, path):
    spark.createDataFrame(
        [(i, ts, uid, "click", 1.0, "{}") for i, (uid, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def closed_sessions(spark, tmp_path):
    from ariadne_dbt_spark.streaming.sessionize import sessionize_stream

    events_dir = str(tmp_path / "events")
    m = dt.timedelta(minutes=1)
    # the file source requires the path to exist at stream start
    _write(
        spark,
        [(1, T0), (1, T0 + 5 * m), (2, T0), (2, T0 + 40 * m)],
        events_dir,
    )
    out = sessionize_stream(spark, events_dir, gap_sec=1800, watermark="1 second")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, [(3, T0 + 180 * m)], events_dir)
        q.processAllAvailable()
        yield spark.sql("SELECT * FROM t_sessions ORDER BY user_id")
    finally:
        q.stop()


def test_gap_split_and_timeout_close(closed_sessions):
    rows = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed_sessions.collect()
    ]
    m = dt.timedelta(minutes=1)
    assert rows == [
        # user 1: closed by event-time timeout once the watermark passed
        (1, T0, T0 + 5 * m, 2),
        # user 2, session 1: closed in-batch by the 40-minute gap
        (2, T0, T0, 1),
        # user 2, tail: the watermark jump to t0+3h triggers a no-data
        # timeout batch that closes it too
        (2, T0 + 40 * m, T0 + 40 * m, 1),
    ]


def test_batch_twin_agrees(closed_sessions, spark, tmp_path):
    """Closed streaming sessions must be a prefix of the batch gap-split
    (the batch twin also sees the still-open tails)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    ev = spark.read.parquet(str(tmp_path / "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double") > 1800.0),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_session").over(w))
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in flagged.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
        )
        .collect()
    }
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed_sessions.collect()
    }
    assert streamed <= batch
    # only user 3's tail (still ahead of the watermark) remains open
    assert {u for u, *_ in batch - streamed} == {3}
