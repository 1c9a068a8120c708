"""Stream-stream attribution join: cross-micro-batch matching (join
state), inclusive window bounds, and arrival-order independence. Files
are written one row each with maxFilesPerTrigger=1, so every match here
crosses a micro-batch boundary through buffered state."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest


@pytest.fixture()
def events_dir(spark, tmp_path):
    base = pd.Timestamp("2026-01-05 10:00:00")

    def ev(eid, ts_off, user, etype):
        return {
            "event_id": eid,
            "ts": base + pd.Timedelta(seconds=ts_off),
            "user_id": user,
            "event_type": etype,
            "value": 1.0,
            "props": "{}",
        }

    rows = [
        ev(1, 0, 1, "click"),
        ev(2, 100, 1, "purchase"),  # in-window match (gap 100)
        ev(3, 0, 2, "click"),
        ev(4, 3600, 2, "purchase"),  # exactly on the inclusive bound
        ev(5, 0, 3, "click"),
        ev(6, 3601, 3, "purchase"),  # 1s past the bound -> no match
        ev(7, 500, 4, "purchase"),  # purchase BEFORE any click -> no match
        ev(8, 600, 4, "click"),
    ]
    out = str(tmp_path / "events_stream")
    os.makedirs(out, exist_ok=True)
    # one file per row -> one micro-batch per row with maxFilesPerTrigger=1
    for i, r in enumerate(rows):
        spark.createDataFrame(
            pd.DataFrame([r]),
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{out}/f{i:02d}")
    # flatten: move part files up so the dir is one flat file-stream source
    flat = str(tmp_path / "flat")
    os.makedirs(flat, exist_ok=True)
    k = 0
    for i in range(len(rows)):
        d = f"{out}/f{i:02d}"
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(d, f), os.path.join(flat, f"part{k:02d}.parquet"))
                k += 1
    return flat


def test_cross_batch_matching_and_bounds(spark, events_dir):
    from ariadne_dbt_spark.streaming.join_stream import run_join_stream_once

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    pairs = run_join_stream_once(
        spark, events_dir, query_name="t_join_pairs"
    ).collect()
    got = {(r["user_id"], r["click_id"], r["purchase_id"], r["gap_seconds"]) for r in pairs}
    assert got == {
        (1, 1, 2, 100),  # matched across micro-batches
        (2, 3, 4, 3600),  # inclusive upper bound
    }


def test_matches_batch_join_oracle(spark, events_dir):
    """Arrival-order independence: the streaming result equals the plain
    batch join over the same files."""
    from pyspark.sql import functions as F

    from ariadne_dbt_spark.streaming.join_stream import run_join_stream_once

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    stream_pairs = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in run_join_stream_once(spark, events_dir, query_name="t_join_oracle").collect()
    }
    ev = spark.read.parquet(events_dir)
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    batch = c.join(
        p,
        (F.col("u") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 3600 SECONDS")),
    )
    batch_pairs = {(r["u"], r["cid"], r["pid"]) for r in batch.collect()}
    assert stream_pairs == batch_pairs
