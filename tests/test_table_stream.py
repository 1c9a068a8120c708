"""Streaming upsert into a managed table
(streaming/table_stream.py + merge_table's when_matched_condition).

Contracts under test:

* conditional merge: a guarded update applies only to winning pairs,
  losers keep the target row, inserts are unaffected by the guard;
* a REAL multi-micro-batch AvailableNow stream upserts per batch and
  converges to batch latest-per-key over the whole source;
* replaying the LAST batch (at-least-once recovery) leaves the table
  bit-identical — exactly-once by idempotence;
* replaying an OLD batch after newer data cannot revert newer rows
  (the monotonic guard), where an unconditional upsert would;
* the lexicographic guard orders correctly on the tiebreak column.
"""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from ariadne_dbt_spark.operators.table_store import (
    merge_table,
    read_table,
    write_table,
)
from ariadne_dbt_spark.streaming.table_stream import (
    latest_per_key,
    table_upsert_stream,
    upsert_batch,
)

SCHEMA = "user_id long, seq long, tie long, state string"


def _state(spark, tdir):
    return {
        r["user_id"]: (r["seq"], r["tie"], r["state"])
        for r in read_table(spark, tdir).collect()
    }


def test_conditional_merge_guards_matched_updates(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    write_table(
        spark,
        spark.createDataFrame(
            [Row(k=1, v=10, s="old1"), Row(k=2, v=20, s="old2")]
        ),
        tdir,
    )
    src = spark.createDataFrame(
        [
            Row(k=1, v=99, s="newer"),   # wins: s.v > t.v
            Row(k=2, v=5, s="stale"),    # loses: s.v < t.v
            Row(k=3, v=1, s="insert"),   # unmatched: inserted regardless
        ]
    )
    rep = merge_table(
        spark, tdir, src, ["k"], when_matched_condition="s.v >= t.v"
    )
    assert rep["rows_updated"] == 1
    assert rep["rows_inserted"] == 1
    out = {r["k"]: (r["v"], r["s"]) for r in read_table(spark, tdir).collect()}
    assert out == {1: (99, "newer"), 2: (20, "old2"), 3: (1, "insert")}


def test_latest_per_key_is_deterministic_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            Row(user_id=1, seq=5, tie=1, state="a"),
            Row(user_id=1, seq=5, tie=2, state="b"),  # same seq, higher tie
            Row(user_id=1, seq=4, tie=9, state="c"),
        ]
    )
    got = latest_per_key(df, ["user_id"], ["seq", "tie"]).collect()
    assert len(got) == 1 and got[0]["state"] == "b"


def _batches():
    # three batches; user 1 updated in every batch, user 2 in two,
    # user 3 appears once
    b1 = [Row(user_id=1, seq=1, tie=0, state="u1b1"), Row(user_id=2, seq=1, tie=0, state="u2b1")]
    b2 = [Row(user_id=1, seq=2, tie=0, state="u1b2"), Row(user_id=3, seq=2, tie=0, state="u3b2")]
    b3 = [Row(user_id=1, seq=3, tie=0, state="u1b3"), Row(user_id=2, seq=3, tie=0, state="u2b3")]
    return b1, b2, b3


def test_stream_upserts_per_batch_and_replay_is_idempotent(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    tdir = str(tmp_path / "tbl")
    os.makedirs(src_dir)
    b1, b2, b3 = _batches()
    for i, rows in enumerate((b1, b2, b3)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)

    # seed the table empty-shaped (first stream batch creates rows)
    write_table(spark, spark.createDataFrame([], SCHEMA), tdir)
    n = table_upsert_stream(
        spark, src_dir, tdir, ["user_id"], ["seq", "tie"], schema=SCHEMA
    )
    assert n >= 1  # AvailableNow may coalesce files into fewer triggers

    expect = {1: (3, 0, "u1b3"), 2: (3, 0, "u2b3"), 3: (2, 0, "u3b2")}
    assert _state(spark, tdir) == expect

    # at-least-once recovery: replay the LAST batch → unchanged
    upsert_batch(spark, tdir, spark.createDataFrame(b3, SCHEMA), ["user_id"], ["seq", "tie"])
    assert _state(spark, tdir) == expect

    # late replay of an OLD batch: the guard refuses the stale rows
    upsert_batch(spark, tdir, spark.createDataFrame(b1, SCHEMA), ["user_id"], ["seq", "tie"])
    assert _state(spark, tdir) == expect

    # ...whereas an unconditional merge would have reverted user 1/2 —
    # pin the discriminating behavior so the guard's value is visible
    merge_table(
        spark,
        tdir,
        latest_per_key(spark.createDataFrame(b1, SCHEMA), ["user_id"], ["seq", "tie"]),
        ["user_id"],
    )
    assert _state(spark, tdir)[1] == (1, 0, "u1b1")


def test_guard_tiebreak_column_orders_lexicographically(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    write_table(
        spark,
        spark.createDataFrame([Row(user_id=1, seq=5, tie=3, state="cur")], SCHEMA),
        tdir,
    )
    # same seq, LOWER tie → loses
    upsert_batch(
        spark,
        tdir,
        spark.createDataFrame([Row(user_id=1, seq=5, tie=2, state="stale")], SCHEMA),
        ["user_id"],
        ["seq", "tie"],
    )
    assert _state(spark, tdir)[1] == (5, 3, "cur")
    # same seq, HIGHER tie → wins
    upsert_batch(
        spark,
        tdir,
        spark.createDataFrame([Row(user_id=1, seq=5, tie=9, state="newer")], SCHEMA),
        ["user_id"],
        ["seq", "tie"],
    )
    assert _state(spark, tdir)[1] == (5, 9, "newer")


def test_stream_auto_optimize_bounds_file_growth(spark, tmp_path):
    """A long-running upsert stream accretes small files (each merge's
    epoch flip writes batch-sized outputs); with ``auto_optimize`` the
    stream folds its own table when ``table_report`` fires, clustered
    on the merge key, and the merged STATE is unchanged (round 10 —
    the table twin of the index streams' auto_compact)."""
    from ariadne_dbt_spark.operators.epoch_store import _walk_parquet
    from ariadne_dbt_spark.operators.table_store import _resolve, table_report

    src_dir = str(tmp_path / "src")
    tdir = str(tmp_path / "tbl")
    os.makedirs(src_dir)
    # 8 single-file batches of 20 users each, rotating states
    for b in range(8):
        rows = [
            Row(user_id=u, seq=b, tie=0, state=f"u{u}b{b}")
            for u in range(b, b + 20)
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)

    write_table(spark, spark.createDataFrame([], SCHEMA), tdir)
    n = table_upsert_stream(
        spark, src_dir, tdir, ["user_id"], ["seq", "tie"],
        schema=SCHEMA, max_files_per_trigger=1,
        auto_optimize=True, optimize_max_files=6,
    )
    assert n >= 4

    rep = table_report(tdir, max_files=6)
    assert rep["n_files"] < 6 * 2, f"auto-optimize never fired: {rep}"

    # state identical to the no-optimize run over the same source
    tdir2 = str(tmp_path / "tbl2")
    write_table(spark, spark.createDataFrame([], SCHEMA), tdir2)
    table_upsert_stream(
        spark, src_dir, tdir2, ["user_id"], ["seq", "tie"],
        schema=SCHEMA, max_files_per_trigger=1, auto_optimize=False,
    )
    assert _state(spark, tdir) == _state(spark, tdir2)
    assert table_report(tdir2, max_files=6)["n_files"] > rep["n_files"], (
        "control stream should have accreted more files than the "
        "auto-optimized one"
    )


def test_stream_follow_views_stay_in_sync(spark, tmp_path):
    """stream → table → aggregate, incremental end to end: a view
    registered via ``follow_views`` is refreshed after every stream
    commit (merges AND the auto-optimize), so at stream end it equals a
    from-scratch rebuild — at retention 0, proving each refresh folded
    only current-epoch change logs."""
    from ariadne_dbt_spark.operators.incremental_view import (
        build_agg_view,
        view_status,
    )
    from ariadne_dbt_spark.operators.table_store import (
        enable_change_feed,
        read_table,
    )

    src_dir = str(tmp_path / "src")
    tdir = str(tmp_path / "tbl")
    vdir = str(tmp_path / "view")
    os.makedirs(src_dir)
    for b in range(6):
        rows = [
            Row(user_id=u, seq=b, tie=0, state=f"s{(u + b) % 3}")
            for u in range(b, b + 15)
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)

    write_table(spark, spark.createDataFrame([], SCHEMA), tdir)
    enable_change_feed(tdir)
    build_agg_view(
        spark, tdir, vdir,
        row_keys=["user_id"], group_by=["state"],
        measures={"n_users": ("count", None)},
    )
    table_upsert_stream(
        spark, src_dir, tdir, ["user_id"], ["seq", "tie"],
        schema=SCHEMA, max_files_per_trigger=1,
        auto_optimize=True, optimize_max_files=4,
        follow_views=[vdir],
    )
    assert view_status(vdir)["stale"] is False

    got = {
        r["state"]: (r["n_users"], r["_rows"])
        for r in read_table(spark, vdir).collect()
    }
    want = {
        r["state"]: (r["n"], r["n"])
        for r in read_table(spark, tdir)
        .groupBy("state").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
