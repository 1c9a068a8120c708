"""Managed-table OPTIMIZE (operators/table_store.py).

Contracts under test:

* compaction preserves every row and lands near the target file count;
* ``table_report`` fires on the small-file pathologies it documents,
  and not on a healthy table;
* ``cluster_by`` yields non-overlapping per-file key ranges (the
  min/max footer property file skipping depends on);
* a crashed prior attempt (garbage in the next epoch's staging dir) is
  overwritten, never merged;
* a held commit lock turns a concurrent optimize into
  ``ConcurrentWriteError``, leaving the committed epoch readable;
* ``retention_sec`` keeps the retired epoch dir for cross-process
  readers, and a later sweep past retention removes it.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.epoch_store import ConcurrentWriteError, read_epoch
from ariadne_dbt_spark.operators.table_store import (
    DATA_NAME,
    optimize_table,
    read_table,
    table_report,
    write_table,
)


def _make_fragmented(spark, tmp_path, n_rows=10_000, n_files=40):
    tdir = str(tmp_path / "tbl")
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha1(F.col("id").cast("string")).alias("pad")
    )
    write_table(spark, df.repartition(n_files), tdir)
    return tdir


def test_report_fires_on_fragmentation_and_optimize_fixes_it(spark, tmp_path):
    tdir = _make_fragmented(spark, tmp_path)
    rep = table_report(tdir, target_file_mb=128, max_files=16)
    assert rep["n_files"] == 40 and rep["should_optimize"]

    before = sorted(r["id"] for r in read_table(spark, tdir).collect())
    out = optimize_table(spark, tdir, target_file_mb=128)
    assert out["new_epoch"] == 1 and read_epoch(tdir) == 1

    after_rep = table_report(tdir, target_file_mb=128, max_files=16)
    assert after_rep["n_files"] <= 2
    assert not after_rep["should_optimize"]
    after = sorted(r["id"] for r in read_table(spark, tdir).collect())
    assert after == before


def test_cluster_by_yields_disjoint_file_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    # ~4 MB of data at 1 MB target → several output files with ranges
    # to compare
    tdir = _make_fragmented(spark, tmp_path, n_rows=60_000, n_files=20)
    optimize_table(spark, tdir, target_file_mb=1, cluster_by=["id"])

    from ariadne_dbt_spark.operators.epoch_store import _walk_parquet, data_dir

    live = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    ranges = []
    for p in _walk_parquet(live):
        md = pq.ParquetFile(p).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        ci = names.index("id")
        lo = min(md.row_group(r).column(ci).statistics.min for r in range(md.num_row_groups))
        hi = max(md.row_group(r).column(ci).statistics.max for r in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges  # disjoint → min/max footers prune files


def test_zorder_by_keeps_every_dimension_prunable(spark, tmp_path):
    """OPTIMIZE ZORDER: every output file's min/max footer range must be
    NARROW on BOTH keys — lexicographic cluster_by on (x, y) gives each
    file a narrow x range but the FULL y range, so a y-filter prunes
    nothing; the Morton interleave is exactly what fixes that."""
    import pyarrow.parquet as pq

    from ariadne_dbt_spark.operators.epoch_store import _walk_parquet, data_dir

    tdir = str(tmp_path / "ztbl")
    # 256x256 uniform grid x4 (~16 MB with the pad → ~16 1 MB files;
    # with only 2-3 files the curve can't show per-dimension locality)
    df = spark.range(262_144).select(
        (F.col("id") % 256).alias("x"),
        ((F.col("id") / 256).cast("long") % 256).alias("y"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    )
    write_table(spark, df.repartition(20), tdir)

    with pytest.raises(ValueError, match="not both"):
        optimize_table(spark, tdir, cluster_by=["x"], zorder_by=["y"])

    before = read_table(spark, tdir).count()
    out = optimize_table(spark, tdir, target_file_mb=1, zorder_by=["x", "y"])
    assert out["zordered_by"] == ["x", "y"]
    assert read_table(spark, tdir).count() == before

    from ariadne_dbt_spark.operators.layout import rowgroup_overlap_fraction

    live = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    # a 1/8-domain band on EITHER key must prune most row groups —
    # the multi-dimensional property lexicographic clustering lacks
    zx = rowgroup_overlap_fraction(live, "x", 0, 31)
    zy = rowgroup_overlap_fraction(live, "y", 0, 31)
    assert zx <= 0.7 and zy <= 0.7, (zx, zy)

    # the discriminating comparison: lexicographic (x, y) clustering on
    # the same data leaves the TRAILING key unprunable
    ldir = str(tmp_path / "ltbl")
    write_table(spark, df.repartition(20), ldir)
    optimize_table(spark, ldir, target_file_mb=1, cluster_by=["x", "y"])
    llive = data_dir(ldir, DATA_NAME, read_epoch(ldir))
    ly = rowgroup_overlap_fraction(llive, "y", 0, 31)
    assert zy < ly, (zy, ly)
    assert ly >= 0.9, ly  # every lex file spans the full y range


def test_crashed_attempt_is_overwritten(spark, tmp_path):
    tdir = _make_fragmented(spark, tmp_path, n_rows=500, n_files=8)
    # simulate a crashed optimize: garbage parquet-less staging dir for
    # the next epoch
    staged = os.path.join(tdir, f"{DATA_NAME}_ep1")
    os.makedirs(staged)
    with open(os.path.join(staged, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    before = read_table(spark, tdir).count()
    optimize_table(spark, tdir)
    assert read_epoch(tdir) == 1
    assert read_table(spark, tdir).count() == before


def test_concurrent_optimize_raises_and_table_stays_readable(spark, tmp_path):
    tdir = _make_fragmented(spark, tmp_path, n_rows=500, n_files=8)
    lock = os.path.join(tdir, "_commit.lock")
    with open(lock, "w") as f:
        f.write("424242")
    try:
        with pytest.raises(ConcurrentWriteError):
            optimize_table(spark, tdir)
    finally:
        os.remove(lock)
    assert read_epoch(tdir) == 0
    assert read_table(spark, tdir).count() == 500


def test_time_travel_read_and_history(spark, tmp_path):
    from ariadne_dbt_spark.operators.table_store import table_history

    tdir = _make_fragmented(spark, tmp_path, n_rows=500, n_files=8)
    before = sorted(r["id"] for r in read_table(spark, tdir).collect())
    # retention keeps epoch 0 on disk after the flip → pinnable
    optimize_table(spark, tdir, retention_sec=3600)

    hist = table_history(tdir)
    assert [h["epoch"] for h in hist] == [0, 1]
    assert [h["is_current"] for h in hist] == [False, True]
    assert hist[0]["retired_at"] is not None  # stamped by the sweep
    assert hist[1]["retired_at"] is None

    pinned = sorted(r["id"] for r in read_table(spark, tdir, epoch=0).collect())
    assert pinned == before
    assert read_table(spark, tdir, epoch=1).count() == len(before)

    # swept (or never-written) epochs refuse loudly
    with pytest.raises(FileNotFoundError, match="retained epochs"):
        read_table(spark, tdir, epoch=7)


def test_retention_keeps_retired_epoch_then_sweeps(spark, tmp_path):
    from ariadne_dbt_spark.operators.epoch_store import data_dir, sweep_stale_epochs

    tdir = _make_fragmented(spark, tmp_path, n_rows=500, n_files=8)
    old_dir = data_dir(tdir, DATA_NAME, 0)
    optimize_table(spark, tdir, retention_sec=3600)
    assert os.path.isdir(old_dir)  # retired but inside retention
    stamp = os.path.join(old_dir, "_retired.json")
    assert os.path.exists(stamp)
    # age the stamp past retention; the next sweep removes the dir
    with open(stamp, "w") as f:
        json.dump({"retired_at": time.time() - 7200}, f)
    sweep_stale_epochs(tdir, [DATA_NAME], read_epoch(tdir), retention_sec=3600)
    assert not os.path.isdir(old_dir)
    assert read_table(spark, tdir).count() == 500


def test_sweeper_ignores_live_attempt_dirs(spark, tmp_path):
    """A writer's private staging dir (t_ep<k+1>.attempt-<uuid>) must be
    invisible to ``sweep_stale_epochs``: with retention 0 a concurrent
    sweep used to rmtree a LIVE writer's staging mid-write, and with
    retention > 0 it stamped ``_retired.json`` INTO the attempt — the
    stamp then rode into the committed epoch and aged it out the moment
    it retired (round-9 advice, medium)."""
    from ariadne_dbt_spark.operators.epoch_store import sweep_stale_epochs

    tdir = _make_fragmented(spark, tmp_path, n_rows=100, n_files=2)
    attempt = os.path.join(tdir, f"{DATA_NAME}_ep1.attempt-cafebabe0123")
    os.makedirs(attempt)
    with open(os.path.join(attempt, "part-00000.parquet"), "wb") as f:
        f.write(b"not-yet-finished")

    sweep_stale_epochs(tdir, [DATA_NAME], 0, retention_sec=0.0)
    assert os.path.isdir(attempt), "retention-0 sweep deleted a live attempt dir"

    sweep_stale_epochs(tdir, [DATA_NAME], 0, retention_sec=3600.0)
    assert not os.path.exists(os.path.join(attempt, "_retired.json")), (
        "sweep stamped retirement into a live attempt dir"
    )


def test_commit_scrubs_inherited_retired_stamp(spark, tmp_path):
    """Even if an old binary's sweep stamped ``_retired.json`` into the
    staging dir, the commit must not let it ride into the committed
    epoch (it would mark the LIVE epoch already-retired, so the next
    sweep could delete it the instant the pointer moves on)."""
    import ariadne_dbt_spark.operators.table_store as mod

    tdir = _make_fragmented(spark, tmp_path, n_rows=100, n_files=4)

    orig = mod._scrub_retired_stamp

    def scrub_after_stamp(attempt):
        with open(os.path.join(attempt, "_retired.json"), "w") as f:
            json.dump({"retired_at": 0.0}, f)
        orig(attempt)

    mod._scrub_retired_stamp = scrub_after_stamp
    try:
        optimize_table(spark, tdir)
    finally:
        mod._scrub_retired_stamp = orig
    live = os.path.join(tdir, f"{DATA_NAME}_ep1")
    assert os.path.isdir(live)
    assert not os.path.exists(os.path.join(live, "_retired.json"))


def test_stale_attempt_gc_uses_content_mtime(spark, tmp_path):
    """The crashed-attempt collector must age an attempt dir by the
    NEWEST mtime anywhere inside it: a long partitioned write touches
    nested files while the top-level dir's mtime stays pinned at job
    start (round-9 advice)."""
    from ariadne_dbt_spark.operators.table_store import (
        ATTEMPT_STALE_SEC,
        _gc_stale_attempts,
    )

    tdir = str(tmp_path / "tbl")
    os.makedirs(tdir)
    old = time.time() - ATTEMPT_STALE_SEC - 60

    # live writer: top dir old, inner file freshly written
    live = os.path.join(tdir, f"{DATA_NAME}_ep1.attempt-live00000000")
    os.makedirs(os.path.join(live, "k=1"))
    with open(os.path.join(live, "k=1", "part-0.parquet"), "wb") as f:
        f.write(b"x")
    os.utime(live, (old, old))
    os.utime(os.path.join(live, "k=1"), (old, old))

    # crashed writer: everything old
    dead = os.path.join(tdir, f"{DATA_NAME}_ep1.attempt-dead00000000")
    os.makedirs(os.path.join(dead, "k=1"))
    with open(os.path.join(dead, "k=1", "part-0.parquet"), "wb") as f:
        f.write(b"x")
    for p in (dead, os.path.join(dead, "k=1"), os.path.join(dead, "k=1", "part-0.parquet")):
        os.utime(p, (old, old))

    _gc_stale_attempts(tdir)
    assert os.path.isdir(live), "GC removed a live writer's attempt dir"
    assert not os.path.isdir(dead), "GC kept a provably crashed attempt dir"


def test_partition_string_values_survive_roundtrip(spark, tmp_path):
    """Partition-column TYPES come from the persisted schema, not path
    inference: a string partition value like '01' or '1e3' must read
    back as the same string (round-9 advice; path inference re-types it
    to int/double and mangles the value)."""
    tdir = str(tmp_path / "ptbl")
    df = spark.createDataFrame(
        [("01", 1), ("1e3", 2), ("x", 3)], "bucket string, v int"
    )
    write_table(spark, df, tdir, partition_by=["bucket"])

    back = read_table(spark, tdir)
    assert dict(back.dtypes)["bucket"] == "string"
    assert sorted(r["bucket"] for r in back.collect()) == ["01", "1e3", "x"]

    # the schema survives OPTIMIZE's epoch flip too
    optimize_table(spark, tdir)
    back2 = read_table(spark, tdir)
    assert dict(back2.dtypes)["bucket"] == "string"
    assert sorted(r["bucket"] for r in back2.collect()) == ["01", "1e3", "x"]
