"""Row-level MERGE / DELETE / change feed on managed tables
(operators/table_store.py merge_table / delete_keys / table_changes).

Contracts under test:

* upsert (update + insert), update-only, delete, and insert-if-absent
  semantics each match a Python oracle computed from the same inputs;
* the footer prune actually CARRIES untouched files — on a table
  clustered by the merge key, a narrow-key source rewrites only the
  overlapping files, the rest are hard-linked (same inode) into the
  new epoch;
* pruning is conservative: results are identical whether or not any
  file gets carried (checked by merging the same source into a
  clustered and an unclustered copy);
* duplicate source keys raise instead of picking a silent winner;
* a crashed prior merge attempt's staged leftovers are removed, never
  merged into this attempt's output;
* a concurrent committer turns the late merge into
  ``ConcurrentWriteError`` with the committed epoch intact;
* MERGE shares the version history: the pre-merge epoch stays
  time-travel-readable under retention, and ``table_changes`` between
  the two epochs reports exactly the merged deltas.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from ariadne_dbt_spark.operators.epoch_store import (
    ConcurrentWriteError,
    _walk_parquet,
    data_dir,
    read_epoch,
)
from ariadne_dbt_spark.operators.table_store import (
    DATA_NAME,
    delete_keys,
    merge_table,
    optimize_table,
    read_table,
    table_changes,
    write_table,
)


def _make_table(spark, tmp_path, n=1000, name="tbl"):
    tdir = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("val"),
    )
    write_table(spark, df, tdir)
    return tdir


def _rows(spark, tdir):
    return {r["id"]: (r["grp"], r["val"]) for r in read_table(spark, tdir).collect()}


def _source(spark, ids_update, ids_insert):
    rows = [Row(id=i, grp=i % 7, val=f"new{i}") for i in ids_update + ids_insert]
    return spark.createDataFrame(rows)


def test_upsert_matches_python_oracle(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=500)
    before = _rows(spark, tdir)
    src = _source(spark, ids_update=[3, 7, 499], ids_insert=[500, 777])

    rep = merge_table(spark, tdir, src, ["id"])
    assert rep["rows_updated"] == 3 and rep["rows_inserted"] == 2
    assert rep["rows_deleted"] == 0 and rep["new_epoch"] == 1

    expect = dict(before)
    for i in [3, 7, 499, 500, 777]:
        expect[i] = (i % 7, f"new{i}")
    assert _rows(spark, tdir) == expect


def test_update_only_ignores_unmatched_source(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=100)
    before = _rows(spark, tdir)
    src = _source(spark, ids_update=[5], ids_insert=[1000])

    rep = merge_table(spark, tdir, src, ["id"], when_not_matched=None)
    assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 0

    expect = dict(before)
    expect[5] = (5, "new5")
    assert _rows(spark, tdir) == expect  # 1000 was NOT inserted


def test_insert_if_absent_keeps_matched_target_rows(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=100)
    before = _rows(spark, tdir)
    src = _source(spark, ids_update=[5], ids_insert=[1000])

    rep = merge_table(spark, tdir, src, ["id"], when_matched=None)
    assert rep["rows_updated"] == 0 and rep["rows_inserted"] == 1

    expect = dict(before)
    expect[1000] = (1000 % 7, "new1000")
    assert _rows(spark, tdir) == expect  # row 5 kept its ORIGINAL value


def test_delete_keys_removes_only_named_rows(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=100)
    before = _rows(spark, tdir)
    doomed = spark.createDataFrame([Row(id=i) for i in [0, 50, 99, 12345]])

    rep = delete_keys(spark, tdir, doomed, ["id"])
    assert rep["rows_deleted"] == 3  # 12345 never existed
    assert rep["rows_inserted"] == 0

    expect = {k: v for k, v in before.items() if k not in (0, 50, 99)}
    assert _rows(spark, tdir) == expect


def test_duplicate_source_keys_raise(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=10)
    dup = spark.createDataFrame(
        [Row(id=1, grp=1, val="a"), Row(id=1, grp=1, val="b")]
    )
    with pytest.raises(ValueError, match="not unique"):
        merge_table(spark, tdir, dup, ["id"])


def test_missing_source_column_raises(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=10)
    src = spark.createDataFrame([Row(id=1, grp=1)])  # no `val`
    with pytest.raises(ValueError, match="missing target columns"):
        merge_table(spark, tdir, src, ["id"])


def test_footer_prune_carries_untouched_files_as_hardlinks(spark, tmp_path):
    # cluster on the merge key so files have disjoint id ranges, then
    # merge a source confined to the LOW end of the key space
    tdir = str(tmp_path / "big")
    df = spark.range(60_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.sha1(F.col("id").cast("string")).alias("val"),
    )
    write_table(spark, df.repartition(20), tdir)
    optimize_table(spark, tdir, target_file_mb=1, cluster_by=["id"])
    live_before = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    n_files = len(_walk_parquet(live_before))
    assert n_files >= 3  # need several disjoint ranges for the claim
    # capture inodes NOW: the merge's zero-retention sweep deletes the
    # old epoch dir, but hard links keep the inodes themselves alive
    old_inodes = {os.stat(p).st_ino for p in _walk_parquet(live_before)}

    src = spark.createDataFrame([Row(id=i, grp=i % 7, val=f"new{i}") for i in range(10)])
    rep = merge_table(spark, tdir, src, ["id"])
    assert rep["rows_updated"] == 10
    # the low-key source overlaps only the first clustered file(s)
    assert rep["n_files_carried"] >= n_files - 2, rep
    assert rep["n_files_touched"] <= 2, rep

    # carried files are HARD LINKS to the old epoch's bytes — O(metadata)
    live_after = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    carried = [p for p in _walk_parquet(live_after) if os.path.basename(p).startswith("carry-")]
    assert len(carried) == rep["n_files_carried"]
    assert all(os.stat(p).st_ino in old_inodes for p in carried)

    # and the table still reads correctly end to end
    out = {r["id"]: r["val"] for r in read_table(spark, tdir).where(F.col("id") < 20).collect()}
    assert out[3] == "new3" and out[15] != "new15"
    assert read_table(spark, tdir).count() == 60_000


def test_prune_is_semantics_neutral(spark, tmp_path):
    """The same merge against a clustered (prunable) and an unclustered
    single-file (nothing carried) copy must produce identical tables."""
    rows = [Row(id=i, grp=i % 3, val=f"v{i}") for i in range(2000)]
    df = spark.createDataFrame(rows)
    a = str(tmp_path / "clustered")
    b = str(tmp_path / "flat")
    write_table(spark, df.repartition(8), a)
    optimize_table(spark, a, target_file_mb=1, cluster_by=["id"])
    write_table(spark, df.coalesce(1), b)

    src = spark.createDataFrame(
        [Row(id=i, grp=i % 3, val=f"merged{i}") for i in [1, 2, 1999, 5000]]
    )
    ra = merge_table(spark, a, src, ["id"])
    rb = merge_table(spark, b, src, ["id"])
    assert ra["rows_updated"] == rb["rows_updated"] == 3
    assert ra["rows_inserted"] == rb["rows_inserted"] == 1
    ta = sorted(map(tuple, read_table(spark, a).collect()))
    tb = sorted(map(tuple, read_table(spark, b).collect()))
    assert ta == tb


def test_crashed_prior_attempt_is_cleared(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=50)
    staged = os.path.join(tdir, f"{DATA_NAME}_ep1")
    os.makedirs(staged)
    junk = os.path.join(staged, "part-junk.parquet")
    with open(junk, "wb") as f:
        f.write(b"not parquet")

    src = _source(spark, ids_update=[1], ids_insert=[])
    merge_table(spark, tdir, src, ["id"])
    live = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    assert not os.path.exists(os.path.join(live, "part-junk.parquet"))
    assert read_table(spark, tdir).count() == 50


def test_concurrent_commit_raises_and_leaves_table_intact(spark, tmp_path):
    from ariadne_dbt_spark.operators.epoch_store import commit_epoch

    tdir = _make_table(spark, tmp_path, n=50)
    before = _rows(spark, tdir)

    # another writer flips the epoch mid-merge: simulate by pre-bumping
    # the pointer right before our merge would commit. merge re-reads
    # the epoch under the lock, so bumping it first is equivalent.
    ep1 = os.path.join(tdir, f"{DATA_NAME}_ep1")
    os.makedirs(ep1, exist_ok=True)
    read_table(spark, tdir).write.mode("overwrite").parquet(ep1)
    commit_epoch(tdir, 1)

    # emulate the race by making merge's SECOND epoch read (the re-check
    # under commit_lock) observe a world that moved on
    from ariadne_dbt_spark.operators import table_store as ts

    real_read_epoch = ts.read_epoch
    calls = {"n": 0}

    def flaky_read_epoch(path):
        ep = real_read_epoch(path)
        calls["n"] += 1
        if calls["n"] == 1:
            return ep  # merge plans against this epoch...
        return ep + 1  # ...but the world moved before its commit

    ts.read_epoch = flaky_read_epoch
    try:
        with pytest.raises(ConcurrentWriteError, match="moved to epoch"):
            merge_table(spark, tdir, _source(spark, [1], []), ["id"])
    finally:
        ts.read_epoch = real_read_epoch
    assert _rows(spark, tdir) == before  # committed version untouched


def test_merge_shares_time_travel_and_change_feed(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=100)
    src = _source(spark, ids_update=[5, 6], ids_insert=[200])
    merge_table(spark, tdir, src, ["id"], retention_sec=3600)
    delete_keys(spark, tdir, spark.createDataFrame([Row(id=7)]), ["id"], retention_sec=3600)

    # pre-merge epoch readable under retention
    v0 = read_table(spark, tdir, epoch=0)
    assert v0.count() == 100
    assert v0.where(F.col("id") == 5).collect()[0]["val"] == "v5"

    # change feed across the full history: 2 updates, 1 insert, 1 delete
    ch = {
        (r["id"], r["_change_type"])
        for r in table_changes(spark, tdir, ["id"], from_epoch=0).collect()
    }
    assert ch == {
        (5, "update_postimage"),
        (6, "update_postimage"),
        (200, "insert"),
        (7, "delete"),
    }
    # post-image values ride along
    post = {
        r["id"]: r["val"]
        for r in table_changes(spark, tdir, ["id"], from_epoch=0).collect()
    }
    assert post[5] == "new5" and post[200] == "new200" and post[7] == "v7"


def test_schema_evolution_add_column_is_metadata_only(spark, tmp_path):
    """merge_schema=True widens the table; carried files stay
    hard-linked (no rewrite) and null-fill the new column on read —
    Delta's metadata-only add-column, via parquet mergeSchema."""
    tdir = str(tmp_path / "evo")
    df = spark.range(60_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.sha1(F.col("id").cast("string")).alias("val"),
    )
    write_table(spark, df.repartition(10), tdir)
    optimize_table(spark, tdir, target_file_mb=1, cluster_by=["id"])
    live0 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    n_files = len(_walk_parquet(live0))
    assert n_files >= 3
    inodes0 = {os.stat(p).st_ino for p in _walk_parquet(live0)}

    src = spark.createDataFrame(
        [Row(id=i, grp=i % 7, val=f"new{i}", lang="en") for i in range(5)]
    )
    # strict mode refuses the extra column
    with pytest.raises(ValueError, match="merge_schema=True"):
        merge_table(spark, tdir, src, ["id"])

    rep = merge_table(spark, tdir, src, ["id"], merge_schema=True, retention_sec=3600)
    assert rep["schema_evolved"] == ["lang"]
    assert rep["n_files_carried"] >= n_files - 2  # still carried, not rewritten

    live1 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    carried = [p for p in _walk_parquet(live1) if os.path.basename(p).startswith("carry-")]
    assert carried and all(os.stat(p).st_ino in inodes0 for p in carried)

    out = read_table(spark, tdir)
    assert "lang" in out.columns
    got = {r["id"]: r["lang"] for r in out.where(F.col("id") < 10).collect()}
    assert got[3] == "en" and got[7] is None  # pre-evolution row null-fills
    assert out.count() == 60_000

    # a later OPTIMIZE must preserve the evolved column for every row
    optimize_table(spark, tdir, target_file_mb=1, cluster_by=["id"])
    out2 = read_table(spark, tdir)
    assert out2.where(F.col("lang") == "en").count() == 5
    assert out2.count() == 60_000


def test_schema_evolution_missing_target_column_still_raises(spark, tmp_path):
    tdir = _make_table(spark, tmp_path, n=10)
    src = spark.createDataFrame([Row(id=1, grp=1, extra="x")])  # no val
    with pytest.raises(ValueError, match="missing target columns"):
        merge_table(spark, tdir, src, ["id"], merge_schema=True)


def test_partitioned_table_merge_prunes_by_path_and_keeps_partition_col(spark, tmp_path):
    """Hive-partitioned layout: MERGE keyed on (day, id) with day as the
    partition column must (a) prune untouched days from their PATH
    value (partition columns never appear in footers), (b) read touched
    files through basePath so the partition column survives (a naive
    file-list read null-fills it), and (c) write the new epoch back
    partitioned."""
    tdir = str(tmp_path / "ptbl")
    df = spark.range(4000).select(
        (F.col("id") % 4).alias("day"),
        F.col("id"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("val"),
    )
    write_table(spark, df, tdir, partition_by=["day"])
    live0 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    assert any("day=" in p for p in _walk_parquet(live0))
    inodes0 = {os.stat(p).st_ino for p in _walk_parquet(live0)}
    n_files0 = len(_walk_parquet(live0))

    src = spark.createDataFrame(
        [Row(day=2, id=i, val=f"new{i}") for i in (2, 6, 10)]
        + [Row(day=2, id=999_999, val="ins")]
    )
    rep = merge_table(spark, tdir, src, ["day", "id"])
    assert rep["rows_updated"] == 3 and rep["rows_inserted"] == 1
    # only day=2's files were touched; all other days carried as links
    assert rep["n_files_carried"] >= 1
    live1 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    carried = [p for p in _walk_parquet(live1) if os.path.basename(p).startswith("carry-")]
    assert carried and all(os.stat(p).st_ino in inodes0 for p in carried)
    assert all("day=2" not in p for p in carried), carried
    assert all("day=" in p for p in _walk_parquet(live1))  # layout preserved

    out = read_table(spark, tdir)
    # the partition column survived the rewrite — NO null-fill
    assert out.where(F.col("day").isNull()).count() == 0
    assert out.count() == 4001
    got = {r["id"]: r["val"] for r in out.where(F.col("day") == 2).collect()}
    assert got[2] == "new2" and got[6] == "new6" and got[999_999] == "ins"
    assert got[14] == "v14"  # untouched row in the touched partition
    # untouched partition intact
    assert read_table(spark, tdir).where(F.col("day") == 1).count() == 1000
    _ = n_files0  # (kept for debugging repr on failure)


def test_partitioned_optimize_preserves_layout_and_refuses_clustering(spark, tmp_path):
    tdir = str(tmp_path / "popt")
    df = spark.range(8000).select(
        (F.col("id") % 3).alias("day"),
        F.col("id"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    )
    write_table(spark, df.repartition(10), tdir, partition_by=["day"])
    live0 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    assert len(_walk_parquet(live0)) >= 9  # ~10 files per day

    with pytest.raises(ValueError, match="zorder_by on a hive-partitioned"):
        optimize_table(spark, tdir, zorder_by=["id"])

    before = read_table(spark, tdir).groupBy("day").count().collect()
    optimize_table(spark, tdir, target_file_mb=128)
    live1 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    files1 = _walk_parquet(live1)
    assert all("day=" in p for p in files1)  # layout preserved
    assert len(files1) <= 3  # ~one compacted file per partition
    after = read_table(spark, tdir).groupBy("day").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_partitioned_cluster_by_clusters_within_each_partition(spark, tmp_path):
    """cluster_by on a hive-partitioned table range-clusters WITHIN each
    partition dir: per-dir file footer ranges on the cluster key must be
    disjoint (the file-skipping property), and the layout survives."""
    import pyarrow.parquet as pq

    tdir = str(tmp_path / "pclu")
    df = spark.range(60_000).select(
        (F.col("id") % 3).alias("day"),
        F.col("id"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    )
    write_table(spark, df.repartition(12), tdir, partition_by=["day"])
    optimize_table(spark, tdir, target_file_mb=1, cluster_by=["id"])

    live = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    per_dir: dict = {}
    for f in _walk_parquet(live):
        assert "day=" in f
        dname = os.path.dirname(f)
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        ci = names.index("id")
        lo = min(md.row_group(r).column(ci).statistics.min for r in range(md.num_row_groups))
        hi = max(md.row_group(r).column(ci).statistics.max for r in range(md.num_row_groups))
        per_dir.setdefault(dname, []).append((lo, hi))
    assert len(per_dir) == 3
    multi = [d for d, rs in per_dir.items() if len(rs) >= 2]
    assert multi, per_dir  # need >=2 files somewhere for the claim
    for d in multi:
        rs = sorted(per_dir[d])
        for (l1, h1), (l2, _h2) in zip(rs, rs[1:]):
            assert h1 < l2, (d, rs)
    assert read_table(spark, tdir).count() == 60_000


def test_change_feed_spans_schema_evolution(spark, tmp_path):
    """table_changes across a merge_schema=True epoch: the old side
    lacks the added column and must null-pad, not crash."""
    tdir = _make_table(spark, tmp_path, n=20)
    src = spark.createDataFrame([Row(id=3, grp=3, val="new3", lang="en")])
    merge_table(spark, tdir, src, ["id"], merge_schema=True, retention_sec=3600)

    rows = {r["id"]: r for r in table_changes(spark, tdir, ["id"], from_epoch=0).collect()}
    assert set(rows) == {3}
    assert rows[3]["_change_type"] == "update_postimage"
    assert rows[3]["lang"] == "en"


def test_failed_merge_leaves_no_attempt_dirs(spark, tmp_path):
    """The attempt-staged commit cleans its private staging dir on any
    failure — a losing racer can never leave (or destroy) epoch data."""
    from ariadne_dbt_spark.operators import table_store as ts

    tdir = _make_table(spark, tmp_path, n=20)
    before = _rows(spark, tdir)

    real_read_epoch = ts.read_epoch
    calls = {"n": 0}

    def flaky_read_epoch(path):
        ep = real_read_epoch(path)
        calls["n"] += 1
        return ep if calls["n"] == 1 else ep + 1

    ts.read_epoch = flaky_read_epoch
    try:
        with pytest.raises(ConcurrentWriteError):
            merge_table(spark, tdir, _source(spark, [1], []), ["id"])
    finally:
        ts.read_epoch = real_read_epoch
    assert not [e for e in os.listdir(tdir) if ".attempt-" in e]
    assert _rows(spark, tdir) == before


def test_when_not_matched_by_source_snapshot_sync(spark, tmp_path):
    """Delta's third clause: source = the full new snapshot; matched
    rows update, new rows insert, vanished rows are reaped. Pruning is
    structurally disabled (every target row must be checked)."""
    tdir = _make_table(spark, tmp_path, n=10)  # ids 0..9
    snapshot = spark.createDataFrame(
        [Row(id=i, grp=i % 7, val=f"snap{i}") for i in range(5, 13)]
    )
    rep = merge_table(
        spark, tdir, snapshot, ["id"], when_not_matched_by_source="delete"
    )
    assert rep["rows_updated"] == 5      # 5..9 replaced
    assert rep["rows_inserted"] == 3     # 10..12 new
    assert rep["rows_deleted"] == 5      # 0..4 reaped
    assert rep["n_files_carried"] == 0   # prune disabled by the clause
    got = {r["id"]: r["val"] for r in read_table(spark, tdir).collect()}
    assert got == {i: f"snap{i}" for i in range(5, 13)}


def test_when_not_matched_by_source_with_no_other_clause(spark, tmp_path):
    """wnbs=delete alone: matched target rows stay AS-IS, unmatched are
    reaped, source-only rows are NOT inserted."""
    tdir = _make_table(spark, tmp_path, n=6)  # ids 0..5
    keep = spark.createDataFrame([Row(id=i, grp=0, val="ignored") for i in (2, 3, 99)])
    rep = merge_table(
        spark, tdir, keep, ["id"],
        when_matched=None, when_not_matched=None,
        when_not_matched_by_source="delete",
    )
    assert rep["rows_deleted"] == 4 and rep["rows_inserted"] == 0
    got = {r["id"]: r["val"] for r in read_table(spark, tdir).collect()}
    assert got == {2: "v2", 3: "v3"}  # originals kept, 99 not inserted


def test_when_not_matched_by_source_respects_matched_condition(spark, tmp_path):
    """Condition-failed matched rows survive (the clause only touches
    rows with NO source match, like Delta)."""
    from ariadne_dbt_spark.operators.table_store import write_table as _wt

    tdir = str(tmp_path / "cond")
    _wt(spark, spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20), Row(k=3, v=30)]), tdir)
    src = spark.createDataFrame([Row(k=1, v=99), Row(k=2, v=5)])  # 1 wins, 2 loses
    merge_table(
        spark, tdir, src, ["k"],
        when_matched_condition="s.v >= t.v",
        when_not_matched_by_source="delete",
    )
    got = {r["k"]: r["v"] for r in read_table(spark, tdir).collect()}
    assert got == {1: 99, 2: 20}  # 3 reaped; 2 kept its old value
