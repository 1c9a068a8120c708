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

    # a zorder key that IS a partition column is refused (constant per
    # directory); non-partition keys compose — covered by
    # test_partitioned_zorder_prunes_within_partitions
    with pytest.raises(ValueError, match="partition columns"):
        optimize_table(spark, tdir, zorder_by=["day"])

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


def test_duplicate_key_target_rows_each_updated(spark, tmp_path):
    """Delta MERGE semantics on a target holding N rows for one matched
    key: EVERY matched target row is updated (each takes the source
    row's values; row count preserved) — never collapsed to a single
    row (round-9 advice). Deletes remove all N."""
    tdir = str(tmp_path / "dup")
    rows = [Row(id=1, grp=0, val="a"), Row(id=1, grp=1, val="b"),
            Row(id=1, grp=2, val="c"), Row(id=2, grp=0, val="d")]
    write_table(spark, spark.createDataFrame(rows), tdir)

    src = spark.createDataFrame([Row(id=1, grp=9, val="NEW"), Row(id=3, grp=9, val="INS")])
    rep = merge_table(spark, tdir, src, ["id"])
    got = read_table(spark, tdir).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append((r["grp"], r["val"]))
    # all three id=1 target rows updated to the source values
    assert by_id[1] == [(9, "NEW")] * 3
    assert by_id[2] == [(0, "d")]
    assert by_id[3] == [(9, "INS")]
    assert rep["rows_updated"] == 3 and rep["rows_inserted"] == 1

    # delete removes every row of the matched key
    rep = merge_table(
        spark, tdir,
        spark.createDataFrame([Row(id=1, grp=0, val="x")]),
        ["id"], when_matched="delete", when_not_matched=None,
    )
    assert rep["rows_deleted"] == 3
    assert sorted(r["id"] for r in read_table(spark, tdir).collect()) == [2, 3]


def test_partitioned_zorder_prunes_within_partitions(spark, tmp_path):
    """OPTIMIZE ZORDER on a hive-partitioned table lays the Morton curve
    WITHIN each partition (round-10; previously a disclosed refusal):
    the layout is preserved, and inside each day= directory the files'
    footer ranges on BOTH z-keys are narrow — a band predicate on either
    key prunes most files of the partition, which lexicographic
    clustering can only deliver for its leading key."""
    from ariadne_dbt_spark.operators.table_store import _file_key_bounds

    tdir = str(tmp_path / "pz")
    df = spark.range(64_000).select(
        (F.col("id") % 2).alias("day"),
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
        # incompressible pad so target_file_mb=1 yields ~20 files
        F.concat(
            *[F.sha1(F.concat(F.lit(str(i)), F.col("id").cast("string"))) for i in range(8)]
        ).alias("pad"),
    )
    write_table(spark, df.repartition(8), tdir, partition_by=["day"])

    before = read_table(spark, tdir).groupBy("day").count().collect()
    out = optimize_table(spark, tdir, target_file_mb=1, zorder_by=["x", "y"])
    assert out["zordered_by"] == ["x", "y"]

    live = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    files = _walk_parquet(live)
    assert all("day=" in p for p in files)  # layout preserved
    after = read_table(spark, tdir).groupBy("day").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))

    # per partition dir, a 1/8 band on each z-key should skip most files
    for key in ("x", "y"):
        for day in ("day=0", "day=1"):
            dfiles = [f for f in files if day in f]
            assert len(dfiles) >= 4, f"want several files under {day}"
            lo, hi = -1000, -750  # a 1/8 slice of the key domain
            hit = 0
            for f in dfiles:
                b = _file_key_bounds(f, key)
                assert b is not None
                if not (b[1] < lo or b[0] > hi):
                    hit += 1
            assert hit / len(dfiles) <= 0.6, (
                f"{key} band hit {hit}/{len(dfiles)} files in {day} — "
                f"z-order gave no pruning inside the partition"
            )


def test_merge_prunes_from_manifest_without_footer_io(spark, tmp_path):
    """The committed file-stats manifest (``_files.json``, round 10 —
    Iceberg's manifest economics for plain parquet) makes the MERGE
    prune zero-footer-IO: when every live file has a manifest entry,
    ``_file_key_bounds`` is never called; with the manifest deleted the
    same merge falls back to footers and commits the identical state.
    Carried files must inherit their stats into the next manifest
    (O(metadata)) so the property survives successive merges."""
    import json

    import ariadne_dbt_spark.operators.table_store as mod
    from ariadne_dbt_spark.operators.table_store import _MANIFEST_FILE, _resolve

    def build(name):
        tdir = str(tmp_path / name)
        df = spark.range(60_000).select(
            F.col("id"),
            (F.col("id") % 7).alias("grp"),
            F.sha1(F.col("id").cast("string")).alias("val"),
        )
        write_table(spark, df.repartition(20), tdir)
        optimize_table(spark, tdir, target_file_mb=1, cluster_by=["id"])
        return tdir

    tdir = build("mtab")
    live = _resolve(tdir)
    man = json.load(open(os.path.join(live, _MANIFEST_FILE)))["files"]
    files = _walk_parquet(live)
    assert len(files) >= 3
    assert set(man) == {os.path.relpath(f, live) for f in files}
    assert all("id" in e["bounds"] for e in man.values())
    assert sum(e["rows"] for e in man.values()) == 60_000

    calls = []
    orig = mod._file_key_bounds
    mod._file_key_bounds = lambda *a: (calls.append(a), orig(*a))[1]
    try:
        src = _source(spark, ids_update=[5, 6], ids_insert=[90001])
        rep = merge_table(spark, tdir, src, ["id"])
    finally:
        mod._file_key_bounds = orig
    assert calls == [], "manifest-covered merge still read parquet footers"
    assert rep["n_files_carried"] > 0, "narrow merge should carry files"
    state_a = _rows(spark, tdir)

    # same merge on a manifest-less copy: identical result via footers
    tdir2 = build("mtab2")
    os.remove(os.path.join(_resolve(tdir2), _MANIFEST_FILE))
    merge_table(spark, tdir2, _source(spark, [5, 6], [90001]), ["id"])
    assert _rows(spark, tdir2) == state_a

    # the NEXT epoch's manifest covers carried files by inheritance
    live2 = _resolve(tdir)
    man2 = json.load(open(os.path.join(live2, _MANIFEST_FILE)))["files"]
    carried = [r for r in man2 if os.path.basename(r).startswith("carry-")]
    assert carried, "expected hard-link-carried files in the new epoch"
    for r in carried:
        assert "id" in man2[r]["bounds"]

    # and a second merge prunes footer-free again
    calls2 = []
    mod._file_key_bounds = lambda *a: (calls2.append(a), orig(*a))[1]
    try:
        merge_table(spark, tdir, _source(spark, [7], [90002]), ["id"])
    finally:
        mod._file_key_bounds = orig
    assert calls2 == []


def test_merge_beyond_prune_cap_uses_range_stats_and_matches(spark, tmp_path):
    """Round-10 fused key probe: a source with more distinct keys than
    ``prune_max_keys`` must route through the stats-only aggregate
    (no per-key list), still produce the identical merged state and
    report, and still raise on duplicate keys."""
    tdir = _make_table(spark, tmp_path, n=200)
    before = _rows(spark, tdir)
    src = _source(spark, ids_update=[3, 7, 9], ids_insert=[200, 300])

    rep = merge_table(spark, tdir, src, ["id"], prune_max_keys=2)
    assert rep["rows_updated"] == 3 and rep["rows_inserted"] == 2
    assert rep["rows_deleted"] == 0

    expect = dict(before)
    for i in [3, 7, 9, 200, 300]:
        expect[i] = (i % 7, f"new{i}")
    assert _rows(spark, tdir) == expect

    dup = spark.createDataFrame(
        [Row(id=i, grp=i % 7, val=f"x{i}") for i in [1, 2, 3]]
        + [Row(id=3, grp=3, val="dup")]
    )
    with pytest.raises(ValueError, match="not unique"):
        merge_table(spark, tdir, dup, ["id"], prune_max_keys=2)


def test_delete_beyond_prune_cap_counts_via_rows_total(spark, tmp_path):
    """rows_deleted derives from manifest/footer row totals minus the
    observed kept/updated rows — exercise it on BOTH sides of the
    prune cap."""
    for cap, name in ((100_000, "d1"), (1, "d2")):
        tdir = _make_table(spark, tmp_path, n=120, name=name)
        before = _rows(spark, tdir)
        doomed = spark.createDataFrame([Row(id=i) for i in [0, 60, 119, 7777]])
        rep = merge_table(
            spark,
            tdir,
            doomed.select("id", F.lit(0).alias("grp"), F.lit("x").alias("val")),
            ["id"],
            when_matched="delete",
            when_not_matched=None,
            prune_max_keys=cap,
        )
        assert rep["rows_deleted"] == 3, (cap, rep)
        assert rep["rows_updated"] == 0 and rep["rows_inserted"] == 0
        expect = {k: v for k, v in before.items() if k not in (0, 60, 119)}
        assert _rows(spark, tdir) == expect


def test_source_delete_condition_fuses_upsert_and_delete(spark, tmp_path):
    """Delta's WHEN MATCHED AND cond THEN DELETE beside update/insert,
    in ONE epoch flip: delete-flagged source rows remove their matched
    targets and never insert; other rows upsert normally."""
    tdir = _make_table(spark, tmp_path, n=100)
    before = _rows(spark, tdir)
    src = spark.createDataFrame(
        # doomed=True rows: 5 (exists -> delete), 500 (absent -> no-op)
        [Row(id=5, grp=5, val="x", doomed=True),
         Row(id=500, grp=3, val="x", doomed=True),
         Row(id=7, grp=0, val="upd7", doomed=False),
         Row(id=600, grp=5, val="new600", doomed=False)]
    )
    ep0 = read_epoch(tdir)
    rep = merge_table(
        spark, tdir,
        src, ["id"],
        source_delete_condition=F.col("doomed"),
        merge_schema=True,  # src carries the extra flag column
    )
    assert read_epoch(tdir) == ep0 + 1  # ONE flip for update+insert+delete
    assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
    assert rep["rows_deleted"] == 1

    after = {
        r["id"]: (r["grp"], r["val"])
        for r in read_table(spark, tdir).select("id", "grp", "val").collect()
    }
    expect = {k: v for k, v in before.items() if k != 5}
    expect[7] = (0, "upd7")
    expect[600] = (5, "new600")
    assert after == expect

    # invalid compositions raise
    with pytest.raises(ValueError, match="source_delete_condition"):
        merge_table(spark, tdir, src, ["id"], when_matched="delete",
                    source_delete_condition=F.col("doomed"))
