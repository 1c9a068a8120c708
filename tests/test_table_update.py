"""Predicate-level DELETE / UPDATE on managed tables
(operators/table_store.py delete_where / update_where).

Contracts under test:

* semantics match a Python oracle (delete removes IS-TRUE rows only;
  update rewrites only matching rows' SET columns);
* NULL-predicate rows are kept / left unmodified (SQL three-valued
  semantics);
* the rewrite set comes from a predicate-filtered input_file_name scan:
  on a key-clustered table a narrow-band predicate carries every other
  file as a hard link;
* unknown SET columns raise;
* both ops share the version history (time travel + change feed see
  them).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from ariadne_dbt_spark.operators.epoch_store import _walk_parquet, data_dir, read_epoch
from ariadne_dbt_spark.operators.table_store import (
    DATA_NAME,
    delete_where,
    optimize_table,
    read_table,
    table_changes,
    update_where,
    write_table,
)


def _mk(spark, tmp_path, rows, name="tbl"):
    tdir = str(tmp_path / name)
    write_table(spark, spark.createDataFrame(rows), tdir)
    return tdir


def test_delete_where_matches_sql_semantics_incl_nulls(spark, tmp_path):
    rows = [Row(id=i, v=(None if i % 5 == 0 else i * 10)) for i in range(20)]
    tdir = _mk(spark, tmp_path, rows)
    rep = delete_where(spark, tdir, F.col("v") > 100)
    # v>100: ids 11..19 except multiples of 5 → 11,12,13,14,16,17,18,19
    assert rep["rows_deleted"] == 8 and rep["rows_updated"] == 0
    kept = sorted(r["id"] for r in read_table(spark, tdir).collect())
    # NULL-predicate rows (v null) are KEPT
    assert kept == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 15]


def test_update_where_rewrites_only_matching_rows(spark, tmp_path):
    rows = [Row(id=i, grp=i % 3, v=i * 10) for i in range(30)]
    tdir = _mk(spark, tmp_path, rows)
    rep = update_where(
        spark, tdir, {"v": "v + 1000", "grp": F.lit(9)}, "id >= 25"
    )
    assert rep["rows_updated"] == 5 and rep["rows_deleted"] == 0
    got = {r["id"]: (r["grp"], r["v"]) for r in read_table(spark, tdir).collect()}
    assert got[27] == (9, 1270) and got[24] == (24 % 3, 240)
    assert len(got) == 30  # update never changes cardinality


def test_update_where_unknown_set_column_raises(spark, tmp_path):
    tdir = _mk(spark, tmp_path, [Row(id=1, v=1)])
    with pytest.raises(ValueError, match="SET columns not in the table"):
        update_where(spark, tdir, {"nope": F.lit(1)}, "id = 1")
    with pytest.raises(ValueError, match="at least one SET column"):
        update_where(spark, tdir, {}, "id = 1")


def test_predicate_scan_carries_unmatched_files_as_hardlinks(spark, tmp_path):
    tdir = str(tmp_path / "big")
    df = spark.range(60_000).select(
        F.col("id"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    )
    write_table(spark, df.repartition(20), tdir)
    optimize_table(spark, tdir, target_file_mb=1, cluster_by=["id"])
    live0 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    n_files = len(_walk_parquet(live0))
    assert n_files >= 3
    inodes0 = {os.stat(p).st_ino for p in _walk_parquet(live0)}

    rep = delete_where(spark, tdir, "id < 100")
    assert rep["rows_deleted"] == 100
    assert rep["n_files_carried"] >= n_files - 2, rep
    live1 = data_dir(tdir, DATA_NAME, read_epoch(tdir))
    carried = [
        p for p in _walk_parquet(live1) if os.path.basename(p).startswith("carry-")
    ]
    assert len(carried) == rep["n_files_carried"]
    assert all(os.stat(p).st_ino in inodes0 for p in carried)
    assert read_table(spark, tdir).count() == 59_900

    # and an UPDATE through the same path
    rep2 = update_where(spark, tdir, {"pad": F.lit("X")}, "id >= 59990")
    assert rep2["rows_updated"] == 10
    assert rep2["n_files_carried"] >= rep2["n_files"] - 2, rep2
    assert read_table(spark, tdir).where(F.col("pad") == "X").count() == 10


def test_where_ops_share_history_and_change_feed(spark, tmp_path):
    rows = [Row(id=i, v=i) for i in range(10)]
    tdir = _mk(spark, tmp_path, rows)
    update_where(spark, tdir, {"v": "v + 100"}, "id = 3", retention_sec=3600)
    delete_where(spark, tdir, "id = 7", retention_sec=3600)

    assert read_table(spark, tdir, epoch=0).count() == 10  # time travel
    ch = {
        (r["id"], r["_change_type"])
        for r in table_changes(spark, tdir, ["id"], from_epoch=0).collect()
    }
    assert ch == {(3, "update_postimage"), (7, "delete")}


def test_shallow_clone_is_zero_copy_and_diverges(spark, tmp_path):
    from ariadne_dbt_spark.operators.table_store import clone_table, merge_table

    src = _mk(spark, tmp_path, [Row(id=i, v=i) for i in range(50)], "src")
    dest = str(tmp_path / "clone")
    rep = clone_table(src, dest)
    assert rep["n_files_linked"] >= 1

    # zero-copy: every clone file shares an inode with a source file
    s_live = data_dir(src, DATA_NAME, read_epoch(src))
    d_live = data_dir(dest, DATA_NAME, read_epoch(dest))
    s_inodes = {os.stat(p).st_ino for p in _walk_parquet(s_live)}
    assert all(os.stat(p).st_ino in s_inodes for p in _walk_parquet(d_live))
    assert read_table(spark, dest).count() == 50

    # divergence: mutate the clone → source untouched, and vice versa
    merge_table(
        spark, dest, spark.createDataFrame([Row(id=1, v=999)]), ["id"]
    )
    assert {r["v"] for r in read_table(spark, src).where(F.col("id") == 1).collect()} == {1}
    delete_where(spark, src, "id = 2")
    assert read_table(spark, dest).where(F.col("id") == 2).count() == 1

    # occupied destination refuses
    with pytest.raises(ValueError, match="already holds data"):
        clone_table(src, dest)


def test_check_constraints_guard_every_write_path(spark, tmp_path):
    from ariadne_dbt_spark.operators.table_store import (
        ConstraintViolation,
        get_constraints,
        merge_table,
        set_constraints,
    )

    tdir = _mk(spark, tmp_path, [Row(id=i, v=i + 1) for i in range(10)])
    set_constraints(tdir, {"v_pos": "v > 0"})
    assert get_constraints(tdir) == {"v_pos": "v > 0"}

    # merge introducing a violation refuses, epoch unchanged
    ep = read_epoch(tdir)
    with pytest.raises(ConstraintViolation, match="v_pos"):
        merge_table(spark, tdir, spark.createDataFrame([Row(id=3, v=-1)]), ["id"])
    assert read_epoch(tdir) == ep
    assert read_table(spark, tdir).where(F.col("v") <= 0).count() == 0

    # NULL evaluations violate (Delta CHECK semantics)
    with pytest.raises(ConstraintViolation, match="v_pos"):
        merge_table(
            spark,
            tdir,
            spark.createDataFrame([(99, None)], "id bigint, v bigint"),
            ["id"],
        )

    # update_where introducing a violation refuses
    with pytest.raises(ConstraintViolation, match="update_where"):
        update_where(spark, tdir, {"v": "v - 100"}, "id = 5")

    # a clean merge still lands
    rep = merge_table(spark, tdir, spark.createDataFrame([Row(id=3, v=7)]), ["id"])
    assert rep["rows_updated"] == 1

    # deletes never trip constraints (they only remove rows)
    delete_where(spark, tdir, "id = 4")
    assert read_table(spark, tdir).count() == 9

    # write_table is guarded too
    with pytest.raises(ConstraintViolation, match="write_table"):
        write_table(spark, spark.createDataFrame([Row(id=1, v=0)]), tdir)

    # dropping constraints lifts enforcement
    set_constraints(tdir, {})
    merge_table(spark, tdir, spark.createDataFrame([Row(id=8, v=-5)]), ["id"])


def test_clone_carries_constraints_and_refuses_stale_pointer(spark, tmp_path):
    from ariadne_dbt_spark.operators.table_store import (
        ConstraintViolation,
        clone_table,
        get_constraints,
        merge_table,
        set_constraints,
    )

    src = _mk(spark, tmp_path, [Row(id=1, v=5)], "csrc")
    set_constraints(src, {"v_pos": "v > 0"})
    dest = str(tmp_path / "cdest")
    clone_table(src, dest)
    assert get_constraints(dest) == {"v_pos": "v > 0"}
    with pytest.raises(ConstraintViolation):
        merge_table(spark, dest, spark.createDataFrame([Row(id=1, v=-1)]), ["id"])

    # a destination with a stale epoch pointer (data dirs gone) refuses
    # rather than producing an unreadable clone
    import json as _json

    stale = str(tmp_path / "stale")
    os.makedirs(stale)
    with open(os.path.join(stale, "epoch.json"), "w") as f:
        _json.dump({"epoch": 5}, f)
    with pytest.raises(ValueError, match="epoch pointer"):
        clone_table(src, stale)


def test_delete_keys_tolerates_duplicate_doomed_ids(spark, tmp_path):
    from ariadne_dbt_spark.operators.table_store import delete_keys

    tdir = _mk(spark, tmp_path, [Row(id=i, v=i) for i in range(10)], "dup")
    feed = spark.createDataFrame([Row(id=3), Row(id=3), Row(id=4)])
    rep = delete_keys(spark, tdir, feed, ["id"])
    assert rep["rows_deleted"] == 2
    assert read_table(spark, tdir).count() == 8


def test_restore_undoes_a_bad_merge_linearly(spark, tmp_path):
    from ariadne_dbt_spark.operators.table_store import (
        merge_table,
        restore_table,
        table_history,
        vacuum_table,
    )

    tdir = _mk(spark, tmp_path, [Row(id=i, v=i) for i in range(10)], "rst")
    merge_table(
        spark, tdir,
        spark.createDataFrame([Row(id=i, v=-999) for i in range(10)]),
        ["id"], retention_sec=3600,
    )  # the "bad" merge → epoch 1
    assert read_table(spark, tdir).where(F.col("v") == -999).count() == 10

    rep = restore_table(tdir, 0, retention_sec=3600)
    assert rep["new_epoch"] == 2 and rep["n_files_linked"] >= 1
    assert read_epoch(tdir) == 2
    got = {r["id"]: r["v"] for r in read_table(spark, tdir).collect()}
    assert got == {i: i for i in range(10)}  # pre-merge state is back

    # history stays linear and the bad epoch remains inspectable
    assert [h["epoch"] for h in table_history(tdir)] == [0, 1, 2]
    assert read_table(spark, tdir, epoch=1).where(F.col("v") == -999).count() == 10

    # restoring the current epoch is a no-op
    assert restore_table(tdir, 2)["new_epoch"] == 2

    # a swept epoch cannot be restored: vacuum with zero retention
    # removes retired dirs, then restore raises
    vacuum_table(tdir, retention_sec=0.0)
    assert [h["epoch"] for h in table_history(tdir)] == [2]
    with pytest.raises(FileNotFoundError, match="not a committed version"):
        restore_table(tdir, 1)


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    """Delta's VACUUM DRY RUN: report which retired epochs this
    retention would remove, delete nothing."""
    from pyspark.sql import functions as F

    from ariadne_dbt_spark.operators.table_store import (
        optimize_table,
        table_history,
        vacuum_table,
        write_table,
    )

    tdir = str(tmp_path / "dr")
    write_table(spark, spark.range(100).select(F.col("id")), tdir)
    optimize_table(spark, tdir, retention_sec=3600)
    optimize_table(spark, tdir, retention_sec=3600)
    n_before = len(table_history(tdir))
    assert n_before == 3

    out = vacuum_table(tdir, retention_sec=0.0, dry_run=True)
    assert out["dry_run"] is True
    assert [c["epoch"] for c in out["candidates"]] == [0, 1]
    assert all(c["would_delete"] for c in out["candidates"])
    assert len(table_history(tdir)) == n_before  # nothing deleted

    out = vacuum_table(tdir, retention_sec=86400.0, dry_run=True)
    assert not any(c["would_delete"] for c in out["candidates"])
    assert len(table_history(tdir)) == n_before


def test_dml_counts_identical_with_and_without_observe(spark, tmp_path, monkeypatch):
    """Run the SAME lifecycle on two identical tables, one with the
    observe path and one with the speculation fallback — every reported
    count must match exactly."""
    from ariadne_dbt_spark.operators import table_store as ts

    def lifecycle(tdir):
        ts.write_table(
            spark,
            spark.createDataFrame([(i, i * 10) for i in range(20)], "k long, v long"),
            tdir,
        )
        ts.enable_change_feed(tdir)
        reps = []
        reps.append(
            ts.merge_table(
                spark,
                tdir,
                spark.createDataFrame(
                    [(5, 555), (19, 999), (100, 1), (101, 2)], "k long, v long"
                ),
                ["k"],
                retention_sec=3600,
            )
        )
        reps.append(
            ts.update_where(
                spark, tdir, {"v": "v + 1"}, "k % 2 = 0", retention_sec=3600
            )
        )
        reps.append(
            ts.delete_keys(
                spark,
                tdir,
                spark.createDataFrame([(100,), (4,)], "k long"),
                ["k"],
                retention_sec=3600,
            )
        )
        return [
            {k: r[k] for k in ("rows_updated", "rows_deleted", "rows_inserted") if k in r}
            for r in reps
        ]

    with_obs = lifecycle(str(tmp_path / "a"))
    monkeypatch.setattr(ts, "_counts_via_observe", lambda _s: False)
    without_obs = lifecycle(str(tmp_path / "b"))
    assert with_obs == without_obs
    assert with_obs[0]["rows_updated"] == 2 and with_obs[0]["rows_inserted"] == 2
    assert with_obs[2]["rows_deleted"] == 2
