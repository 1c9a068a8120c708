"""Delta-log reader (ingest/delta_reader.py): resolve a Delta table's
live files from `_delta_log` with no delta-spark runtime.

The fixtures fabricate transaction logs BY HAND against real
Spark-written parquet files — the format is a public spec (JSON commits
of protocol/metaData/add/remove actions + optional single-file parquet
checkpoint), so a hand-built log is exactly what a real writer
produces, minus the writer.

Contracts under test:

* snapshot resolution replays add/remove correctly (removed files'
  rows are gone, late-added files' rows appear);
* time travel (``version=``) reproduces each historical state;
* partition columns come back with log-schema types via basePath;
* checkpoint + truncated JSON log resolves through the checkpoint,
  and a log truncated PAST the target version refuses;
* unsupported reader features (deletion vectors) refuse loudly;
* ``delta_history`` reports per-commit operations and file counts.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.ingest.delta_reader import (
    delta_history,
    delta_snapshot,
    read_delta,
)

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_part(spark, table, relpath, ids):
    """One parquet data file at table/relpath holding the given ids."""
    import glob
    import shutil

    tmp = os.path.join(table, "_tmp_write")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in ids], "id long, val string"
    ).coalesce(1)
    df.write.mode("overwrite").parquet(tmp)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(table, relpath)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(src, dest)
    shutil.rmtree(tmp)
    return relpath


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _add(path, pv=None):
    return {
        "add": {
            "path": path,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def _meta(schema=SCHEMA_STRING, pcols=()):
    return {
        "metaData": {
            "id": "fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema,
            "partitionColumns": list(pcols),
            "configuration": {},
        }
    }


def _make_table(spark, tmp_path, name="dl"):
    table = str(tmp_path / name)
    os.makedirs(table)
    f0 = _write_part(spark, table, "part-000.parquet", range(0, 10))
    f1 = _write_part(spark, table, "part-001.parquet", range(10, 20))
    _commit(
        table, 0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
         _meta(), _add(f0), _add(f1),
         {"commitInfo": {"operation": "WRITE", "timestamp": 1}}],
    )
    # v1: "overwrite" part-000 with corrected rows
    f2 = _write_part(spark, table, "part-002.parquet", range(100, 110))
    _commit(
        table, 1,
        [{"remove": {"path": f0, "dataChange": True}}, _add(f2),
         {"commitInfo": {"operation": "MERGE", "timestamp": 2}}],
    )
    return table


def test_snapshot_and_read_latest(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    snap = delta_snapshot(table)
    assert snap["version"] == 1
    assert [f["path"] for f in snap["files"]] == ["part-001.parquet", "part-002.parquet"]

    ids = sorted(r["id"] for r in read_delta(spark, table).collect())
    assert ids == list(range(10, 20)) + list(range(100, 110))


def test_time_travel_versions(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    ids0 = sorted(r["id"] for r in read_delta(spark, table, version=0).collect())
    assert ids0 == list(range(0, 20))
    with pytest.raises(FileNotFoundError):
        delta_snapshot(table, version=7)


def test_history_reports_operations(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    hist = delta_history(table)
    assert [(h["version"], h["operation"], h["n_added"], h["n_removed"]) for h in hist] == [
        (0, "WRITE", 2, 0),
        (1, "MERGE", 1, 1),
    ]


def test_partitioned_table_types_from_log_schema(spark, tmp_path):
    table = str(tmp_path / "pdl")
    os.makedirs(table)
    fa = _write_part(spark, table, "day=01/part-0.parquet", range(0, 5))
    fb = _write_part(spark, table, "day=02/part-0.parquet", range(5, 10))
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "val", "type": "string", "nullable": True, "metadata": {}},
                {"name": "day", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _commit(
        table, 0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
         _meta(schema, pcols=["day"]),
         _add(fa, {"day": "01"}), _add(fb, {"day": "02"})],
    )
    df = read_delta(spark, table)
    # log schema wins: '01' stays a STRING partition value
    assert dict(df.dtypes)["day"] == "string"
    got = {(r["id"], r["day"]) for r in df.collect()}
    assert got == {(i, "01") for i in range(5)} | {(i, "02") for i in range(5, 10)}


def test_checkpoint_with_truncated_json_log(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = _make_table(spark, tmp_path, name="cp")
    log = os.path.join(table, "_delta_log")
    snap = delta_snapshot(table)  # state at v1, via pure JSON replay

    # classic single-file checkpoint at v1: flattened action rows
    # empty dict/list fields are unwritable empty structs in pyarrow
    # (real checkpoints type them as MAPs); None is equivalent to the
    # reader, which coalesces missing partitionValues/partitionColumns
    md = json.loads(json.dumps(_meta()["metaData"]))
    md["configuration"] = None
    md["format"] = {"provider": "parquet"}
    md["partitionColumns"] = None
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": md},
    ] + [
        {"add": {"path": f["path"], "partitionValues": None, "size": 1,
                 "modificationTime": 0, "dataChange": True}}
        for f in snap["files"]
    ]
    # pyarrow infers the schema from the first row alone: pad every
    # action row with the full column set (real checkpoints are written
    # with one nullable struct column per action kind)
    kinds = ("protocol", "metaData", "add", "remove")
    rows = [{k: r.get(k) for k in kinds} for r in rows]
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(rows)}, f)
    os.remove(os.path.join(log, f"{0:020d}.json"))  # log cleanup

    ids = sorted(r["id"] for r in read_delta(spark, table).collect())
    assert ids == list(range(10, 20)) + list(range(100, 110))

    # time travel PAST the cleanup must refuse, not misread
    with pytest.raises(FileNotFoundError, match="cleaned up|not replayable"):
        delta_snapshot(table, version=0)


def test_unsupported_reader_features_refuse(spark, tmp_path):
    table = str(tmp_path / "dv")
    os.makedirs(table)
    f0 = _write_part(spark, table, "part-0.parquet", range(3))
    _commit(
        table, 0,
        [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                       "readerFeatures": ["deletionVectors"]}},
         _meta(), _add(f0)],
    )
    with pytest.raises(ValueError, match="deletionVectors"):
        delta_snapshot(table)


def test_not_a_delta_table(tmp_path):
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        delta_snapshot(str(tmp_path / "nope"))


def test_write_delta_roundtrip_create_append_overwrite(spark, tmp_path):
    """write_delta produces a log read_delta (and per spec any Delta
    reader) resolves: create → append → logical overwrite, with old
    versions still time-travel readable and history recording the
    operations."""
    from ariadne_dbt_spark.ingest.delta_reader import write_delta

    table = str(tmp_path / "wd")
    df1 = spark.createDataFrame([(i, f"v{i}") for i in range(5)], "id long, val string")
    rep = write_delta(spark, df1, table)
    assert rep["version"] == 0 and rep["n_files_added"] >= 1

    with pytest.raises(FileExistsError):
        write_delta(spark, df1, table)  # mode='error' default

    df2 = spark.createDataFrame([(i, f"v{i}") for i in range(5, 8)], "id long, val string")
    rep = write_delta(spark, df2, table, mode="append")
    assert rep["version"] == 1
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) == list(range(8))

    df3 = spark.createDataFrame([(99, "new")], "id long, val string")
    rep = write_delta(spark, df3, table, mode="overwrite")
    assert rep["version"] == 2 and rep["n_files_removed"] >= 2
    assert [r["id"] for r in read_delta(spark, table).collect()] == [99]
    # logical overwrite: v1 still reads in full
    assert sorted(r["id"] for r in read_delta(spark, table, version=1).collect()) == list(range(8))
    assert [h["operation"] for h in delta_history(table)] == ["WRITE", "APPEND", "WRITE"]

    # append with a different column set refuses (no schema evolution)
    with pytest.raises(ValueError, match="schema evolution"):
        write_delta(
            spark,
            spark.createDataFrame([(1, "x", 2)], "id long, val string, extra long"),
            table,
            mode="append",
        )


def test_write_delta_partitioned_roundtrip(spark, tmp_path):
    from ariadne_dbt_spark.ingest.delta_reader import write_delta

    table = str(tmp_path / "wdp")
    df = spark.createDataFrame(
        [(i, "01" if i % 2 else "1e3") for i in range(10)], "id long, day string"
    )
    write_delta(spark, df, table, partition_by=["day"])
    snap = delta_snapshot(table)
    assert snap["partition_columns"] == ["day"]
    assert all(f["partitionValues"].get("day") in ("01", "1e3") for f in snap["files"])

    back = read_delta(spark, table)
    assert dict(back.dtypes)["day"] == "string"  # log schema wins
    assert sorted((r["id"], r["day"]) for r in back.collect()) == sorted(
        (i, "01" if i % 2 else "1e3") for i in range(10)
    )


def test_export_managed_table_to_delta_is_zero_copy(spark, tmp_path):
    from ariadne_dbt_spark.ingest.delta_reader import export_table_to_delta
    from ariadne_dbt_spark.operators.epoch_store import _walk_parquet
    from ariadne_dbt_spark.operators.table_store import (
        _resolve,
        optimize_table,
        read_table,
        write_table,
    )

    tdir = str(tmp_path / "mt")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("band")
    )
    write_table(spark, df, tdir, partition_by=["band"])
    optimize_table(spark, tdir)

    dpath = str(tmp_path / "exported")
    rep = export_table_to_delta(spark, tdir, dpath)
    assert rep["partition_columns"] == ["band"]

    # zero-copy: every delta data file shares an inode with the epoch's
    src_inodes = {os.stat(p).st_ino for p in _walk_parquet(_resolve(tdir))}
    exp_files = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(dpath)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in dp
    ]
    assert exp_files and all(os.stat(p).st_ino in src_inodes for p in exp_files)

    back = read_delta(spark, dpath)
    assert dict(back.dtypes)["band"] == "string"
    assert sorted(r["id"] for r in back.collect()) == sorted(
        r["id"] for r in read_table(spark, tdir).collect()
    )


def test_import_delta_as_managed_table(spark, tmp_path):
    from decimal import Decimal

    from ariadne_dbt_spark.ingest.delta_reader import (
        import_delta_as_table,
        write_delta,
    )
    from ariadne_dbt_spark.operators.table_store import merge_table, read_table

    dpath = str(tmp_path / "src_delta")
    df = spark.createDataFrame(
        [(i, Decimal(f"{i}.50")) for i in range(50)], "id long, amt decimal(10,2)"
    )
    write_delta(spark, df, dpath)

    tdir = str(tmp_path / "imported")
    rep = import_delta_as_table(spark, dpath, tdir)
    assert rep["n_files_linked"] >= 1
    assert read_table(spark, tdir).count() == 50

    # the import is a full managed table: merge works, source unchanged
    merge_table(
        spark, tdir,
        spark.createDataFrame([(0, Decimal("99.99"))], "id long, amt decimal(10,2)"),
        ["id"],
    )
    assert read_table(spark, tdir).where(F.col("amt") == 99.99).count() == 1
    assert read_delta(spark, dpath).where(F.col("amt") == 99.99).count() == 0


def test_delta_tail_incremental_pull(spark, tmp_path):
    from ariadne_dbt_spark.ingest.delta_reader import delta_tail, write_delta

    table = str(tmp_path / "tail")
    write_delta(
        spark,
        spark.createDataFrame([(i,) for i in range(5)], "id long"),
        table,
    )
    df, cur = delta_tail(spark, table, from_version=-1)
    assert cur == 0 and sorted(r["id"] for r in df.collect()) == list(range(5))

    # nothing new
    df, cur2 = delta_tail(spark, table, from_version=cur)
    assert df is None and cur2 == 0

    write_delta(
        spark,
        spark.createDataFrame([(i,) for i in range(5, 9)], "id long"),
        table, mode="append",
    )
    df, cur3 = delta_tail(spark, table, from_version=cur)
    assert cur3 == 1 and sorted(r["id"] for r in df.collect()) == [5, 6, 7, 8]

    # an overwrite commit in range is not append-only: refuse
    write_delta(
        spark, spark.createDataFrame([(99,)], "id long"), table, mode="overwrite"
    )
    with pytest.raises(ValueError, match="append-only"):
        delta_tail(spark, table, from_version=cur3)


def test_delta_checkpoint_and_log_cleanup(spark, tmp_path):
    """A long append chain checkpoints into one parquet + hint file;
    log cleanup then removes the JSON the checkpoint subsumes, and the
    table still resolves (through the checkpoint) to the same rows.
    Cleanup without a checkpoint refuses."""
    from ariadne_dbt_spark.ingest.delta_reader import (
        delta_checkpoint,
        delta_log_cleanup,
        write_delta,
    )

    table = str(tmp_path / "ckpt")
    write_delta(spark, spark.createDataFrame([(0,)], "id long"), table)
    for i in range(1, 5):
        write_delta(
            spark, spark.createDataFrame([(i,)], "id long"), table, mode="append"
        )
    with pytest.raises(ValueError, match="delta_checkpoint"):
        delta_log_cleanup(table)

    rep = delta_checkpoint(table)
    assert rep["version"] == 4
    before = sorted(r["id"] for r in read_delta(spark, table).collect())

    out = delta_log_cleanup(table)
    assert out["removed_versions"] == [0, 1, 2, 3, 4]
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) == before

    # appends continue after cleanup; replay = checkpoint + new json
    write_delta(
        spark, spark.createDataFrame([(9,)], "id long"), table, mode="append"
    )
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) == before + [9]


def test_delta_checkpoint_partitioned(spark, tmp_path):
    from ariadne_dbt_spark.ingest.delta_reader import (
        delta_checkpoint,
        delta_log_cleanup,
        write_delta,
    )

    table = str(tmp_path / "ckptp")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)], "id long, band string"
    )
    write_delta(spark, df, table, partition_by=["band"])
    delta_checkpoint(table)
    delta_log_cleanup(table)
    back = read_delta(spark, table)
    assert dict(back.dtypes)["band"] == "string"
    assert back.count() == 10
