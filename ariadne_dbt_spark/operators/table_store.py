"""Managed parquet tables: crash-safe OPTIMIZE (small-file compaction +
range clustering) on a plain directory, via the same epoch-pointer
machinery the serving indexes use (operators/epoch_store.py).

The 100 TB problem this solves: long-lived fact tables accumulate
small files — micro-batch appends, per-task outputs, incremental dbt
runs — until SCAN PLANNING (listing + footer reads + per-file task
setup) dominates query time long before data volume does. The classic
fix is Delta/Iceberg's ``OPTIMIZE``: rewrite the live files into
~target-size files, optionally clustered on a key so parquet min/max
footers enable file skipping, committed atomically so readers never
see a half-rewritten table.

This module is that operation for plain parquet directories:

* **Layout.** ``table_dir/epoch.json`` + data dirs ``t`` (epoch 0 —
  so any pre-existing flat directory IS a valid managed table) /
  ``t_ep<k>``. Readers resolve through the pointer; the flip is one
  atomic ``os.replace`` (``commit_epoch``).
* **Crash safety.** The rewrite lands in the NEXT epoch's directory
  with ``mode="overwrite"`` — a crashed attempt leaves garbage that
  the retry simply overwrites and the sweeper GCs; the committed
  epoch is untouched until the pointer flips under ``commit_lock``
  (a concurrent second optimizer raises ``ConcurrentWriteError``
  instead of silently clobbering).
* **Concurrent readers.** ``retention_sec`` keeps retired epoch dirs
  alive after the flip (stamped retirement, ``sweep_stale_epochs``) so
  a cross-process reader that planned against the old epoch finishes
  its scan — the vacuum contract the index stores already honor.
* **Clustering.** ``cluster_by`` range-partitions and sorts the
  rewrite on the given keys: each output file covers a narrow key
  range, so parquet row-group/file min-max statistics turn point and
  range predicates into file skips. This is the single-dimension
  (and multi-key lexicographic) version of what Delta calls Z-ORDER;
  at 1000 executors the range exchange is one shuffle of the table —
  the price of every future scan pruning to O(matching files).

Sizing is measured, not guessed: ``table_report`` reads ONLY file
sizes + footers (no Spark job) and recommends compaction exactly like
the index ``maintenance_report`` does, so cadence is a measured knob
here too.

Relation to ``operators/layout.py compact_parquet``: that pass rewrites
a directory IN PLACE behind a tmp/old dir swap — fine for a
single-process streaming sink compacting its own output between
batches, but the swap has a two-rename window, no concurrent-writer
guard, and no reader retention. This module is the MANAGED upgrade for
tables with independent readers/writers: pointer-resolved reads, one
atomic commit, ``commit_lock`` against racing optimizers, vacuum
retention — the same guarantees ladder the serving indexes climbed
from wholesale rebuild to epoch flips. ``cluster_by`` composes with
``layout.zorder_write`` the same way Delta's OPTIMIZE composes with
ZORDER: z-write INTO a managed table dir, then keep it compacted here.

Reference parity: none — the reference rebuilds its tables wholesale
(``src/ariadne_dbt/indexer.py:472-485``); this is a §8 scale extension.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

from ariadne_dbt_spark.operators.epoch_store import (
    commit_epoch,
    commit_lock,
    data_dir,
    read_epoch,
    sweep_stale_epochs,
    _walk_parquet,
)

__all__ = [
    "DATA_NAME",
    "read_table",
    "write_table",
    "table_report",
    "table_history",
    "optimize_table",
]

#: the single logical data-dir name a managed table owns
DATA_NAME = "t"

#: OPTIMIZE defaults: files this far under target count as "small";
#: the report fires on file count or small-file fraction
DEFAULT_TARGET_FILE_MB = 128
SMALL_FILE_FRAC = 0.5
MAX_LIVE_FILES = 64


def _resolve(table_dir: str) -> str:
    return data_dir(table_dir, DATA_NAME, read_epoch(table_dir))


def read_table(
    spark: SparkSession, table_dir: str, *, epoch: int | None = None
) -> DataFrame:
    """Read the table through the epoch pointer; ``epoch=`` pins a
    specific version instead (time travel) — readable for as long as
    OPTIMIZE's ``retention_sec`` keeps the retired dir (see
    :func:`table_history` for what is on disk). A swept epoch raises
    ``FileNotFoundError`` rather than silently reading the current
    one."""
    if epoch is None:
        return spark.read.parquet(_resolve(table_dir))
    path = data_dir(table_dir, DATA_NAME, epoch)
    # the > current guard matters as much as the isdir one: a crashed
    # or in-flight optimize leaves a STAGED t_ep<current+1> dir whose
    # partial part-files would otherwise read as a "version"
    if epoch > read_epoch(table_dir) or not os.path.isdir(path):
        raise FileNotFoundError(
            f"epoch {epoch} of {table_dir} is not a committed version "
            f"on disk (swept, never committed, or an in-flight staging "
            f"dir); retained epochs: "
            f"{[h['epoch'] for h in table_history(table_dir)]}"
        )
    return spark.read.parquet(path)


def table_history(table_dir: str) -> list[dict]:
    """Epochs still on disk, oldest first — metadata only: per epoch
    the file count, byte size, whether it is the pointer's CURRENT
    version, and the retirement timestamp (from the ``_retired.json``
    stamp vacuum retention ages by; None while current or when the
    sweeper hasn't visited yet). The managed-table face of the epoch
    machinery's retention contract: what ``read_table(epoch=)`` can
    still time-travel to, and when each version will become sweepable.
    """
    from ariadne_dbt_spark.operators.epoch_store import _read_retired_at

    current = read_epoch(table_dir)
    out = []
    if not os.path.isdir(table_dir):
        return out
    for entry in sorted(os.listdir(table_dir)):
        if entry == DATA_NAME:
            ep = 0
        elif entry.startswith(f"{DATA_NAME}_ep"):
            suffix = entry[len(DATA_NAME) + 3 :]
            if not suffix.isdigit():
                continue
            ep = int(suffix)
        else:
            continue
        path = os.path.join(table_dir, entry)
        if not os.path.isdir(path) or ep > current:
            # > current is a crashed/in-flight optimize's staging dir,
            # not a version
            continue
        files = _walk_parquet(path)
        out.append(
            {
                "epoch": ep,
                "n_files": len(files),
                "total_bytes": sum(os.path.getsize(p) for p in files),
                "is_current": ep == current,
                "retired_at": None
                if ep == current
                else _read_retired_at(os.path.join(path, "_retired.json")),
            }
        )
    out.sort(key=lambda h: h["epoch"])
    return out


def write_table(spark: SparkSession, df: DataFrame, table_dir: str) -> str:
    """(Re)write the table's CURRENT epoch dir wholesale — the initial
    load path. Returns the data dir written."""
    dest = _resolve(table_dir)
    df.write.mode("overwrite").parquet(dest)
    return dest


def table_report(
    table_dir: str,
    *,
    target_file_mb: int = DEFAULT_TARGET_FILE_MB,
    max_files: int = MAX_LIVE_FILES,
    small_frac_threshold: float = SMALL_FILE_FRAC,
) -> dict:
    """Measured should-I-OPTIMIZE signal — metadata only (directory
    listing; no Spark job, no footer data pages). ``should_optimize``
    fires when the live dir exceeds ``max_files`` files or more than
    ``small_frac_threshold`` of files are under half the target size
    (the Delta OPTIMIZE heuristic), with ``reasons`` naming which."""
    live = _resolve(table_dir)
    files = _walk_parquet(live) if os.path.isdir(live) else []
    sizes = [os.path.getsize(p) for p in files]
    total = sum(sizes)
    small = sum(1 for s in sizes if s < target_file_mb * (1 << 20) / 2)
    small_frac = small / len(sizes) if sizes else 0.0
    reasons = []
    if len(sizes) >= max_files:
        reasons.append(f"{len(sizes)} live files >= {max_files}")
    if len(sizes) > 1 and small_frac >= small_frac_threshold:
        reasons.append(
            f"{small}/{len(sizes)} files under {target_file_mb // 2} MB "
            f"({small_frac:.0%}) >= {small_frac_threshold:.0%}"
        )
    return {
        "epoch": read_epoch(table_dir),
        "n_files": len(sizes),
        "total_bytes": total,
        "small_files": small,
        "small_frac": round(small_frac, 6),
        "target_files": max(1, math.ceil(total / (target_file_mb * (1 << 20)))),
        "should_optimize": bool(reasons),
        "reasons": reasons,
    }


def optimize_table(
    spark: SparkSession,
    table_dir: str,
    *,
    target_file_mb: int = DEFAULT_TARGET_FILE_MB,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    zorder_bits: int = 8,
    retention_sec: float = 0.0,
) -> dict:
    """Compact the table into ~``target_file_mb`` files (optionally
    range-clustered on ``cluster_by``, or Z-ORDERED on ``zorder_by``),
    committed as an atomic epoch flip. Returns the pre-rewrite report
    plus the new epoch.

    Steps — every one crash-safe:

    1. measure (``table_report``) → target output file count;
    2. rewrite the live data into ``t_ep<epoch+1>`` with
       ``mode="overwrite"`` (a crashed prior attempt is overwritten);
       plain ``coalesce`` when unclustered — a narrowing, shuffle-free
       plan — or ``repartitionByRange + sortWithinPartitions`` when
       clustering (one range exchange; sampled bounds keep outputs
       even-sized even on skewed keys);
    3. flip the pointer under ``commit_lock`` (re-reading the epoch
       inside the lock: a concurrent optimizer that committed first
       makes this attempt raise ``ConcurrentWriteError`` rather than
       resurrect overwritten data);
    4. sweep retired epochs, honoring ``retention_sec`` for
       cross-process readers.

    ``zorder_by`` (mutually exclusive with ``cluster_by``) is Delta's
    ``OPTIMIZE ... ZORDER BY``: quantile-bucketize each key to
    ``zorder_bits`` bits (one ``approxQuantile`` pass — NUMERIC keys
    only, like ``layout.zorder_write`` it delegates to), Morton-
    interleave JVM-side, range-partition + sort on the z-value — so
    min/max footer stats stay tight on EVERY listed column and a
    filter on any one of them skips files, where lexicographic
    ``cluster_by`` prunes only its leading key.
    """
    if cluster_by and zorder_by:
        raise ValueError("pass cluster_by OR zorder_by, not both")
    report = table_report(table_dir, target_file_mb=target_file_mb)
    epoch = report["epoch"]
    live = data_dir(table_dir, DATA_NAME, epoch)
    if not os.path.isdir(live):
        raise FileNotFoundError(f"no table data at {live}")
    n_out = report["target_files"]

    df = spark.read.parquet(live)
    if zorder_by:
        from ariadne_dbt_spark.operators.layout import zorder_frame

        out, _zmeta = zorder_frame(
            df, list(zorder_by), bits=zorder_bits, n_files=n_out
        )
    elif cluster_by:
        out = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.coalesce(n_out)
    staged = data_dir(table_dir, DATA_NAME, epoch + 1)
    out.write.mode("overwrite").parquet(staged)

    with commit_lock(table_dir):
        from ariadne_dbt_spark.operators.epoch_store import ConcurrentWriteError

        now = read_epoch(table_dir)
        if now != epoch:
            raise ConcurrentWriteError(
                f"table {table_dir} moved to epoch {now} during optimize "
                f"(started at {epoch}); re-run against the new epoch"
            )
        commit_epoch(table_dir, epoch + 1)
    sweep_stale_epochs(
        table_dir, [DATA_NAME], epoch + 1, retention_sec=retention_sec
    )
    return {
        **report,
        "new_epoch": epoch + 1,
        "clustered_by": cluster_by or [],
        "zordered_by": list(zorder_by) if zorder_by else [],
    }
