"""Streaming statistics store: per-micro-batch sketch-table appends.

The streaming twin of ``operators/sketches.py`` + ``table_store.py``:
an event stream reduces, batch by batch, to KB-scale sketch rows
(HLL distinct + exact row counts per group) appended to a MANAGED
parquet table — so "distinct users per (type, day), so far" is always
answerable by merging the stored sketches, without ever rescanning or
retaining the raw stream. This is the ingest-time half of the
sketch-table pattern (SCALE.md "Round-9 additions"): the one pass over
the data happens HERE, while it streams; every later question is a
rollup.

Division of labor (same as the other maintainers): Structured
Streaming's file source owns discovery/ordering/exactly-once source
bookkeeping; the sketch build + append runs in ``foreachBatch``.

Replay safety WITHOUT gen machinery: ``foreachBatch`` is
at-least-once on crash-retry, so every appended row carries its batch
``_batch`` id, and the read side drops duplicate ``(group, _batch)``
rows before merging — a replayed append re-writes IDENTICAL sketch
rows (the batch's content is deterministic), so dedup-by-key makes the
table exactly-once for readers with no commit pointer at all. That's
the right-sized mechanism here because sketch rows, unlike index
postings, are tiny and idempotent per batch.

Compaction: appends accumulate one file and G rows per batch; when
``table_report`` fires (file-count leg), ``fold_sketch_stats`` rolls
every CHECKPOINT-COMMITTED batch up to one row per group (HLL union is
lossless, so the fold changes no answer — pinned by test) and commits
it as an epoch flip via the managed-table machinery, folding both the
row count AND the file count. The in-flight batch is never folded
(``max_batch_exclusive``) — folding it before its checkpoint commits
would bake it into the folded row and a crash-replay would
double-count it. Long-running streams bound their own read
amplification, the round-8 auto-compact contract extended to the
stats store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.epoch_store import (
    commit_epoch,
    commit_lock,
    data_dir,
    read_epoch,
    sweep_stale_epochs,
)
from ariadne_dbt_spark.operators.sketches import DEFAULT_LGK, hll_sketch_table
from ariadne_dbt_spark.operators.table_store import (
    DATA_NAME,
    table_report,
)
from ariadne_dbt_spark.operators.epoch_store import ConcurrentWriteError

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _live_dir(table_dir: str) -> str:
    return data_dir(table_dir, DATA_NAME, read_epoch(table_dir))


def read_sketch_stats(
    spark: SparkSession, table_dir: str, group_cols: list[str]
) -> DataFrame:
    """Deduplicate replayed batches and merge to per-group stats:
    ``(group_cols..., n_rows, n_distinct_est)``. Input is the KB-scale
    sketch table — metadata-scale no matter the stream's volume."""
    raw = spark.read.parquet(_live_dir(table_dir))
    deduped = raw.dropDuplicates([*group_cols, "_batch"])
    return (
        deduped.groupBy(*group_cols)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("sketch"), F.lit(False))
            ).alias("n_distinct_est"),
        )
    )


def fold_sketch_stats(
    spark: SparkSession,
    table_dir: str,
    group_cols: list[str],
    *,
    retention_sec: float = 0.0,
    max_batch_exclusive: int | None = None,
) -> dict:
    """Compact the stats table to ONE row per group (lossless: the HLL
    union of per-batch sketches IS the sketch of their union; exact
    counts sum), committed as an epoch flip. Folded rows carry
    ``_batch = -1``.

    ``max_batch_exclusive`` is the replay-safety knob the in-stream
    auto-fold uses: only batches STRICTLY BELOW it are folded; later
    rows pass through unchanged. Without it, folding the just-appended
    batch before its checkpoint commits would bake it into the folded
    row, and a crash-replay of that batch would then double-count —
    AvailableNow runs batches sequentially, so every batch below the
    in-flight id is checkpoint-committed and safe to fold, while the
    in-flight batch's rows stay raw and deduplicate against their
    replay by ``(group, _batch)``."""
    epoch = read_epoch(table_dir)
    live = data_dir(table_dir, DATA_NAME, epoch)
    raw = spark.read.parquet(live)
    deduped = raw.dropDuplicates([*group_cols, "_batch"])
    if max_batch_exclusive is None:
        eligible = deduped
        passthru = deduped.where(F.lit(False))
    else:
        eligible = deduped.where(F.col("_batch") < max_batch_exclusive)
        passthru = deduped.where(F.col("_batch") >= max_batch_exclusive)
    cols = [*group_cols, "n_rows", "sketch", "_batch"]
    folded = (
        eligible.groupBy(*group_cols)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.hll_union_agg(F.col("sketch"), F.lit(False)).alias("sketch"),
        )
        .withColumn("_batch", F.lit(-1).cast("long"))
        .select(*cols)
        .unionByName(passthru.select(*cols))
    )
    staged = data_dir(table_dir, DATA_NAME, epoch + 1)
    folded.coalesce(1).write.mode("overwrite").parquet(staged)
    # count the STAGED copy before the sweep can remove the old epoch's
    # files out from under the folded plan's lazy source
    n_rows_out = spark.read.parquet(staged).count()
    with commit_lock(table_dir):
        now = read_epoch(table_dir)
        if now != epoch:
            raise ConcurrentWriteError(
                f"stats table {table_dir} moved to epoch {now} during fold"
            )
        commit_epoch(table_dir, epoch + 1)
    sweep_stale_epochs(table_dir, [DATA_NAME], epoch + 1, retention_sec=retention_sec)
    return {"folded_epoch": epoch + 1, "rows_out": n_rows_out}


def sketch_stats_ingest_stream(
    spark: SparkSession,
    events_dir: str,
    table_dir: str,
    *,
    group_exprs: list | None = None,
    group_cols: list[str] | None = None,
    value_col: str = "user_id",
    schema: str = EVENTS_SCHEMA,
    lgk: int = DEFAULT_LGK,
    max_files_per_trigger: int = 1,
    auto_fold: bool = True,
    fold_max_files: int = 16,
    fold_retention_sec: float = 0.0,
) -> int:
    """Run the stats-ingest stream to completion (AvailableNow) over the
    parquet files in ``events_dir``: each micro-batch reduces to one
    sketch row per ``(group_cols...)`` present in the batch, appended to
    the managed table at ``table_dir``. Returns the number of batches
    applied. Checkpoint lives under ``table_dir/_checkpoint``; replayed
    batches re-append identical rows, which the read side dedups.

    ``group_exprs`` (parallel to ``group_cols``) lets the grouping be
    derived columns (e.g. ``F.to_date("ts").alias("day")``); default is
    per ``(event_type, day)`` over ``user_id``.
    """
    if group_exprs is None:
        group_exprs = [F.col("event_type"), F.to_date("ts").alias("day")]
        group_cols = ["event_type", "day"]
    if group_cols is None:
        raise ValueError("pass group_cols naming the group_exprs outputs")
    applied: list[int] = []

    def process(batch_df, epoch_id: int) -> None:
        batch = batch_df.select(*group_exprs, F.col(value_col))
        if batch.isEmpty():
            return
        rows = hll_sketch_table(batch, group_cols, value_col, lgk=lgk).withColumn(
            "_batch", F.lit(int(epoch_id)).cast("long")
        )
        rows.coalesce(1).write.mode("append").parquet(_live_dir(table_dir))
        applied.append(1)
        # cadence = FILE COUNT only: sketch rows are KB-scale, so the
        # small-file fraction leg would fire after every append forever
        # — folding per batch instead of per fold_max_files batches
        if (
            auto_fold
            and table_report(
                table_dir, max_files=fold_max_files, small_frac_threshold=1.01
            )["should_optimize"]
        ):
            fold_sketch_stats(
                spark,
                table_dir,
                group_cols,
                retention_sec=fold_retention_sec,
                max_batch_exclusive=int(epoch_id),
            )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(table_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(applied)
