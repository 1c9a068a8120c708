"""Streaming upsert into a managed table: foreachBatch → MERGE, made
exactly-once by IDEMPOTENCE rather than by transaction logs.

The pattern (Delta's canonical "streaming CDC upsert"): each micro-batch
is reduced to one row per key (latest by an ordering column), then
merged into the managed table with the matched clause GUARDED by that
same ordering — ``s.<order_col> >= t.<order_col>``. Two failure modes
this closes:

* **Replay.** foreachBatch is at-least-once: after a crash the last
  batch re-runs. Re-merging the same rows re-applies identical values
  (``>=`` lets the equal-version row win, writing what is already
  there), so the table converges to the same state.
* **Reorder / late replay.** If an OLD batch replays after newer data
  committed (multiple recoveries, or an operator manually re-running a
  window), the guard makes stale rows LOSE to the newer table rows
  instead of silently reverting them — the monotonicity unconditional
  upsert lacks.

100 TB shape: each micro-batch pays merge_table's COW cost —
O(batch + touched files) with footer pruning carrying the rest as hard
links (operators/table_store.py). Keep the table OPTIMIZE-clustered on
the key between windows and the touched set stays batch-proportional.
The per-merge epoch flip also gives the stream's consumers the same
read-consistency and time-travel contract batch writers get.

Reference parity: none — §8 scale extension (the reference has no
streaming surface; its tables rebuild wholesale,
``src/ariadne_dbt/indexer.py:472-485``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["latest_per_key", "upsert_batch", "table_upsert_stream"]


def latest_per_key(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key: the maximum of ``order_cols`` (lexicographic,
    descending row_number) — the deterministic batch-side reducer that
    makes the merge's unique-source-key contract hold. ``order_cols``
    must be a total order within a key (e.g. ``[ts, event_id]`` with a
    unique id as tiebreak) or the survivor is plan-dependent."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_batch(
    spark: SparkSession,
    table_dir: str,
    batch_df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    *,
    retention_sec: float = 0.0,
) -> dict:
    """Merge one (micro-)batch into the managed table, monotonically by
    ``order_cols``: the batch is reduced to its latest row per key, and
    the matched update only fires when the source is at least as new as
    the target row (NULL target order counts as older). Safe to call
    again with the same or an older batch — see module docstring."""
    from ariadne_dbt_spark.operators.table_store import merge_table

    src = latest_per_key(batch_df, keys, order_cols)
    # (s.o1, s.o2, ...) >= (t.o1, t.o2, ...) lexicographically, built
    # right-to-left: ge_i = s_i > t_i  OR  (s_i == t_i AND ge_{i+1}),
    # with all-equal ⇒ true (the replay case: the same row wins and
    # rewrites its own values). A NULL target order column counts as
    # older than any source value; a NULL source loses (merge coalesces
    # a NULL condition to false).
    ge = F.lit(True)
    for c in reversed(order_cols):
        s, t = F.col(f"s.{c}"), F.col(f"t.{c}")
        gt = (s > t) | (t.isNull() & s.isNotNull())
        ge = gt | (s.eqNullSafe(t) & ge)
    return merge_table(
        spark,
        table_dir,
        src,
        keys,
        when_matched="update",
        when_not_matched="insert",
        when_matched_condition=ge,
        retention_sec=retention_sec,
    )


def table_upsert_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    keys: list[str],
    order_cols: list[str],
    *,
    schema: str,
    max_files_per_trigger: int = 1,
    retention_sec: float = 0.0,
    auto_optimize: bool = True,
    optimize_max_files: int | None = None,
    optimize_target_file_mb: int | None = None,
    follow_views: list[str] | None = None,
) -> int:
    """Run the upsert stream to completion (AvailableNow) over the
    parquet files in ``source_dir``: each micro-batch is merged into
    the managed table keyed by ``keys``, latest-wins by ``order_cols``.
    Returns the number of non-empty batches merged. Checkpoint lives
    under ``table_dir/_upsert_checkpoint``.

    ``auto_optimize`` (round 10, the table twin of the index streams'
    ``auto_compact``): after each merged batch the metadata-only
    ``table_report`` runs, and when it fires (live files >=
    ``optimize_max_files``, or a small-file majority) the stream
    OPTIMIZEs its own table CLUSTERED ON THE MERGE KEYS — which is what
    keeps the NEXT merges' footer prune tight, so the per-batch COW
    cost stays O(batch + touched files) for the stream's whole life
    instead of degrading as each epoch flip sprays new small files.
    Every knob defaults to ``table_report``'s; compaction commits
    through the same epoch protocol as the merges, so a reader never
    sees a half-optimized table and the stream's crash-replay story is
    unchanged.

    ``follow_views`` (round 10): view dirs built by
    ``incremental_view.build_agg_view`` over THIS table — each is
    refreshed after EVERY commit the stream makes (the merge, and the
    auto-optimize when it fires), so the whole chain — stream → table →
    aggregate — is incremental end to end, each refresh folding exactly
    one commit's change rows. Refreshing per commit is also what makes
    ``retention_sec=0`` safe: the log a refresh needs always lives in
    the CURRENT epoch dir, never a swept one. Enable the change feed on
    the table before streaming or every refresh pays the diff path."""
    from ariadne_dbt_spark.operators.table_store import optimize_table, table_report

    applied: list[int] = []
    report_kw: dict = {}
    if optimize_max_files is not None:
        report_kw["max_files"] = optimize_max_files
    if optimize_target_file_mb is not None:
        report_kw["target_file_mb"] = optimize_target_file_mb

    def refresh_views() -> None:
        if not follow_views:
            return
        from ariadne_dbt_spark.operators.incremental_view import refresh_agg_view

        for vdir in follow_views:
            refresh_agg_view(spark, vdir, retention_sec=retention_sec)

    def process(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_batch(
            spark, table_dir, batch_df, keys, order_cols, retention_sec=retention_sec
        )
        applied.append(1)
        refresh_views()
        if auto_optimize and table_report(table_dir, **report_kw)["should_optimize"]:
            optimize_table(
                spark,
                table_dir,
                retention_sec=retention_sec,
                cluster_by=keys,
                **({"target_file_mb": optimize_target_file_mb}
                   if optimize_target_file_mb is not None else {}),
            )
            # advance the cursors past the row-preserving optimize
            # epoch while its dir is still current (retention-0 safety)
            refresh_views()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(table_dir, "_upsert_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(applied)
