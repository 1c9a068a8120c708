"""Streaming twins of the batch usage analytics (SURVEY §2.11).

The reference's only streaming-ish surfaces are the append-only
usage/session logs and an (unused in v0.1) manifest file-watcher flag
(reference: schema.sql:167-196, config.py:48). Here both get real
Structured Streaming implementations:

* `usage_daily_stream` — file-source readStream over the usage-log
  parquet dir → watermarked tumbling 1-day windows per tool, reproducing
  usage.py's daily buckets continuously.
* `watch_manifest` — file-source stream over an artifacts drop
  directory; each new manifest triggers a full reindex via foreachBatch
  (full-snapshot refresh is the reference's semantics, so re-running
  AriadneIndex.build per file is exactly right).

Tests drive both with `processAllAvailable()` + a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

USAGE_SCHEMA = (
    "id long, ts timestamp, tool_name string, task_text string, intent string,"
    " focus_model string, pivot_count int, token_estimate int, duration_ms int, dt date"
)


def usage_daily_stream(
    spark: SparkSession,
    log_dir: str,
    *,
    watermark: str = "1 day",
) -> DataFrame:
    """readStream → withWatermark → window(1 day) groupBy tool_name.

    Returns the streaming DataFrame; callers attach a sink
    (`.writeStream.outputMode("append")...`). Late rows beyond the
    watermark are dropped — at scale this bounds state size.
    """
    stream = (
        spark.readStream.schema(USAGE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(log_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "tool_name")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.avg("token_estimate").alias("avg_tokens"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "tool_name",
            "n_calls",
            "avg_tokens",
        )
    )


def run_usage_stream_once(
    spark: SparkSession, log_dir: str, *, query_name: str = "usage_daily"
) -> DataFrame:
    """Drive the stream over everything currently in log_dir and return
    the aggregate as a batch DataFrame (complete-mode memory sink)."""
    agg = usage_daily_stream(spark, log_dir)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def watch_manifests(
    spark: SparkSession,
    drop_dir: str,
    on_manifest,
    *,
    query_name: str = "manifest_watcher",
):
    """File-watcher reindex trigger: every json file that lands in
    ``drop_dir`` is handed (path) to ``on_manifest``. Returns the
    StreamingQuery (caller stops it)."""
    stream = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.json")
        .load(drop_dir)
        .select(F.input_file_name().alias("path"))
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        for r in batch_df.select("path").distinct().collect():
            on_manifest(r.path)

    return (
        stream.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .start()
    )
