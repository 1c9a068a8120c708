"""Stream-stream event-time join (attribution at ingest).

The batch as-of/range joins (operators/asof.py) answer "which click
preceded this purchase" over landed data; the streaming twin answers it
CONTINUOUSLY: two live event streams, inner-joined on the entity key
with an event-time range predicate, both sides watermarked so the join
state (buffered unmatched rows) is evicted once the watermark passes the
range bound — the only viable shape at 100 TB/day event volume, where
unbounded join state would grow with the full history.

Spark executes this natively (Structured Streaming stream-stream inner
join): matched pairs emit as soon as both sides arrive; the watermark
exists purely to bound state, so results are arrival-order independent —
which is exactly what lets the gate pin a REAL multi-micro-batch run
against a plain batch-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["click_purchase_pairs_stream", "run_join_stream_once"]


def _normalize_ts(df: DataFrame) -> DataFrame:
    """The events table has shipped as TIMESTAMP(NANOS)->bigint,
    instant micros AND TIMESTAMP_NTZ across driver rounds; normalize to
    a UTC timestamp exactly like workloads.timeseries.events()."""
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def click_purchase_pairs_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    path_glob: str | None = None,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """clicks ⋈ purchases per user with ``click_ts <= purchase_ts <=
    click_ts + window_seconds`` (inclusive both ends, mirroring the SQL
    oracle's BETWEEN) — the conversion-attribution join.

    Both inputs are branches of ONE file stream (filtered by
    event_type), each with its own event-time watermark; the range
    predicate gives Spark the bound it needs to evict buffered state.
    Returns the streaming frame of ``(user_id, click_id, purchase_id,
    gap_seconds)`` pairs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static_reader = spark.read
    if path_glob is not None:
        # schema must come from the SAME leaf files the stream will read
        # (the parent dir may hold other tables)
        static_reader = static_reader.option("pathGlobFilter", path_glob)
    static = static_reader.parquet(events_dir)
    reader = spark.readStream.schema(static.schema).option("maxFilesPerTrigger", 1)
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    ev = _normalize_ts(reader.parquet(events_dir))
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long")).alias(
            "gap_seconds"
        ),
    )


def run_join_stream_once(
    spark: SparkSession,
    events_path: str,
    *,
    query_name: str = "stream_join_pairs",
    window_seconds: int = 3600,
) -> DataFrame:
    """Drive the attribution join over everything currently at
    ``events_path`` (memory sink) and return the pairs as a batch frame.
    Single-file tables are read as parent-dir + exact-leaf glob (the
    file-stream source requires a directory; see dedup_stream)."""
    import os

    path_glob = None
    if os.path.isfile(events_path):
        events_path, path_glob = os.path.split(events_path)
    out = click_purchase_pairs_stream(
        spark, events_path, path_glob=path_glob, window_seconds=window_seconds
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
