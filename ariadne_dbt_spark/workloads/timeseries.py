"""Time-series / usage-analytics operators (SURVEY §2.4 A10-A11, §2.11)
over the `events` table.

The reference's usage analytics (reference: src/ariadne_dbt/usage.py:57-137)
are daily-bucketed groupBys, windowed averages, and top-k rollups over an
append-only telemetry log. Here they run over the synthetic `events`
stream table; the same pipelines are reused by the streaming module
(ariadne_dbt_spark/streaming) with `readStream` + watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events parquet with a tz-normalized ``ts``.

    The driver's generator has emitted ``ts`` as TIMESTAMP(NANOS) (read
    as long + truncated to micros), as instant micros, and as
    TIMESTAMP_NTZ micros across rounds; all three land on the same
    UTC-wall-clock TIMESTAMP here. DuckDB reads the same column as a
    naive timestamp and ``epoch()`` treats it as UTC, so interpreting
    NTZ in the UTC session zone keeps both engines bit-identical."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # session tz is pinned to UTC by every entry point, so this cast
        # reinterprets the wall clock as a UTC instant (no shift)
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# A10: daily buckets per tool/intent → per event_type/day; count + exact sum.
@query(
    "daily_event_stats",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    ORDER BY event_date, event_type
    """,
    survey="A10,A4",
)
def daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("event_date", "event_type")
    )


# Tumbling windows (streaming-shaped agg, run in batch): 6-hour buckets
# aligned to the epoch so Spark's window() and the SQL floor() agree.
@query(
    "tumbling_window_counts",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS window_start_epoch,
           event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start_epoch, event_type
    """,
    survey="A10,streaming-§2.11",
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    # window start exported as epoch seconds: timezone-proof vs the oracle
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("long").alias("window_start_epoch"), "event_type", "n_events")
        .orderBy("window_start_epoch", "event_type")
    )


# Sessionization: gap > 30 min opens a new session (lag + conditional cumsum).
@query(
    "user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         > 1800.0 OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    survey="A10,sessionization",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-precision gap (cast to double seconds) so the 30-minute
    # threshold agrees exactly with the oracle's epoch() arithmetic
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double") > 1800.0),
            1,
        ).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


# Stateful streaming sessionization, EXECUTED AS A STREAM: readStream
# over the events parquet → applyInPandasWithState gap-sessionizer →
# memory sink. The closed-session set is deterministic and
# SQL-expressible: a session closes either because a later event of the
# same user opened a new one (gap > 30 min), or because the final
# event-time watermark (max ts - 1 s) advanced beyond its
# last_ts + 30 min timeout — each user's non-last sessions always close,
# and the last session closes iff its timeout precedes the watermark.
@query(
    "stream_sessionize_closed",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    agg AS (
        SELECT user_id, sid,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid
    ),
    ranked AS (
        SELECT *, MAX(sid) OVER (PARTITION BY user_id) AS last_sid FROM agg
    )
    SELECT user_id,
           epoch_us(session_start) AS start_us,
           epoch_us(session_end) AS end_us,
           CAST(n_events AS INT) AS n_events
    FROM ranked, mx
    WHERE sid < last_sid OR epoch(session_end) + 1800.0 < epoch(m) - 1.0
    ORDER BY user_id, start_us
    """,
    survey="streaming-stateful,§2.11,sessionization",
    doc="Gap-sessionization run as a REAL Structured Streaming query "
    "(applyInPandasWithState, event-time timeout, 1 s watermark) over "
    "the events table; emits each closed session. The oracle derives "
    "the identical closed set from the batch gap-split plus the "
    "watermark-timeout rule, so the stream's state semantics — not "
    "just a batch twin — are hash-checked.",
)
def stream_sessionize_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.streaming.sessionize import run_sessionize_once

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    out = run_sessionize_once(
        spark,
        sf_dir,
        gap_sec=1800,
        path_glob="events.parquet",
        query_name="wl_sessions_closed",
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_start")).alias("start_us"),
        F.unix_micros(F.col("session_end")).alias("end_us"),
        F.col("n_events"),
    ).orderBy("user_id", "start_us")


# Native session windows: Spark's built-in gap-merge operator
# (F.session_window), the declarative sibling of both the lag-based
# user_sessions and the stateful stream_sessionize_closed. Boundary rule
# differs from lag-split: session_window MERGES an event only while
# ts < previous end (= prev_ts + gap), so an exactly-gap-length silence
# SPLITS here (oracle uses >=) where the lag formulation (> gap) merges.
@query(
    "session_window_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800.0
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS start_us,
           epoch_us(MAX(ts)) + 1800000000 AS end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, start_us
    """,
    survey="A10,session-window,§2.11",
    doc="30-minute session windows via Spark's native session_window "
    "merge (window end = last event + gap), hash-checked against the "
    "SQL gap-split derivation.",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
        .orderBy("user_id", "start_us")
    )


# A10 top-k: most active users (deterministic tie-break on user_id).
@query(
    "topk_active_users",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id LIMIT 10
    """,
    survey="A10,O1,O3",
)
def topk_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(10)
    )


# Pivot: event types to columns via conditional aggregation.
@query(
    "event_type_pivot",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY 1 ORDER BY event_date
    """,
    survey="A3,pivot",
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    pivoted = (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves nulls where a bucket is empty; the FILTER oracle yields 0
    cols = ["click", "view", "purchase", "signup", "error"]
    for c in cols:
        pivoted = pivoted.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return pivoted.orderBy("event_date")


# A11: per-entity activity span (sum-of-timing-deltas analog) —
# max/min selection then one subtraction keeps the double deterministic.
@query(
    "user_activity_span",
    oracle="""
    SELECT user_id,
           epoch(MAX(ts)) - epoch(MIN(ts)) AS span_seconds,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id HAVING COUNT(*) > 1 ORDER BY user_id
    """,
    survey="A11",
)
def user_activity_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))).alias(
                "span_seconds"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .where(F.col("n_events") > 1)
        .orderBy("user_id")
    )


# P8: JSON-encoded nested payload extraction — reference stores JSON in TEXT
# columns (schema.sql:19,31-36); events.props is the analog.
@query(
    "json_payload_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
    FROM events GROUP BY 1 ORDER BY k
    """,
    survey="P8",
)
def json_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


# Streaming exact dedup: the at-ingest twin of exact_dedup_groups. The
# kept-row IDENTITY depends on arrival order (any member of a dup group
# may be first-seen), so the oracle checks the arrival-independent
# contract: exactly ONE survivor per distinct fingerprint, every
# fingerprint covered.
@query(
    "stream_dedup_kept",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ),
    fps AS (
        SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM corpus
    )
    SELECT CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_kept,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_fp,
           CAST(COUNT(*) AS BIGINT) AS n_input
    FROM fps
    """,
    survey="dedup-streaming,§2.11",
    doc="Streaming exact dedup via dropDuplicatesWithinWatermark "
    "(bounded fingerprint state): a REAL stream with in-stream clone "
    "injection; kept rows = exactly one survivor per distinct "
    "normalized fingerprint.",
)
def stream_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.streaming.dedup_stream import (
        DEFAULT_CLONE_EVERY,
        run_dedup_stream_once,
    )

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    kept = run_dedup_stream_once(
        spark, table_path(sf_dir, "documents"), query_name="wl_stream_dedup"
    )
    # input size = docs + injected clones, ONE aggregate job; the clone
    # modulus is the operator's own constant so the two can't drift
    # (the oracle SQL's % 10 is the remaining mirror, like every other
    # derived-corpus oracle here)
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    total = docs.agg(
        F.sum(
            F.when(F.col("doc_id") % DEFAULT_CLONE_EVERY == 0, 2).otherwise(1)
        ).alias("n")
    ).first()["n"]
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.countDistinct("fingerprint").alias("n_unique_fp"),
        F.lit(int(total)).cast("bigint").alias("n_input"),
    )


# Rolling trailing-7-row (≈7-day; the calendar is dense at every SF)
# moving aggregate over daily revenue. The frame sums DECIMALs (exact,
# order-independent); only the final avg is ONE double division + round.
@query(
    "rolling_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               SUM(CAST(value AS DECIMAL(18,4))) AS day_total
        FROM events GROUP BY 1
    )
    SELECT event_date,
           CAST(day_total AS DOUBLE) AS day_total,
           CAST(SUM(day_total) OVER w AS DOUBLE) AS trailing_total,
           CAST(COUNT(*) OVER w AS INT) AS n_days,
           ROUND(CAST(SUM(day_total) OVER w AS DOUBLE)
                 / (COUNT(*) OVER w), 6) AS trailing_avg
    FROM daily
    WINDOW w AS (ORDER BY event_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_date
    """,
    survey="A10,rolling-window",
    doc="Trailing moving average over daily revenue: decimal sums inside "
    "the frame (exact, order-independent), one double division rounded "
    "6dp at the end. Single-column global window — at scale this shape "
    "runs per entity key (partitionBy) and stays one shuffle.",
)
def rolling_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("day_total")
    )
    w = Window.orderBy("event_date").rowsBetween(-6, 0)
    return daily.select(
        "event_date",
        F.col("day_total").cast("double").alias("day_total"),
        F.sum("day_total").over(w).cast("double").alias("trailing_total"),
        F.count(F.lit(1)).over(w).cast("int").alias("n_days"),
        F.round(
            F.sum("day_total").over(w).cast("double") / F.count(F.lit(1)).over(w), 6
        ).alias("trailing_avg"),
    ).orderBy("event_date")


# Hopping (sliding) windows: 6-hour window every 3 hours — each event
# lands in exactly two windows. Spark's window(slideDuration) explodes
# the assignment natively; the oracle derives the same two memberships
# as a UNION ALL of shifted floors.
@query(
    "hopping_window_counts",
    oracle="""
    WITH hops AS (
        SELECT CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT) AS window_start_epoch,
               event_type
        FROM events
        UNION ALL
        SELECT CAST((floor(epoch(ts) / 10800) - 1) * 10800 AS BIGINT) AS window_start_epoch,
               event_type
        FROM events
    )
    SELECT window_start_epoch, event_type, COUNT(*) AS n_events
    FROM hops GROUP BY 1, 2
    ORDER BY window_start_epoch, event_type
    """,
    survey="A10,streaming-§2.11,hopping-window",
    doc="Overlapping 6h-window/3h-hop counts per event type (the "
    "trend-smoothing window shape; Spark explodes the two memberships "
    "per event natively via window(slideDuration), the oracle unions "
    "two shifted tumbling floors). Same epoch-seconds export as the "
    "tumbling row — timezone-proof.",
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start_epoch", "event_type")
    )


# Stream-stream event-time join: conversion attribution (purchase within
# 1h of a click, per user) as a REAL two-branch watermarked stream; the
# oracle is the identical batch join, valid because inner stream-stream
# join results are arrival-order independent (watermarks only bound
# state eviction).
@query(
    "stream_click_attribution",
    oracle="""
    SELECT c.user_id,
           COUNT(*) AS n_pairs,
           SUM(CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT)) AS total_gap_seconds
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 3600 SECONDS
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
    survey="streaming-§2.11,stream-stream-join",
    doc="Streaming conversion attribution: stream-stream inner join of "
    "the click and purchase branches of one event stream on user_id "
    "with an inclusive 1h event-time range, both sides watermarked (2h) "
    "so buffered join state is evicted — run as a REAL memory-sink "
    "stream in the gate and aggregated per user against the batch-SQL "
    "oracle.",
)
def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.streaming.join_stream import run_join_stream_once

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    pairs = run_join_stream_once(
        spark, table_path(sf_dir, "events"), query_name="wl_stream_join"
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("gap_seconds").cast("bigint").alias("total_gap_seconds"),
        )
        .orderBy("user_id")
    )


# Ordered funnel: first view → first click AFTER that view → first
# purchase AFTER that click, per user; stage counts + strict-order
# conversion. Each stage's anchor is a MIN over a half-open interval
# anchored at the previous stage — exact timestamp comparisons, no
# windows-of-doubt.
@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        GROUP BY e.user_id
    )
    SELECT 'stage1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL SELECT 'stage2_click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL SELECT 'stage3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
    ORDER BY stage
    """,
    survey="funnel-analysis,A10",
    doc="Strict-order conversion funnel per user (first view, first "
    "click after it, first purchase after that): three cascaded "
    "min-aggregations, each joined to the previous stage's anchors. "
    "Anchor frames are PER-USER aggregates — at billions of users they "
    "must shuffle, so the joins carry no broadcast hint and AQE "
    "promotes them to broadcast only when they fit. The canonical "
    "product-analytics query over the events table.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    import pandas as pd

    counts = [
        ("stage1_view", v.count()),
        ("stage2_click", c.count()),
        ("stage3_purchase", p.count()),
    ]
    return spark.createDataFrame(
        pd.DataFrame(counts, columns=["stage", "n_users"]),
        "stage string, n_users bigint",
    )


# Cohort retention: users grouped by signup date, activity bucketed by
# whole-week offsets from the cohort day — the standard retention
# triangle. Day arithmetic on DATEs only (integer-exact both engines).
@query(
    "cohort_retention_weekly",
    oracle="""
    WITH cohort AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, c.cohort_day,
               date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) // 7 AS week_offset
        FROM events e JOIN cohort c ON c.user_id = e.user_id
        WHERE CAST(e.ts AS DATE) >= c.cohort_day
    )
    SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity GROUP BY 1, 2 ORDER BY cohort_day, week_offset
    """,
    survey="cohort-retention,A10",
    doc="Weekly retention triangle: signup-date cohorts, per-user "
    "distinct active week offsets, counts per (cohort, offset). One "
    "aggregation for cohorts (joined back; per-user frame, so no "
    "broadcast hint — AQE decides), one distinct + count — all integer "
    "DATE arithmetic.",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    cohort = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    activity = (
        ev.join(cohort, "user_id")
        .where(F.to_date("ts") >= F.col("cohort_day"))
        .select(
            "user_id",
            "cohort_day",
            F.expr("datediff(to_date(ts), cohort_day) DIV 7").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", F.col("week_offset").cast("bigint").alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .orderBy("cohort_day", "week_offset")
    )


# SCD Type-2 dimension-history build: collapse each user's event-type
# change stream into validity intervals (gaps-and-islands; ONE shuffle
# on user_id serves the lag window, the run-numbering window, the
# per-run collapse AND the interval-closing lead — see
# operators/asof.py scd2_history). Bounded to every-10th user so the
# full interval output stays suite-sized; epochs exported as exact
# microsecond BIGINTs (hash-safe, timezone-proof).
@query(
    "scd2_user_state_history",
    oracle="""
    WITH runs AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
        WHERE user_id % 10 = 0
    ),
    numbered AS (
        SELECT *, SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
        FROM runs
    ),
    collapsed AS (
        SELECT user_id, version, event_type AS state,
               MIN(ts) AS vf, COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, version, event_type
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, state,
           epoch_us(vf) AS valid_from_us,
           epoch_us(LEAD(vf) OVER (PARTITION BY user_id ORDER BY version)) AS valid_to_us,
           (LEAD(vf) OVER (PARTITION BY user_id ORDER BY version)) IS NULL AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM collapsed
    ORDER BY user_id, version
    """,
    survey="scd2-history,A12,§8.7",
    doc="SCD Type-2 validity intervals from an append-only change "
    "stream (per-user event_type runs): warehouse dimension-history "
    "build as pure gaps-and-islands — lag change-marking, running-sum "
    "run numbering, per-run collapse and interval-closing lead all "
    "reuse one HashPartitioning(user_id) exchange.",
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.asof import scd2_history

    ev = events(spark, sf_dir).where(F.col("user_id") % 10 == 0)
    hist = scd2_history(
        ev, key_col="user_id", attr_col="event_type", ts_col="ts", tiebreak_col="event_id"
    )
    return hist.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
        F.col("n_events").cast("bigint").alias("n_events"),
    ).orderBy("user_id", "version")


# Trailing-window z-score anomaly detection, FLOAT-FREE: the |x - mean|
# > 3*sigma test is cross-multiplied into exact integer arithmetic —
# (n-1)*(n*x - S1)^2 > 9*n*(n*S2 - S1^2) — over day totals held in
# ten-thousandth units (value is quantized to DECIMAL(18,4) first, so
# both engines bucket identically). Spark carries the squares in
# DECIMAL(38,0) (max ~3e27 here, exact); the oracle uses HUGEINT.
# One date-ordered window; n>=8 days of history required.
@query(
    "anomaly_days_zscore",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(SUM(CAST(round(CAST(value AS DECIMAL(18,4)) * 10000) AS BIGINT)) AS HUGEINT) AS x
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT event_date, x,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS s1,
               SUM(x * x) OVER w AS s2
        FROM daily
        WINDOW w AS (ORDER BY event_date ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_date,
           CAST(x AS BIGINT) AS day_total_e4,
           CAST(n AS BIGINT) AS n_prior,
           (n - 1) * (n * x - s1) * (n * x - s1) > 9 * n * (n * s2 - s1 * s1)
               AS is_anomaly
    FROM stats
    WHERE n >= 8
    ORDER BY event_date
    """,
    survey="anomaly-zscore,A10,§8.7",
    doc="Trailing 28-day z-score anomaly flags on daily event value "
    "(|x-mean| > 3 sigma), cross-multiplied into exact integer "
    "decimal arithmetic so the boolean never rides a float rounding "
    "boundary.",
)
def anomaly_days_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    # quantize per event to exact ten-thousandths, THEN sum (identical
    # bucketing to the oracle)
    daily = ev.select(
        F.to_date("ts").alias("event_date"),
        (F.col("value").cast("decimal(18,4)") * 10000).cast("long").alias("xi"),
    ).groupBy("event_date").agg(F.sum("xi").alias("x"))
    return zscore_anomaly_flags(daily)


def zscore_anomaly_flags(
    daily: DataFrame, *, window_days: int = 28, min_history: int = 8, n_sigma: int = 3
) -> DataFrame:
    """Core of ``anomaly_days_zscore``, reusable over any
    ``(event_date, x bigint)`` daily series (x in exact integer units).
    The |x - mean| > n_sigma*sigma test is cross-multiplied to
    (n-1)*(n*x - S1)^2 > n_sigma^2 * n * (n*S2 - S1^2) in DECIMAL(38,0)
    — exact, so the flag never rides a float rounding boundary."""
    from pyspark.sql.window import Window

    w = Window.orderBy("event_date").rowsBetween(-window_days, -1)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = daily.select(
        "event_date",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("s1"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).over(w).alias("s2"),
    ).where(F.col("n") >= min_history)
    lhs = (dec(F.col("n")) - 1) * (dec(F.col("n")) * dec(F.col("x")) - dec(F.col("s1"))) * (
        dec(F.col("n")) * dec(F.col("x")) - dec(F.col("s1"))
    )
    rhs = (n_sigma * n_sigma) * dec(F.col("n")) * (
        dec(F.col("n")) * F.col("s2") - dec(F.col("s1")) * dec(F.col("s1"))
    )
    return stats.select(
        "event_date",
        F.col("x").cast("long").alias("day_total_e4"),
        F.col("n").cast("long").alias("n_prior"),
        (lhs > rhs).alias("is_anomaly"),
    ).orderBy("event_date")


# Incremental SCD2 maintenance, verified against the FULL recompute:
# the first half of each user's stream builds the history table, the
# second half arrives as the nightly batch, scd2_merge applies it —
# and the oracle recomputes SCD2 over the whole stream. Hash equality
# proves merge(history, batch) == rebuild(all events) on every row.
@query(
    "scd2_incremental_merge",
    oracle="""
    WITH runs AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
        WHERE user_id % 10 = 0
    ),
    numbered AS (
        SELECT *, SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
        FROM runs
    ),
    collapsed AS (
        SELECT user_id, version, event_type AS state,
               MIN(ts) AS vf, COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, version, event_type
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, state,
           epoch_us(vf) AS valid_from_us,
           epoch_us(LEAD(vf) OVER (PARTITION BY user_id ORDER BY version)) AS valid_to_us,
           (LEAD(vf) OVER (PARTITION BY user_id ORDER BY version)) IS NULL AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM collapsed
    ORDER BY user_id, version
    """,
    survey="scd2-history,scd2-merge,§8.7",
    doc="Incremental SCD2 merge (nightly-batch maintenance): history "
    "built from each user's first half, second half applied via "
    "scd2_merge — oracle recomputes from the full stream, so the "
    "merge path is proven equal to the rebuild on every interval.",
)
def scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.asof import scd2_history, scd2_merge

    ev = events(spark, sf_dir).where(F.col("user_id") % 10 == 0)
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("double")), F.max(F.col("ts").cast("double"))
    ).first()
    mid = (lo + hi) / 2
    hist = scd2_history(
        ev.where(F.col("ts").cast("double") <= mid),
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    merged = scd2_merge(
        hist,
        ev.where(F.col("ts").cast("double") > mid),
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return merged.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
        F.col("n_events").cast("bigint").alias("n_events"),
    ).orderBy("user_id", "version")


@query(
    "stream_table_upsert",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           event_type AS last_event_type,
           epoch_us(ts) AS last_ts_us,
           event_id AS last_event_id
    FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
    survey="streaming-upsert,managed-table-merge,cdc,§2.11",
    doc="Streaming CDC upsert: a REAL multi-micro-batch AvailableNow "
    "stream over the events table foreachBatch-MERGEs a latest-state "
    "row per user into a managed table, guarded monotonically by "
    "(ts, event_id) so replayed or reordered batches can never revert "
    "newer state (streaming/table_stream.py). The final table must "
    "equal the batch latest-event-per-user — upsert semantics through "
    "the streaming path, hash-checked, independent of the file order "
    "the source listed.",
)
def stream_table_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ariadne_dbt_spark.operators.table_store import read_table, write_table
    from ariadne_dbt_spark.streaming.table_stream import table_upsert_stream

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    schema = "user_id long, event_type string, ts timestamp, event_id long"
    ev = events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    work = tempfile.mkdtemp(prefix="ariadne_upsert_stream_")
    try:
        src = os.path.join(work, "src")
        tdir = os.path.join(work, "state")
        ev.repartition(3).write.parquet(src)
        write_table(spark, spark.createDataFrame([], schema), tdir)
        table_upsert_stream(
            spark, src, tdir, ["user_id"], ["ts", "event_id"], schema=schema
        )
        out = (
            read_table(spark, tdir)
            .select(
                "user_id",
                F.col("event_type").alias("last_event_type"),
                F.unix_micros("ts").alias("last_ts_us"),
                F.col("event_id").alias("last_event_id"),
            )
            .orderBy("user_id")
        )
        # LocalRelation: the temp table dir is deleted below
        return spark.createDataFrame(
            out.toPandas(),
            "user_id bigint, last_event_type string, last_ts_us bigint, "
            "last_event_id bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
