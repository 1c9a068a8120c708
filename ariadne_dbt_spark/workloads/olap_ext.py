"""Extended OLAP workloads beyond the reference's inventory: as-of join,
range join, rollup/cube/grouping-sets — the operators a training-data
pipeline borrows from time-series/OLAP engines, each with a SQL oracle
(DuckDB has native ASOF JOIN / ROLLUP / CUBE to verify against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.asof import asof_join, range_join
from ariadne_dbt_spark.workloads import query
from ariadne_dbt_spark.workloads.timeseries import events


@query(
    "asof_click_before_purchase",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    clicks AS (
        SELECT event_id AS click_event_id, user_id, ts, value FROM events
        WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           c.click_event_id AS click_event_id_right,
           epoch(p.ts) - epoch(c.ts) AS gap_seconds
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    survey="asof-join",
    doc="As-of join: each purchase matched to the user's latest preceding "
    "click (union+window encoding vs DuckDB's native ASOF JOIN).",
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_event_id", "ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "click_event_id_right",
        (F.col("ts").cast("double") - F.col("ts_right").cast("double")).alias("gap_seconds"),
    ).orderBy("event_id")


@query(
    "range_join_value_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 25.0), ('mid', 25.0, 60.0),
               ('high', 60.0, 90.0), ('extreme', 85.0, 100.0)
    )
    SELECT b.band, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi
    GROUP BY b.band ORDER BY b.band
    """,
    survey="range-join",
    doc="Range (interval containment) join via bucketized equi-join; "
    "overlapping bands prove the containment semantics.",
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 25.0, 60.0), ("high", 60.0, 90.0), ("extreme", 85.0, 100.0)],
        "band string, lo double, hi double",
    )
    joined = range_join(
        ev, bands, point_col="value", lo_col="lo", hi_col="hi", bucket_width=10.0
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("band")
    )


@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    survey="rollup",
    doc="Hierarchical subtotals via ROLLUP (status → priority → grand total).",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "cube_events",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date, COUNT(*) AS n
    FROM events
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    ORDER BY event_type NULLS FIRST, event_date NULLS FIRST
    """,
    survey="cube",
    doc="Full cross-dimensional subtotals via CUBE.",
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
    return (
        ev.cube("event_type", "event_date")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("event_type").asc_nulls_first(), F.col("event_date").asc_nulls_first())
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    survey="grouping-sets",
    doc="Explicit grouping sets (per-status and per-priority marginals).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


# Sketch + order-statistics aggregates: exact interpolated percentiles
# (cross-engine checkable) and HyperLogLog approximate distinct pinned by
# an error-bound invariant (the sketch itself is engine-private, its
# accuracy contract is not).
@query(
    "sketch_aggregates",
    oracle="""
    SELECT ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99,
           COUNT(DISTINCT user_id) AS n_exact_distinct,
           TRUE AS hll_within_5pct
    FROM events
    """,
    survey="percentiles,approx-distinct,A4",
    doc="Exact interpolated value percentiles (Spark percentile == "
    "DuckDB quantile_cont) + approx_count_distinct bounded within 5% of "
    "the exact distinct count.",
)
def sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    row = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
        F.countDistinct("user_id").alias("nd"),
        # rsd is a STANDARD DEVIATION, not a bound: at the default 0.05 a
        # >5% error is a ~1σ event (observed at sf0.1). rsd=0.01 makes the
        # asserted 5% envelope a 5σ margin — stable at every SF.
        F.approx_count_distinct("user_id", 0.01).alias("hll"),
    ).first()
    ok = abs(row["hll"] - row["nd"]) / row["nd"] <= 0.05
    return spark.createDataFrame(
        [(round(row["p50"], 4), round(row["p90"], 4), round(row["p99"], 4), row["nd"], ok)],
        "p50 double, p90 double, p99 double, n_exact_distinct bigint, hll_within_5pct boolean",
    )


# dbt-style profiler over orders: the "describe this source" query.
# Every metric is exact (counts / lexicographic min-max on the string
# cast), so the tall report hashes identically.
@query(
    "profile_orders_table",
    oracle="""
    WITH w AS (
        SELECT
            SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS ck_nulls,
            COUNT(DISTINCT o_custkey) AS ck_distinct,
            MIN(CAST(o_custkey AS VARCHAR)) AS ck_min,
            MAX(CAST(o_custkey AS VARCHAR)) AS ck_max,
            SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS st_nulls,
            COUNT(DISTINCT o_orderstatus) AS st_distinct,
            MIN(CAST(o_orderstatus AS VARCHAR)) AS st_min,
            MAX(CAST(o_orderstatus AS VARCHAR)) AS st_max,
            SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS pr_nulls,
            COUNT(DISTINCT o_orderpriority) AS pr_distinct,
            MIN(CAST(o_orderpriority AS VARCHAR)) AS pr_min,
            MAX(CAST(o_orderpriority AS VARCHAR)) AS pr_max
        FROM orders
    )
    SELECT 'o_custkey' AS col_name, 'n_nulls' AS metric, CAST(ck_nulls AS VARCHAR) AS value FROM w
    UNION ALL SELECT 'o_custkey', 'n_distinct', CAST(ck_distinct AS VARCHAR) FROM w
    UNION ALL SELECT 'o_custkey', 'min', ck_min FROM w
    UNION ALL SELECT 'o_custkey', 'max', ck_max FROM w
    UNION ALL SELECT 'o_orderstatus', 'n_nulls', CAST(st_nulls AS VARCHAR) FROM w
    UNION ALL SELECT 'o_orderstatus', 'n_distinct', CAST(st_distinct AS VARCHAR) FROM w
    UNION ALL SELECT 'o_orderstatus', 'min', st_min FROM w
    UNION ALL SELECT 'o_orderstatus', 'max', st_max FROM w
    UNION ALL SELECT 'o_orderpriority', 'n_nulls', CAST(pr_nulls AS VARCHAR) FROM w
    UNION ALL SELECT 'o_orderpriority', 'n_distinct', CAST(pr_distinct AS VARCHAR) FROM w
    UNION ALL SELECT 'o_orderpriority', 'min', pr_min FROM w
    UNION ALL SELECT 'o_orderpriority', 'max', pr_max FROM w
    ORDER BY col_name, metric
    """,
    survey="table-profiler,A4",
    doc="Per-column profile (null count, exact distinct, stringified "
    "min/max) of orders in ONE fused aggregation pass — the dbt-style "
    "'describe this source' report, unpivoted driver-side from the "
    "1-row wide aggregate.",
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.patterns import profile_table
    from ariadne_dbt_spark.session import table_path

    orders = spark.read.parquet(table_path(sf_dir, "orders"))
    return (
        profile_table(orders, ["o_custkey", "o_orderstatus", "o_orderpriority"])
        .withColumnRenamed("column", "col_name")
        .orderBy("col_name", "metric")
    )


# Mergeable sketch tables (round 9): the 100 TB statistics-store
# pattern. The corpus is scanned ONCE into a per-(type, day) sketch
# table; every later distinct-count rollup merges KB-scale sketches
# instead of rescanning raw data. The sketch bytes are engine-private,
# so the oracle pins the exact counts plus the accuracy contract
# (booleans), the same recipe sketch_aggregates uses.
@query(
    "sketch_partitioned_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_exact_distinct,
           TRUE AS hll_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    survey="sketch-tables,approx-distinct,A10",
    doc="Per-(event_type, day) HLL sketch table on user_id rolled up to "
    "event_type by LOSSLESS sketch union (hll_union_agg) — no raw "
    "rescan; estimate pinned within 5% of the exact distinct (lgK=12 "
    "is 0.8% relative std error, so 5% is a >6 sigma envelope).",
)
def sketch_partitioned_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sketches import hll_rollup, hll_sketch_table

    ev = events(spark, sf_dir).select("event_type", F.to_date("ts").alias("day"), "user_id")
    table = hll_sketch_table(ev, ["event_type", "day"], "user_id")
    rolled = hll_rollup(table, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_distinct")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "n_rows",
            "n_exact_distinct",
            (
                F.abs(F.col("n_distinct_est") - F.col("n_exact_distinct"))
                <= 0.05 * F.col("n_exact_distinct")
            ).alias("hll_within_5pct"),
        )
        .orderBy("event_type")
    )


@query(
    "cms_heavy_hitters",
    oracle="""
    SELECT user_id, COUNT(*) AS exact_cnt,
           TRUE AS est_ge_exact, TRUE AS est_within_eps
    FROM events GROUP BY user_id
    ORDER BY exact_cnt DESC, user_id LIMIT 5
    """,
    survey="sketch-tables,heavy-hitters,A3",
    doc="Per-day Count-Min sketch table on user_id merged across days "
    "(NumPy cell-wise add of Spark's V1 payloads — byte-identical to "
    "the monolithic sketch, pinned in tests/test_sketches.py); top-5 "
    "heavy-hitter frequencies estimated from the MERGED sketch and "
    "pinned against exact counts: never under, over by <= eps*N.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sketches import (
        cms_rollup_estimates,
        cms_sketch_table,
    )

    eps = 0.001
    ev = events(spark, sf_dir).select(F.to_date("ts").alias("day"), "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # top-5 ids: 5 driver-side values (metadata-scale), deterministic
    # tie-break so Spark and the oracle select the identical set
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("user_id")).limit(5).collect()
    items = [int(r["user_id"]) for r in top]
    n_total = ev.count()

    table = cms_sketch_table(
        ev, ["day"], "user_id", eps=eps, confidence=0.999, seed=11
    )
    ests = cms_rollup_estimates(table, [], items, spark)
    return (
        ests.withColumnRenamed("item", "user_id")
        .join(exact, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            (F.col("freq_est") >= F.col("exact_cnt")).alias("est_ge_exact"),
            (F.col("freq_est") - F.col("exact_cnt") <= eps * n_total).alias(
                "est_within_eps"
            ),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    )


@query(
    "sketch_quantile_rollup",
    oracle="""
    WITH h AS (
        SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, cents, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n_rows
        FROM h
    ),
    p AS (SELECT CAST(UNNEST([0.5, 0.9, 0.99]) AS DOUBLE) AS p)
    SELECT c.event_type, p.p AS p, c.cents AS q,
           CAST(c.n_rows AS BIGINT) AS n_rows
    FROM c CROSS JOIN p
    WHERE c.cum >= GREATEST(CAST(CEIL(p.p * c.n_rows) AS BIGINT), 1)
      AND c.cum - c.cnt < GREATEST(CAST(CEIL(p.p * c.n_rows) AS BIGINT), 1)
    ORDER BY event_type, p
    """,
    survey="sketch-tables,percentiles,A10",
    doc="Per-(event_type, day) value-histogram sketch table over "
    "floor-to-cents event values, merged LOSSLESSLY to event_type "
    "(SUM(cnt) — the histogram of a union is the sum of histograms) and "
    "read out as exact discrete p50/p90/p99 via rank selection over "
    "DISTINCT values. Unlike the HLL/CMS rows this oracle pins the "
    "quantiles VALUE-exactly: histogram merge loses nothing on a "
    "quantized domain, which is the whole point of the third sketch "
    "table (order statistics without rescanning raw data, window "
    "buffers bounded by distinct values — the perplexity_buckets / "
    "report-card posture as a persistable table).",
)
def sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram_table,
    )

    ev = events(spark, sf_dir).select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    table = value_histogram_table(ev, ["event_type", "day"], "cents")
    return (
        histogram_quantiles(table, ["event_type"], [0.5, 0.9, 0.99])
        .select("event_type", "p", "q", "n_rows")
        .orderBy("event_type", "p")
    )


@query(
    "kmv_set_overlap",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS exact_inter
        FROM du a JOIN du b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    ),
    card AS (SELECT event_type, COUNT(*) AS nd FROM du GROUP BY 1)
    SELECT p.type_a, p.type_b,
           ca.nd + cb.nd - p.exact_inter AS exact_union,
           p.exact_inter,
           TRUE AS union_within_10pct,
           TRUE AS jaccard_within_abs_10,
           TRUE AS inter_within_25pct
    FROM pairs p
    JOIN card ca ON ca.event_type = p.type_a
    JOIN card cb ON cb.event_type = p.type_b
    ORDER BY type_a, type_b
    """,
    survey="sketch-tables,set-overlap,A5",
    doc="KMV (bottom-k) sketch table per event_type over user_id; "
    "pairwise union/Jaccard/intersection estimated PURELY from the "
    "KB-scale sketches (JVM array HOFs — no rescan, no set join) and "
    "pinned against the exact overlaps: union within 10%, Jaccard "
    "within 0.1 absolute, intersection within 25% (k=1024, RSE~3%; "
    "the envelopes are multi-sigma). The capability HLL cannot give: "
    "set INTERSECTION without touching raw data twice.",
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sketches import (
        kmv_pairwise_overlap,
        kmv_sketch_table,
    )

    k = 1024
    ev = events(spark, sf_dir).select("event_type", "user_id")
    table = kmv_sketch_table(ev, ["event_type"], "user_id", k=k)
    est = kmv_pairwise_overlap(table, ["event_type"], k=k).select(
        F.col("a_event_type").alias("type_a"),
        F.col("b_event_type").alias("type_b"),
        "union_est",
        "jaccard_est",
        "intersection_est",
    )

    du = ev.distinct()
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    card = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    exact = (
        inter.join(card.withColumnRenamed("event_type", "type_a"), "type_a")
        .withColumnRenamed("nd", "nd_a")
        .join(card.withColumnRenamed("event_type", "type_b"), "type_b")
        .withColumnRenamed("nd", "nd_b")
        .select(
            "type_a",
            "type_b",
            (F.col("nd_a") + F.col("nd_b") - F.col("exact_inter")).alias(
                "exact_union"
            ),
            "exact_inter",
        )
    )
    j_exact = F.col("exact_inter").cast("double") / F.col("exact_union").cast(
        "double"
    )
    return (
        exact.join(est, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_union",
            "exact_inter",
            (
                F.abs(F.col("union_est") - F.col("exact_union"))
                <= 0.10 * F.col("exact_union")
            ).alias("union_within_10pct"),
            (F.abs(F.col("jaccard_est") - j_exact) <= 0.1).alias(
                "jaccard_within_abs_10"
            ),
            (
                F.abs(F.col("intersection_est") - F.col("exact_inter"))
                <= 0.25 * F.col("exact_inter")
            ).alias("inter_within_25pct"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "stream_sketch_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_exact_distinct,
           TRUE AS hll_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    survey="sketch-tables,streaming-§2.11,approx-distinct",
    doc="Streaming statistics store: a REAL 3-micro-batch stream over "
    "the events table reduces each batch to per-(type, day) HLL sketch "
    "rows appended to a managed table (auto-folded past the file-count "
    "threshold); the merged read-out must report EXACT row counts and "
    "distinct estimates within 5% of exact — the same contract as the "
    "batch sketch_partitioned_distinct row, proven through the "
    "streaming ingest + fold path (HLL union losslessness end to end).",
)
def stream_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ariadne_dbt_spark.streaming.stats_stream import (
        read_sketch_stats,
        sketch_stats_ingest_stream,
    )

    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    ev = events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    work = tempfile.mkdtemp(prefix="ariadne_stats_stream_")
    try:
        src = os.path.join(work, "src")
        tdir = os.path.join(work, "stats")
        ev.repartition(3).write.parquet(src)
        sketch_stats_ingest_stream(spark, src, tdir, fold_max_files=2)
        stats = (
            read_sketch_stats(spark, tdir, ["event_type", "day"])
            .groupBy("event_type")
            .agg(F.sum("n_rows").alias("n_rows"))
        )
        # distinct needs a type-level union, not a sum of day estimates:
        # roll the persisted sketch table up to event_type directly
        from ariadne_dbt_spark.operators.sketches import hll_rollup
        from ariadne_dbt_spark.streaming.stats_stream import _live_dir

        raw = spark.read.parquet(_live_dir(tdir)).dropDuplicates(
            ["event_type", "day", "_batch"]
        )
        rolled = hll_rollup(raw, ["event_type"]).withColumnRenamed(
            "n_rows", "n_rows_rolled"
        )
        exact = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_exact_distinct")
        )
        out = (
            stats.join(rolled, "event_type")
            .join(exact, "event_type")
            .select(
                "event_type",
                "n_rows",
                "n_exact_distinct",
                (
                    F.abs(F.col("n_distinct_est") - F.col("n_exact_distinct"))
                    <= 0.05 * F.col("n_exact_distinct")
                ).alias("hll_within_5pct"),
            )
            .orderBy("event_type")
        )
        # LocalRelation: the temp table dir is deleted below
        return spark.createDataFrame(
            out.toPandas(),
            "event_type string, n_rows bigint, n_exact_distinct bigint, "
            "hll_within_5pct boolean",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- managed-table lifecycle (round 9): MERGE INTO + DELETE + change feed ---

_MERGE_CTE = """
    target AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 4 < 3
    ),
    src AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) + 1000 AS price
        FROM orders WHERE o_orderkey % 8 IN (0, 3)
    ),
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
        UNION ALL SELECT * FROM src
    ),
    updated AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(CASE WHEN o_orderstatus = 'P' THEN price + 50
                         ELSE price END AS DECIMAL(18,2)) AS price
        FROM merged
    ),
    final AS (SELECT * FROM updated WHERE o_orderkey % 100 <> 1)
"""


def _merged_orders_table(spark: SparkSession, sf_dir: str, work: str, *, cluster: bool) -> str:
    """Build the managed orders table the two lifecycle workloads share:
    write 3/4 of orders, (optionally) OPTIMIZE clustered on the merge
    key so footer pruning has ranges to work with, MERGE an
    update+insert source (keys %8 in {0,3}: 0 matches → update, 3 was
    excluded from the target → insert), UPDATE WHERE status 'P' (price
    bump via the predicate-scan COW path), then DELETE keys %100 == 1.
    Retention keeps every epoch readable for the change feed."""
    import os

    from ariadne_dbt_spark.operators.table_store import (
        delete_keys,
        merge_table,
        optimize_table,
        update_where,
        write_table,
    )
    from ariadne_dbt_spark.workloads.relational import T, dec

    tdir = os.path.join(work, "orders_t")
    base = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", dec("o_totalprice").alias("price")
    )
    write_table(spark, base.where(F.col("o_orderkey") % 4 < 3), tdir)
    if cluster:
        optimize_table(
            spark, tdir, target_file_mb=1, cluster_by=["o_orderkey"], retention_sec=3600
        )
    src = base.where((F.col("o_orderkey") % 8).isin(0, 3)).withColumn(
        "price", (F.col("price") + F.lit(1000)).cast("decimal(18,2)")
    )
    merge_table(spark, tdir, src, ["o_orderkey"], retention_sec=3600)
    update_where(
        spark,
        tdir,
        {"price": "CAST(price + 50 AS DECIMAL(18,2))"},
        "o_orderstatus = 'P'",
        retention_sec=3600,
    )
    delete_keys(
        spark,
        tdir,
        base.select("o_orderkey").where(F.col("o_orderkey") % 100 == 1),
        ["o_orderkey"],
        retention_sec=3600,
    )
    return tdir


@query(
    "table_merge_upsert",
    oracle=f"""
    WITH {_MERGE_CTE}
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS total_price
    FROM final GROUP BY 1 ORDER BY 1
    """,
    survey="managed-table-merge,lakehouse-maintenance",
    doc="Row-level MERGE INTO a managed parquet table (Delta-style "
    "upsert as a copy-on-write epoch flip; operators/table_store.py "
    "merge_table): write 3/4 of orders, OPTIMIZE clustered on the key, "
    "merge an update+insert batch, UPDATE WHERE a status predicate "
    "(predicate-scan COW), DELETE a key slice, and aggregate the final "
    "table. The oracle replays the whole lifecycle relationally — "
    "anti-join + union + CASE + filter — so upsert/update/delete "
    "semantics, not just plumbing, are value-checked. Footer pruning "
    "carries files the source provably misses; exactness never "
    "depends on it.",
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ariadne_dbt_spark.operators.table_store import read_table

    work = tempfile.mkdtemp(prefix="ariadne_tbl_merge_")
    try:
        tdir = _merged_orders_table(spark, sf_dir, work, cluster=True)
        out = (
            read_table(spark, tdir)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price").cast("double").alias("total_price"),
            )
            .orderBy("o_orderstatus")
        )
        # LocalRelation: the temp table dir is deleted below
        return spark.createDataFrame(
            out.toPandas(),
            "o_orderstatus string, n_orders bigint, total_price double",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "table_change_feed",
    oracle=f"""
    WITH {_MERGE_CTE},
    diff AS (
        SELECT COALESCE(f.o_orderkey, t.o_orderkey) AS o_orderkey,
               CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                    WHEN f.o_orderkey IS NULL THEN 'delete'
                    WHEN f.price <> t.price
                         OR f.o_orderstatus <> t.o_orderstatus
                         THEN 'update_postimage'
               END AS _change_type,
               CAST(COALESCE(f.price, t.price) AS DOUBLE) AS price
        FROM target t FULL OUTER JOIN final f ON t.o_orderkey = f.o_orderkey
    )
    SELECT o_orderkey, _change_type, price FROM diff
    WHERE _change_type IS NOT NULL
    ORDER BY o_orderkey
    """,
    survey="managed-table-cdf,time-travel",
    doc="Change-data-feed between two retained table versions "
    "(operators/table_store.py table_changes): the same "
    "merge-then-delete history as table_merge_upsert, diffed from "
    "epoch 0 to the current pointer — inserts, deletes (pre-image), "
    "and updates (post-image) — against a full-outer-join SQL oracle. "
    "Vacuum retention is what makes the old version diffable; no "
    "per-write change log is kept.",
)
def table_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ariadne_dbt_spark.operators.table_store import table_changes

    work = tempfile.mkdtemp(prefix="ariadne_tbl_cdf_")
    try:
        tdir = _merged_orders_table(spark, sf_dir, work, cluster=False)
        out = (
            table_changes(spark, tdir, ["o_orderkey"], from_epoch=0)
            .select(
                "o_orderkey",
                "_change_type",
                F.col("price").cast("double").alias("price"),
            )
            .orderBy("o_orderkey")
        )
        return spark.createDataFrame(
            out.toPandas(),
            "o_orderkey bigint, _change_type string, price double",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "incremental_agg_view",
    oracle=f"""
    WITH {_MERGE_CTE}
    SELECT o_orderstatus,
           CAST(SUM(price) AS DOUBLE) AS total_price,
           COUNT(*) AS n_orders,
           COUNT(*) AS n_rows
    FROM final GROUP BY 1 ORDER BY 1
    """,
    survey="managed-table-cdf,incremental-view",
    doc="Incrementally maintained aggregate view folded from the "
    "change-data-feed LOG (operators/incremental_view.py + "
    "table_store.enable_change_feed): build a revenue-by-status view "
    "over a managed orders table, run the same merge/update/delete "
    "lifecycle as table_merge_upsert, then refresh_agg_view folds ONLY "
    "the logged change rows (signed pre/post images, O(churn) — the "
    "workload RAISES if the refresh fell back off the log path) and "
    "the result must hash-equal the oracle's from-scratch GROUP BY of "
    "the final state. Group death (a status emptying) and birth are "
    "part of the contract.",
)
def incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ariadne_dbt_spark.operators.incremental_view import (
        build_agg_view,
        refresh_agg_view,
    )
    from ariadne_dbt_spark.operators.table_store import (
        delete_keys,
        enable_change_feed,
        merge_table,
        optimize_table,
        read_table,
        update_where,
        write_table,
    )
    from ariadne_dbt_spark.workloads.relational import T, dec

    work = tempfile.mkdtemp(prefix="ariadne_incr_view_")
    try:
        tdir = os.path.join(work, "orders_t")
        base = T(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", dec("o_totalprice").alias("price")
        )
        write_table(spark, base.where(F.col("o_orderkey") % 4 < 3), tdir)
        enable_change_feed(tdir)
        vdir = os.path.join(work, "view_t")
        build_agg_view(
            spark,
            tdir,
            vdir,
            row_keys=["o_orderkey"],
            group_by=["o_orderstatus"],
            measures={"total_price": ("sum", "price"), "n_orders": ("count", None)},
        )
        # the optimize epoch sits INSIDE the refresh range: the log
        # reader must skip it as row-preserving, not fail on it
        optimize_table(
            spark, tdir, target_file_mb=1, cluster_by=["o_orderkey"], retention_sec=3600
        )
        src = base.where((F.col("o_orderkey") % 8).isin(0, 3)).withColumn(
            "price", (F.col("price") + F.lit(1000)).cast("decimal(18,2)")
        )
        merge_table(spark, tdir, src, ["o_orderkey"], retention_sec=3600)
        update_where(
            spark,
            tdir,
            {"price": "CAST(price + 50 AS DECIMAL(18,2))"},
            "o_orderstatus = 'P'",
            retention_sec=3600,
        )
        delete_keys(
            spark,
            tdir,
            base.select("o_orderkey").where(F.col("o_orderkey") % 100 == 1),
            ["o_orderkey"],
            retention_sec=3600,
        )
        rep = refresh_agg_view(spark, vdir)
        if rep.get("mode") != "log":
            raise RuntimeError(
                f"incremental view refresh fell off the log path: {rep}"
            )
        out = (
            read_table(spark, vdir)
            .select(
                "o_orderstatus",
                F.col("total_price").cast("double").alias("total_price"),
                F.col("n_orders").cast("bigint").alias("n_orders"),
                F.col("_rows").cast("bigint").alias("n_rows"),
            )
            .orderBy("o_orderstatus")
        )
        return spark.createDataFrame(
            out.toPandas(),
            "o_orderstatus string, total_price double, n_orders bigint, n_rows bigint",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)



