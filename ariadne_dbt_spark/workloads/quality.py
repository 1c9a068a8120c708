"""Data-quality test semantics (SURVEY §2.10) as assertion queries.

The reference classifies dbt tests into not_null / unique /
accepted_values / relationships / singular (reference:
src/ariadne_dbt/indexer.py:238-260) and records pass/fail + failure
counts from run_results. Here each test type executes as a Spark
assertion query over the synthetic tables; the engine-side generic
compiler lives in ariadne_dbt_spark/plans/quality.py and is what the
dbt-executor uses — these workloads pin its semantics against SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# One row per test with its violation count — the run_results shape the
# reference stores (last_status / last_failures, schema.sql:103-105).
@query(
    "dq_test_suite",
    oracle="""
    SELECT 'not_null_o_custkey' AS test_name,
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS failures
    UNION ALL
    SELECT 'unique_o_orderkey',
           (SELECT COUNT(*) FROM (
               SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'unique_lineitem_pk',
           (SELECT COUNT(*) FROM (
               SELECT l_orderkey, l_linenumber FROM lineitem
               GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'accepted_values_o_orderstatus',
           (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('P','O','F'))
    UNION ALL
    SELECT 'relationships_orders_customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'relationships_lineitem_orders',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'singular_no_negative_prices',
           (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice < 0)
    ORDER BY test_name
    """,
    survey="§2.10,S3,J10",
    doc="All five dbt test types executed as assertion queries (violation counts).",
)
def dq_test_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five dbt test types as violation-count assertions, batched
    into ONE Spark action: each test's violating-row frame collapses to
    a single (test_name, failures) aggregate row and the seven
    aggregates union into one plan — the scheduler runs their stages
    concurrently instead of seven driver-sequential count() jobs, and
    the scalars ride the declarative path (no driver createDataFrame)."""
    orders = T(spark, sf_dir, "orders")
    lineitem = T(spark, sf_dir, "lineitem")
    customer = T(spark, sf_dir, "customer")

    violations = {
        "not_null_o_custkey": orders.where(F.col("o_custkey").isNull()),
        "unique_o_orderkey": (
            orders.groupBy("o_orderkey").count().where(F.col("count") > 1)
        ),
        "unique_lineitem_pk": (
            lineitem.groupBy("l_orderkey", "l_linenumber")
            .count()
            .where(F.col("count") > 1)
        ),
        "accepted_values_o_orderstatus": orders.where(
            ~F.col("o_orderstatus").isin("P", "O", "F")
        ),
        "relationships_orders_customer": orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_anti"
        ),
        "relationships_lineitem_orders": lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        ),
        "singular_no_negative_prices": lineitem.where(F.col("l_extendedprice") < 0),
    }
    parts = [
        v.agg(F.count(F.lit(1)).alias("failures")).select(
            F.lit(name).alias("test_name"), "failures"
        )
        for name, v in violations.items()
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.union(part)
    return out.orderBy("test_name")


# IQR outlier detection per group — the robust (median-based) DQ rule
# for numeric columns. Everything is exact integer arithmetic on cents:
# quartiles are DISCRETE rank-selected values (no interpolation
# semantics to disagree on) and the Tukey fence comparison is
# cross-multiplied by 2 so the 1.5x factor never produces a float.
@query(
    "price_outliers_iqr",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag AS grp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem
    ),
    ranked AS (
        SELECT grp, c,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY c) AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM cents
    ),
    q AS (
        SELECT grp,
               MAX(CASE WHEN rn = (n + 3) // 4 THEN c END) AS q1,
               MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN c END) AS q3,
               MAX(n) AS n
        FROM ranked GROUP BY grp
    )
    SELECT r.grp,
           CAST(MAX(q.n) AS BIGINT) AS n_rows,
           CAST(MAX(q.q1) AS BIGINT) AS q1_cents,
           CAST(MAX(q.q3) AS BIGINT) AS q3_cents,
           CAST(SUM(CASE WHEN 2 * r.c > 2 * q.q3 + 3 * (q.q3 - q.q1) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high_outliers,
           CAST(SUM(CASE WHEN 2 * r.c < 2 * q.q1 - 3 * (q.q3 - q.q1) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_outliers
    FROM ranked r JOIN q ON r.grp = q.grp
    GROUP BY r.grp ORDER BY r.grp
    """,
    survey="dq-outliers,§2.10",
    doc="Tukey-fence (1.5×IQR) outlier counts per return flag over "
    "line-item prices in integer cents: DISCRETE rank-selected "
    "quartiles, cross-multiplied fence comparison — entirely "
    "float-free. Two window passes over one shuffle on the group key, "
    "then a broadcast-back join of the per-group fences.",
)
def price_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = spark.read.parquet(table_path(sf_dir, "lineitem"))
    cents = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    w = Window.partitionBy("grp").orderBy("c")
    wn = Window.partitionBy("grp")
    ranked = cents.select(
        "grp",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = ranked.groupBy("grp").agg(
        F.max(F.expr("CASE WHEN rn = (n + 3) DIV 4 THEN c END")).alias("q1"),
        F.max(F.expr("CASE WHEN rn = (3 * n + 3) DIV 4 THEN c END")).alias("q3"),
        F.max("n").alias("n"),
    )
    return (
        ranked.join(F.broadcast(q), "grp")
        .groupBy("grp")
        .agg(
            F.max(q["n"]).cast("bigint").alias("n_rows"),
            F.max("q1").cast("bigint").alias("q1_cents"),
            F.max("q3").cast("bigint").alias("q3_cents"),
            F.sum(F.expr("CASE WHEN 2 * c > 2 * q3 + 3 * (q3 - q1) THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_high_outliers"),
            F.sum(F.expr("CASE WHEN 2 * c < 2 * q1 - 3 * (q3 - q1) THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_low_outliers"),
        )
        .orderBy("grp")
    )


# Privacy audit: k-anonymity / l-diversity over a quasi-identifier
# release schema (priority x order-year x 50k price band; sensitive =
# order status). operators/patterns.py k_anonymity_report — one shuffle
# on the QI key, one row per equivalence class. The price band is
# floor(price/50000): a single IEEE division then an exact floor, so
# Spark and DuckDB band identically.
@query(
    "k_anonymity_orders",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_band,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_sensitive,
           COUNT(*) >= 5 AS k_anonymous,
           COUNT(DISTINCT o_orderstatus) >= 2 AS l_diverse
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY priority, order_year, price_band
    """,
    survey="privacy-audit,A5,§8.7",
    doc="k-anonymity (k=5) + l-diversity (l=2) equivalence-class audit "
    "over (priority, order year, 50k price band) with o_orderstatus "
    "sensitive: the pre-export privacy gate for user-adjacent tables.",
)
def k_anonymity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.patterns import k_anonymity_report

    orders = spark.read.parquet(table_path(sf_dir, "orders"))
    qi = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("price_band"),
        "o_orderstatus",
    )
    return (
        k_anonymity_report(
            qi,
            qi_cols=["priority", "order_year", "price_band"],
            sensitive_col="o_orderstatus",
            k=5,
            l=2,
        )
        .select(
            "priority",
            "order_year",
            "price_band",
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_sensitive").cast("long").alias("n_sensitive"),
            "k_anonymous",
            "l_diverse",
        )
        .orderBy("priority", "order_year", "price_band")
    )
