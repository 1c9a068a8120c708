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
