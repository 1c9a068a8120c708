"""Bucketed table layouts: co-located joins and aggregations.

SCALE.md's join posture says big fact⋈fact joins should be bucketed so
the shuffle happens ONCE at write time and every later join/agg on the
bucket key is exchange-free. This exercises it for real: two tables
bucketed 8-ways on the same key join with ZERO Exchange operators in
the physical plan, and a groupBy on the bucket key aggregates without
a shuffle. (External-path tables keep the shared warehouse clean.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.range(10_000).select(
        F.col("id").alias("o_custkey"),
        (F.col("id") % 97).cast("double").alias("o_total"),
    )
    cust = spark.range(10_000).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("c_name"),
    )
    for name, df, key in (("t_orders_b", orders, "o_custkey"), ("t_cust_b", cust, "c_custkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    yield spark.table("t_orders_b"), spark.table("t_cust_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    orders, cust = bucketed_pair
    joined = orders.join(
        cust.hint("merge"), orders.o_custkey == cust.c_custkey
    ).select("o_custkey", "o_total", "c_name")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # both sides read pre-bucketed: no shuffle
    assert joined.count() == 10_000


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    orders, _ = bucketed_pair
    agg = orders.groupBy("o_custkey").agg(F.sum("o_total").alias("t"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket layout satisfies the agg partitioning
    assert agg.count() == 10_000
