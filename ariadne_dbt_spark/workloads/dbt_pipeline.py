"""Surface-B pipeline workloads: the dbt-style executor runs the webshop
fixture project (tests/fixtures/manifest.json) against the driver's
parquet tables; the oracle recomputes the same mart in plain SQL.

Float note: `paid_amount`/`lifetime_value` are sums of 2-decimal doubles;
`round(x, 2)` lands on the exact 2-decimal true value in both engines
(accumulated float error ≪ 0.005), and both engines return the nearest
double to that decimal — outputs stay DOUBLE (never Decimal, which is not
hash-stable across the driver's fetch paths).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.workloads import query

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
MANIFEST_PATH = os.path.join(_REPO, "tests", "fixtures", "manifest.json")


def _executor(spark: SparkSession, sf_dir: str):
    from ariadne_dbt_spark.ingest.manifest import load_manifest
    from ariadne_dbt_spark.plans.dbt_executor import DbtSparkExecutor

    return DbtSparkExecutor(
        spark=spark,
        manifest=load_manifest(MANIFEST_PATH),
        source_map={
            ("raw", "orders"): f"{sf_dir}/orders.parquet",
            ("raw", "customers"): f"{sf_dir}/customer.parquet",
            ("raw", "payments"): f"{sf_dir}/lineitem.parquet",
        },
        target_dir=None,  # views everywhere: Catalyst fuses the whole DAG
    )


_STG_SQL = """
    stg_orders AS (
        SELECT o_orderkey AS order_id, o_custkey AS customer_id,
               o_totalprice AS amount, o_orderstatus AS status,
               o_orderdate AS ordered_at
        FROM orders),
    stg_customers AS (
        SELECT c_custkey AS customer_id, c_name AS customer_name,
               c_mktsegment AS segment
        FROM customer),
    stg_payments AS (
        SELECT l_orderkey AS order_id, l_linenumber AS payment_line,
               l_extendedprice AS amount, l_returnflag AS payment_flag
        FROM lineitem),
    fct_orders AS (
        SELECT o.order_id, o.customer_id, o.status, o.amount,
               coalesce(p.paid_amount, 0) AS paid_amount
        FROM stg_orders o
        LEFT JOIN (SELECT order_id, sum(amount) AS paid_amount
                   FROM stg_payments GROUP BY order_id) p
          ON o.order_id = p.order_id)
"""


@query(
    "dbt_run_fct_orders",
    oracle=f"""
    WITH {_STG_SQL}
    SELECT order_id, customer_id, status,
           round(amount, 2) AS amount,
           round(paid_amount, 2) AS paid_amount
    FROM fct_orders ORDER BY order_id
    """,
    survey="S10,P10,J9,A14,§2.11-macros",
    doc="Full dbt pipeline: Jinja ref/source resolution → topo execution "
    "→ fct_orders mart, vs the oracle's hand-expanded SQL.",
)
def dbt_run_fct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = _executor(spark, sf_dir)
    ex.run(["stg_orders", "stg_payments", "fct_orders"])
    fct = ex.relation("fct_orders")
    return fct.select(
        "order_id",
        "customer_id",
        "status",
        F.round("amount", 2).alias("amount"),
        F.round("paid_amount", 2).alias("paid_amount"),
    ).orderBy("order_id")


@query(
    "dbt_run_dim_customers",
    oracle=f"""
    WITH {_STG_SQL},
    dim AS (
        SELECT c.customer_id, c.customer_name, c.segment,
               coalesce(o.order_count, 0) AS order_count,
               coalesce(o.lifetime_value, 0) AS lifetime_value
        FROM stg_customers c
        LEFT JOIN (SELECT customer_id, count(*) AS order_count,
                          sum(amount) AS lifetime_value
                   FROM fct_orders GROUP BY customer_id) o
          ON c.customer_id = o.customer_id)
    SELECT customer_id, customer_name, segment, order_count,
           round(lifetime_value, 2) AS lifetime_value
    FROM dim ORDER BY customer_id
    """,
    survey="S10,J9,A14",
    doc="Second-level mart through the executor (two ref() hops).",
)
def dbt_run_dim_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = _executor(spark, sf_dir)
    ex.run()
    dim = ex.relation("dim_customers")
    return dim.select(
        "customer_id",
        "customer_name",
        "segment",
        F.col("order_count").cast("bigint").alias("order_count"),
        F.round("lifetime_value", 2).alias("lifetime_value"),
    ).orderBy("customer_id")


@query(
    "dbt_test_results",
    oracle="""
    WITH stg_orders AS (
        SELECT o_orderkey AS order_id, o_custkey AS customer_id,
               o_orderstatus AS status
        FROM orders),
    stg_customers AS (SELECT c_custkey AS customer_id FROM customer),
    fct AS (
        SELECT o.order_id, o.customer_id, o.status FROM stg_orders o)
    SELECT 'accepted_values_fct_orders_status' AS test_name,
           (SELECT COUNT(*) FROM fct WHERE status NOT IN ('P','O','F') OR status IS NULL) AS failures
    UNION ALL
    SELECT 'not_null_fct_orders_order_id',
           (SELECT COUNT(*) FROM fct WHERE order_id IS NULL)
    UNION ALL
    SELECT 'not_null_stg_orders_order_id',
           (SELECT COUNT(*) FROM stg_orders WHERE order_id IS NULL)
    UNION ALL
    SELECT 'relationships_fct_orders_customer_id',
           (SELECT COUNT(*) FROM fct f WHERE f.customer_id IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM stg_customers c WHERE c.customer_id = f.customer_id))
    UNION ALL
    SELECT 'unique_fct_orders_order_id',
           (SELECT COUNT(*) FROM (SELECT order_id FROM fct WHERE order_id IS NOT NULL
                                  GROUP BY order_id HAVING COUNT(*) > 1))
    ORDER BY test_name
    """,
    survey="§2.10,S3",
    doc="The project's dbt tests executed through the quality compiler.",
)
def dbt_test_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.ingest.manifest import load_manifest, parse_tests
    from ariadne_dbt_spark.plans.quality import run_tests

    ex = _executor(spark, sf_dir)
    ex.run()
    tests = parse_tests(load_manifest(MANIFEST_PATH))
    results = run_tests(tests, ex.relation, spark=spark)
    rows = sorted((r.name, r.failures) for r in results)
    return spark.createDataFrame(rows, "test_name string, failures long")


# dbt incremental materialization, gate-hard (round 8): the inline
# project's one model builds first over EVEN order keys (tagged v1),
# then re-runs incrementally over ALL orders under the MERGE strategy
# with merge_update_columns=['amount'] — matched (even) keys update
# amount but KEEP batch_tag='v1' (the partial-update semantics
# delete+insert cannot express), odd keys insert whole as v2. The
# oracle derives every row from orders arithmetically.
_INC_MANIFEST = {
    "metadata": {"project_name": "incproj", "adapter_type": "spark"},
    "nodes": {
        "model.incproj.inc_orders": {
            "resource_type": "model",
            "name": "inc_orders",
            "fqn": ["incproj", "marts", "inc_orders"],
            "path": "models/marts/inc_orders.sql",
            "raw_code": (
                "SELECT o_orderkey AS order_id,"
                " {% if is_incremental() %} 'v2' {% else %} 'v1' {% endif %}"
                " AS batch_tag,"
                " ROUND(o_totalprice"
                " {% if is_incremental() %} + 1 {% endif %}, 2) AS amount"
                " FROM {{ source('raw', 'orders') }}"
                " {% if not is_incremental() %} WHERE o_orderkey % 2 = 0"
                " {% endif %}"
            ),
            "config": {
                "materialized": "incremental",
                "unique_key": "order_id",
                "incremental_strategy": "merge",
                "merge_update_columns": "['amount']",
            },
            "depends_on": {"nodes": []},
        }
    },
    "sources": {},
    "macros": {},
}


@query(
    "dbt_run_incremental",
    oracle="""
    SELECT o_orderkey AS order_id,
           CASE WHEN o_orderkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS batch_tag,
           ROUND(o_totalprice + 1, 2) AS amount
    FROM orders ORDER BY order_id
    """,
    survey="S10,§2.11-incremental",
    doc="dbt incremental run under the MERGE strategy: first build over "
    "even order keys (v1), incremental re-run over all orders — "
    "matched keys update amount via merge_update_columns but keep the "
    "v1 batch_tag, odd keys insert as v2; every row oracle-derived "
    "from orders.",
)
def dbt_run_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ariadne_dbt_spark.plans.dbt_executor import DbtSparkExecutor

    target = tempfile.mkdtemp(prefix="dbt_inc_")
    try:
        ex = DbtSparkExecutor(
            spark=spark,
            manifest=_INC_MANIFEST,
            source_map={("raw", "orders"): f"{sf_dir}/orders.parquet"},
            target_dir=target,
        )
        ex.run()  # first build: even keys, v1, amount = totalprice
        out = ex.run()["inc_orders"]  # incremental merge over all orders
        # pin rows executor-side before the temp target dir goes away
        result = out.orderBy("order_id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(target, ignore_errors=True)
    return result


# dbt SNAPSHOT materialization, gate-hard (round 8): two snapshot runs
# over a shifting source — run 1 sees every order at (o_orderstatus,
# o_orderdate); in run 2 every key % 3 == 0 advanced (status suffixed
# '2', updated_at +30 days) while the rest are byte-identical. The SCD2
# outcome is fully derivable from orders: advanced keys carry a closed
# original (valid_to = the new updated_at) plus an open new version;
# unchanged keys stay a single open row.
_SNAP_MANIFEST = {
    "metadata": {"project_name": "snapproj", "adapter_type": "spark"},
    "nodes": {
        "snapshot.snapproj.orders_snap": {
            "resource_type": "snapshot",
            "name": "orders_snap",
            "raw_code": (
                "SELECT order_id, status, updated_at"
                " FROM {{ source('raw', 'orders_feed') }}"
            ),
            "config": {
                "strategy": "timestamp",
                "unique_key": "order_id",
                "updated_at": "updated_at",
            },
            "depends_on": {"nodes": []},
        }
    },
    "sources": {},
    "macros": {},
}


@query(
    "dbt_snapshot_scd2",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderstatus AS status,
           CAST(o_orderdate AS DATE) AS valid_from,
           CASE WHEN o_orderkey % 3 = 0
                THEN CAST(o_orderdate AS DATE) + 30 END AS valid_to
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_orderstatus || '2', CAST(o_orderdate AS DATE) + 30, NULL
    FROM orders WHERE o_orderkey % 3 = 0
    ORDER BY order_id, valid_from
    """,
    survey="S10,§2.11-snapshots",
    doc="dbt snapshot (SCD2, timestamp strategy) through the executor: "
    "two runs over a shifting source — advanced keys close the old "
    "version at the new updated_at and insert an open one, unchanged "
    "keys pass through; every row oracle-derived from orders.",
)
def dbt_snapshot_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ariadne_dbt_spark.plans.dbt_executor import DbtSparkExecutor

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    feed1 = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.to_date("o_orderdate").alias("updated_at"),
    )
    advanced = F.col("o_orderkey") % 3 == 0
    feed2 = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.when(advanced, F.concat(F.col("o_orderstatus"), F.lit("2")))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.when(advanced, F.date_add(F.to_date("o_orderdate"), 30))
        .otherwise(F.to_date("o_orderdate"))
        .alias("updated_at"),
    )
    target = tempfile.mkdtemp(prefix="dbt_snap_")
    try:
        for feed in (feed1, feed2):
            ex = DbtSparkExecutor(
                spark=spark,
                manifest=_SNAP_MANIFEST,
                source_map={("raw", "orders_feed"): feed},
                target_dir=target,
            )
            out = ex.run()["orders_snap"]
        result = (
            out.select(
                "order_id",
                "status",
                F.col("dbt_valid_from").alias("valid_from"),
                F.col("dbt_valid_to").alias("valid_to"),
            )
            .orderBy("order_id", "valid_from")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(target, ignore_errors=True)
    return result
