"""Relational operator inventory (SURVEY §2.1-§2.6) expressed over the
synthetic TPC-H-ish tables.

Each query mirrors an operator class the reference engine executes against
its metadata store (reference: src/ariadne_dbt/search.py, indexer.py,
patterns.py — see SURVEY.md §2 for the file:line map), re-shaped onto the
driver's tables so the DuckDB oracle can verify it.

Scale notes are inline: every join states its expected physical strategy
(broadcast vs shuffle), every aggregate relies on partial (map-side)
aggregation, and filters/projections are written to push into the parquet
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def dec(c, scale: int = 2):
    return F.col(c).cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------------
# A14 / A4 / O-sorts: the flagship scan→filter→groupBy→multi-agg→sort
# (reference surface-B marts: groupBy-sum rollups, fixtures manifest;
#  TPC-H Q1 shape). Filter pushes to parquet; aggregation is partial+final
#  hash agg; 4 decimal sums are exact under any partitioning.
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    survey="A14,A4,O2,P1",
    doc="Pricing summary rollup: filter → groupBy → 4 exact decimal aggs.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# J1 + O1-O3: fact⋈dim broadcast join + top-k by aggregate
# (reference: search hits join models then rank, search.py:106-125 — here as
#  orders⋈customer revenue top-k). customer is the small side → broadcast.
# --------------------------------------------------------------------------
@query(
    "topk_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS order_count
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
    survey="J1,O1,O2,A14",
)
def topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    customer = T(spark, sf_dir, "customer")
    # aggregate the fact FIRST (map-side partial agg shrinks the shuffle),
    # then broadcast-join the dim — at 100 TB the groupBy is the only shuffle.
    rev = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )
    return (
        rev.join(F.broadcast(customer), rev.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "revenue", "order_count")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Star join through two broadcast dims (nation, region) — partition-pruned
# fact scan + broadcast hash joins, one shuffle for the final groupBy.
# --------------------------------------------------------------------------
@query(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS order_count
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name
    ORDER BY region_name
    """,
    survey="J1,J7,A14,P1",
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    customer = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy("region_name")
    )


# --------------------------------------------------------------------------
# J9: left join + coalesce(0) null-fill — the reference's dim_customers
# "lifetime value" mart (fixtures manifest; SURVEY J9/A14).
# --------------------------------------------------------------------------
@query(
    "customer_lifetime_value",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COALESCE(o.order_count, 0) AS order_count,
           CAST(COALESCE(o.lifetime_value, 0) AS DOUBLE) AS lifetime_value
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS order_count,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS lifetime_value
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey
    """,
    survey="J9,A14,P9",
)
def customer_lifetime_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(dec("o_totalprice")).alias("lifetime_value"),
    )
    return (
        customer.join(agg, customer.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
            F.coalesce(F.col("lifetime_value"), F.lit(0))
            .cast("double")
            .alias("lifetime_value"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# J5: semi-join (IN-list / EXISTS) — reference: tests-of-affected-models
# semi-join, graph.py:96-103.
# --------------------------------------------------------------------------
@query(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    survey="J5,P1",
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = T(spark, sf_dir, "customer")
    urgent = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# E1 / J10: anti-join exclusion — reference: exclude_ids anti-join
# (search.py:69-70) and relationships-test violation semantics (§2.10).
# --------------------------------------------------------------------------
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    survey="E1,J10",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# suite-friendly 1-row summary of the same anti-join (the detail query
# above is legitimately EMPTY at small SFs, which would give the driver
# suite no signal for the E1 exclusion path — the counts always pin it)
@query(
    "customers_order_coverage",
    oracle="""
    SELECT (SELECT COUNT(*) FROM customer) AS n_customers,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_with_orders,
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
    """,
    survey="E1,J10,A4",
    doc="Anti-join coverage counts: customers total / with orders / "
    "without orders (left_anti) — always one row, so the suite hash "
    "pins the exclusion semantics at every SF.",
)
def customers_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    without = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        customer.agg(F.count(F.lit(1)).alias("n_customers"))
        .crossJoin(orders.agg(F.countDistinct("o_custkey").alias("n_with_orders")))
        .crossJoin(without.agg(F.count(F.lit(1)).alias("n_without_orders")))
    )


# --------------------------------------------------------------------------
# P4/P5: case-insensitive point lookup + LIKE pattern filter
# (reference: search.py:222-239 name lookup; :130-144 LIKE fallback).
# --------------------------------------------------------------------------
@query(
    "point_lookup_and_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE LOWER(p_type) = 'economy' AND p_name LIKE '%widget%'
    ORDER BY p_partkey
    """,
    survey="P4,P5",
)
def point_lookup_and_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part")
    return (
        part.where((F.lower(F.col("p_type")) == "economy") & F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# P2: prefix predicate (startswith) — reference: unique_id kind prefixes
# (indexer.py:454, graph.py:85-86).
# --------------------------------------------------------------------------
@query(
    "prefix_filter_brands",
    oracle="""
    SELECT p_brand, COUNT(*) AS part_count,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    WHERE p_brand LIKE 'Brand#1%'
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    survey="P2,A3",
)
def prefix_filter_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part")
    return (
        part.where(F.col("p_brand").startswith("Brand#1"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("part_count"),
            F.sum(dec("p_retailprice")).cast("double").alias("total_price"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# A5/A9: multi-column distinct count — reference: tested-column count
# COUNT(DISTINCT model_id || ':' || column)  (patterns.py:32-35).
# --------------------------------------------------------------------------
@query(
    "distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
           COUNT(DISTINCT l_returnflag) AS n_flags
    FROM lineitem
    """,
    survey="A5,A9,A4",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


# --------------------------------------------------------------------------
# A3 (mode-per-group): histogram + argmax via row_number window —
# reference: materialization mode per layer (patterns.py:232-246).
# --------------------------------------------------------------------------
@query(
    "mode_priority_per_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
    FROM (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    ORDER BY o_orderstatus
    """,
    survey="A3,A12",
)
def mode_priority_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    hist = orders.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("cnt"), "o_orderpriority")
    return (
        hist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "cnt")
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# A12/A13: argmax per group with deterministic tie-break —
# reference: example-model selection (patterns.py:72-86).
# --------------------------------------------------------------------------
@query(
    "biggest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS top_orderkey,
           o_totalprice AS top_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
    survey="A12,A13,O3",
)
def biggest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").alias("top_totalprice"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# A1/A2: degree counts + global-max normalization —
# reference: upstream/downstream counts + centrality (indexer.py:458-469).
# Two partial-agg groupBys joined back to the dim; the global max is a
# single-row broadcast (crossJoin of an agg), not a repartition-all window.
# --------------------------------------------------------------------------
@query(
    "nation_degree_centrality",
    oracle="""
    WITH cust AS (SELECT c_nationkey, COUNT(*) AS customer_count FROM customer GROUP BY c_nationkey),
         supp AS (SELECT s_nationkey, COUNT(*) AS supplier_count FROM supplier GROUP BY s_nationkey),
         deg AS (
            SELECT n.n_nationkey, n.n_name,
                   COALESCE(c.customer_count, 0) AS customer_count,
                   COALESCE(s.supplier_count, 0) AS supplier_count,
                   COALESCE(c.customer_count, 0) + COALESCE(s.supplier_count, 0) AS degree
            FROM nation n
            LEFT JOIN cust c ON n.n_nationkey = c.c_nationkey
            LEFT JOIN supp s ON n.n_nationkey = s.s_nationkey)
    SELECT n_nationkey, n_name, customer_count, supplier_count,
           CAST(degree AS DOUBLE) / NULLIF((SELECT MAX(degree) FROM deg), 0) AS centrality
    FROM deg ORDER BY n_nationkey
    """,
    survey="A1,A2,G5,P9",
)
def nation_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = T(spark, sf_dir, "nation")
    cust = T(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("customer_count"))
    supp = T(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("supplier_count"))
    deg = (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .join(supp, nation.n_nationkey == supp.s_nationkey, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce("customer_count", F.lit(0)).alias("customer_count"),
            F.coalesce("supplier_count", F.lit(0)).alias("supplier_count"),
        )
        .withColumn("degree", F.col("customer_count") + F.col("supplier_count"))
    )
    max_deg = deg.agg(F.max("degree").alias("max_degree"))
    return (
        deg.crossJoin(F.broadcast(max_deg))
        .select(
            "n_nationkey",
            "n_name",
            "customer_count",
            "supplier_count",
            (
                F.col("degree").cast("double")
                / F.nullif(F.col("max_degree"), F.lit(0)).cast("double")
            ).alias("centrality"),
        )
        .orderBy("n_nationkey")
    )


# --------------------------------------------------------------------------
# E4: set operations (INTERSECT / EXCEPT) — reference: overlap metrics
# (benchmarks/session_analysis.py:339-357).
# --------------------------------------------------------------------------
@query(
    "segment_overlap",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big AS (SELECT o_custkey AS c_custkey FROM orders
                 WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 150000 ),
         both_set AS (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big),
         only_building AS (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big)
    SELECT (SELECT COUNT(*) FROM both_set) AS n_both,
           (SELECT COUNT(*) FROM only_building) AS n_only_building
    """,
    survey="E4",
)
def segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT cardinalities in ONE declarative pass: mark each
    BUILDING customer with a left join against the distinct big-spender
    keys, then a single aggregate splits hit/miss — one Spark job instead
    of two independent count() actions (and no driver-side
    createDataFrame), so the set-overlap scalars ride the same
    oracle-hash path as every other workload."""
    customer = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        orders.where(dec("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    marked = building.join(big.withColumn("_hit", F.lit(1)), "c_custkey", "left")
    return marked.agg(
        F.count("_hit").alias("n_both"),
        (F.count(F.lit(1)) - F.count("_hit")).alias("n_only_building"),
    )


# --------------------------------------------------------------------------
# E3/E5: dedup preserving deterministic first-seen order —
# reference: dedup-preserving-order (capsule.py:398-405), INSERT OR IGNORE.
# --------------------------------------------------------------------------
@query(
    "first_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey, CAST(o_orderdate AS DATE) AS first_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
    survey="E3,E5",
)
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.to_date("o_orderdate").alias("first_orderdate"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# J6: theta (containment) join via broadcast nested-loop —
# reference: macro-usage substring join (search.py:265-280). The tiny term
# dim is broadcast; Spark executes a BNLJ exactly like the reference's
# nested loop, but distributed over the big side.
# --------------------------------------------------------------------------
_THETA_TERMS = ("spark", "table", "stream", "vector", "query")

@query(
    "term_containment_join",
    oracle="""
    WITH terms(term) AS (VALUES ('spark'), ('table'), ('stream'), ('vector'), ('query'))
    SELECT t.term, COUNT(*) AS doc_count, MIN(d.doc_id) AS min_doc_id
    FROM documents d JOIN terms t ON POSITION(t.term IN d.text) > 0
    GROUP BY t.term ORDER BY t.term
    """,
    survey="J6",
)
def term_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in _THETA_TERMS], "term string")
    return (
        docs.join(F.broadcast(terms), F.expr("position(term IN text) > 0"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_count"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("term")
    )


# --------------------------------------------------------------------------
# C3: greedy budget fill via window cumulative sum —
# reference: token-budget fill (capsule.py:334-396): consume items in
# priority order while the running total stays within the allocation.
# --------------------------------------------------------------------------
@query(
    "budget_fill_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(running_total AS DOUBLE) AS running_total
    FROM (
        SELECT o_custkey, o_orderkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS running_total
        FROM orders
    ) WHERE running_total <= 200000
    ORDER BY o_custkey, o_orderkey
    """,
    survey="C3,O5",
)
def budget_fill_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.withColumn(
            "running_total", F.sum(dec("o_totalprice")).over(w)
        )
        .where(F.col("running_total") <= 200000)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("running_total").cast("double").alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )
