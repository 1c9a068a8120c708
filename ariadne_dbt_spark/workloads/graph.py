"""Graph / lineage workloads (SURVEY §2.8) over a DAG derived from the
synthetic star schema: region.<k> → nation.<k> → customer.<k> edges.

The Spark side runs the engine's iterative-join BFS
(ariadne_dbt_spark.operators.graph.bfs — reference semantics from
src/ariadne_dbt/graph.py:23-75); the oracle is a recursive CTE with a
MIN(distance) rollup, which pins the visited-set/min-distance contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.graph import DOWNSTREAM, UPSTREAM, bfs
from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query

_EDGE_SQL = """
    SELECT 'region.' || CAST(r_regionkey AS VARCHAR) AS parent_id,
           'nation.' || CAST(n_nationkey AS VARCHAR) AS child_id
    FROM region JOIN nation ON n_regionkey = r_regionkey
    UNION ALL
    SELECT 'nation.' || CAST(n_nationkey AS VARCHAR),
           'customer.' || CAST(c_custkey AS VARCHAR)
    FROM nation JOIN customer ON c_nationkey = n_nationkey
"""


def hierarchy_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge list ``(parent_id, child_id)`` — reference G8 edge construction
    (indexer.py:447-456): explode parent_map with prefixed kind ids."""
    region = spark.read.parquet(table_path(sf_dir, "region"))
    nation = spark.read.parquet(table_path(sf_dir, "nation"))
    customer = spark.read.parquet(table_path(sf_dir, "customer"))
    rn = region.join(nation, nation.n_regionkey == region.r_regionkey).select(
        F.concat(F.lit("region."), F.col("r_regionkey").cast("string")).alias("parent_id"),
        F.concat(F.lit("nation."), F.col("n_nationkey").cast("string")).alias("child_id"),
    )
    nc = nation.join(customer, customer.c_nationkey == nation.n_nationkey).select(
        F.concat(F.lit("nation."), F.col("n_nationkey").cast("string")).alias("parent_id"),
        F.concat(F.lit("customer."), F.col("c_custkey").cast("string")).alias("child_id"),
    )
    return rn.union(nc)


@query(
    "bfs_downstream",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL}),
    walk(unique_id, distance) AS (
        SELECT child_id, 1 FROM edges WHERE parent_id = 'region.3'
        UNION ALL
        SELECT e.child_id, w.distance + 1
        FROM walk w JOIN edges e ON e.parent_id = w.unique_id
        WHERE w.distance < 2
    ),
    dedup AS (SELECT unique_id, MIN(distance) AS distance FROM walk GROUP BY unique_id)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY distance, unique_id) AS BIGINT) AS ord,
           unique_id, distance
    FROM dedup
    ORDER BY ord
    """,
    survey="G1,G8,E2,O4",
    doc="Downstream BFS depth 2 from region.3 with min-distance semantics; "
    "`ord` materializes the engine's deterministic (distance, id) output "
    "ordering (O4, reference graph.py:74-75) so the driver's "
    "order-insensitive hash still verifies it.",
)
def bfs_downstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = hierarchy_edges(spark, sf_dir)
    return bfs(edges, ["region.3"], DOWNSTREAM, max_depth=2, with_ord=True)


@query(
    "bfs_upstream",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL}),
    walk(unique_id, distance) AS (
        SELECT parent_id, 1 FROM edges WHERE child_id = 'customer.7'
        UNION ALL
        SELECT e.parent_id, w.distance + 1
        FROM walk w JOIN edges e ON e.child_id = w.unique_id
        WHERE w.distance < 10
    ),
    dedup AS (SELECT unique_id, MIN(distance) AS distance FROM walk GROUP BY unique_id)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY distance, unique_id) AS BIGINT) AS ord,
           unique_id, distance
    FROM dedup
    ORDER BY ord
    """,
    survey="G1,G4,O4",
    doc="Upstream closure (source-dependency analog, graph.py:136-150); "
    "`ord` hash-pins the deterministic (distance, id) ordering (O4).",
)
def bfs_upstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = hierarchy_edges(spark, sf_dir)
    return bfs(edges, ["customer.7"], UPSTREAM, max_depth=10, with_ord=True)


@query(
    "multi_pivot_min_distance",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL}),
    walk(unique_id, distance) AS (
        SELECT child_id, 1 FROM edges WHERE parent_id IN ('region.0', 'nation.1')
        UNION ALL
        SELECT e.child_id, w.distance + 1
        FROM walk w JOIN edges e ON e.parent_id = w.unique_id
        WHERE w.distance < 2
    )
    SELECT unique_id, MIN(distance) AS distance
    FROM walk
    WHERE unique_id NOT IN ('region.0', 'nation.1')
    GROUP BY unique_id
    ORDER BY distance, unique_id
    """,
    survey="G6,E2",
    doc="Multi-pivot BFS: union of frontiers keeps MIN(distance) per node "
    "(reference: capsule.py:154-162).",
)
def multi_pivot_min_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = hierarchy_edges(spark, sf_dir)
    return bfs(edges, ["region.0", "nation.1"], DOWNSTREAM, max_depth=2)


@query(
    "impact_by_kind",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL}),
    walk(unique_id, distance) AS (
        SELECT child_id, 1 FROM edges WHERE parent_id = 'nation.5'
        UNION ALL
        SELECT e.child_id, w.distance + 1
        FROM walk w JOIN edges e ON e.parent_id = w.unique_id
        WHERE w.distance < 5
    ),
    dedup AS (SELECT unique_id, MIN(distance) AS distance FROM walk GROUP BY unique_id)
    SELECT split_part(unique_id, '.', 1) AS kind, distance, COUNT(*) AS n
    FROM dedup GROUP BY 1, 2 ORDER BY kind, distance
    """,
    survey="G3,P2",
    doc="Impact analysis: downstream blast radius bucketed by node kind "
    "(reference: graph.py:79-132).",
)
def impact_by_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = hierarchy_edges(spark, sf_dir)
    affected = bfs(edges, ["nation.5"], DOWNSTREAM, max_depth=5)
    return (
        affected.withColumn("kind", F.split("unique_id", "\\.").getItem(0))
        .groupBy("kind", "distance")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("kind", "distance")
    )


@query(
    "node_degree_centrality",
    oracle=f"""
    WITH edges AS ({_EDGE_SQL}),
    nodes AS (
        SELECT DISTINCT parent_id AS unique_id FROM edges
        UNION
        SELECT DISTINCT child_id FROM edges
    ),
    deg AS (
        SELECT n.unique_id,
               COALESCE(u.c, 0) AS upstream_count,
               COALESCE(d.c, 0) AS downstream_count,
               COALESCE(u.c, 0) + COALESCE(d.c, 0) AS degree
        FROM nodes n
        LEFT JOIN (SELECT child_id, COUNT(*) AS c FROM edges GROUP BY 1) u
               ON n.unique_id = u.child_id
        LEFT JOIN (SELECT parent_id, COUNT(*) AS c FROM edges GROUP BY 1) d
               ON n.unique_id = d.parent_id
    )
    SELECT unique_id, upstream_count, downstream_count,
           CAST(degree AS DOUBLE) / NULLIF((SELECT MAX(degree) FROM deg), 0) AS centrality
    FROM deg
    WHERE downstream_count > 0
    ORDER BY unique_id
    """,
    survey="A1,A2,G5",
    doc="Graph degree + centrality over the derived DAG (indexer.py:458-469); "
    "restricted to interior nodes to keep the output small.",
)
def node_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.graph import degree_centrality

    edges = hierarchy_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("parent_id").alias("unique_id"))
        .union(edges.select("child_id"))
        .distinct()
    )
    deg = degree_centrality(edges, nodes)
    return (
        deg.where(F.col("downstream_count") > 0)
        .select("unique_id", "upstream_count", "downstream_count", "centrality")
        .orderBy("unique_id")
    )


# Iterative-algorithm surface: PageRank over the region→nation→customer
# hierarchy. Rows-only (oracle=None) BY DESIGN: double summation order
# across executors is nondeterministic, so a value hash would be flaky;
# the semantics are pinned in tests/test_pagerank.py against a NumPy
# power iteration with identical teleport + dangling-mass handling.
@query(
    "pagerank_hierarchy",
    oracle=None,
    survey="G5,pagerank",
    doc="10-iteration PageRank (damping 0.85) over the hierarchy edge "
    "list — one shuffle per iteration (ranks⋈edges on parent, group by "
    "child), ranks localCheckpoint'd each iteration to truncate "
    "lineage, intermediates unpersisted (no caller-owned caches). "
    "Returns top-30 by rank with a 6dp-rounded score.",
)
def pagerank_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.graph import pagerank

    edges = hierarchy_edges(spark, sf_dir)
    pr = pagerank(edges, damping=0.85, iters=10)
    out = pr.limit(30).select(
        "unique_id", F.round("rank", 6).alias("rank_6dp")
    )
    # LocalRelation copy so the checkpoint behind `pr` can be released
    import pandas as pd

    res = spark.createDataFrame(out.toPandas(), "unique_id string, rank_6dp double")
    pr.unpersist()
    return res


# Triangle counting / local clustering coefficient (degree-ordered
# orientation — operators/graph.py triangle_counts). The harness graph
# is a deterministic circulant over the contiguous customer keys
# (chords at offsets 1/2/3 mod n): sparse (3n edges), scale-linear, and
# triangle-rich (every consecutive offset pair closes), so the oracle
# re-derives the identical graph arithmetically. The operator itself is
# input-agnostic — the link graph (text_index_suite/link_graph) and
# lineage edges are the production inputs.
@query(
    "triangle_clustering",
    oracle="""
    WITH nn AS (SELECT COUNT(*) AS n FROM customer),
    e0 AS (
        SELECT c_custkey AS x, (c_custkey + off) % (SELECT n FROM nn) AS y
        FROM customer CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS off)
    ),
    und AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM e0 WHERE x <> y),
    deg AS (
        SELECT v, COUNT(*) AS deg
        FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
        GROUP BY v
    ),
    o AS (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN a ELSE b END AS u,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN b ELSE a END AS v
        FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b
    ),
    ov AS (SELECT o.u, o.v, d.deg AS dv FROM o JOIN deg d ON d.v = o.v),
    tri AS (
        SELECT e1.u, e1.v, e2.v AS w
        FROM ov e1
        JOIN ov e2 ON e1.u = e2.u
             AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
        JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    pern AS (
        SELECT node, COUNT(*) AS t
        FROM (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
        GROUP BY node
    )
    SELECT d.v AS node, CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles,
           CAST((2 * COALESCE(p.t, 0) * 1000000) // (d.deg * (d.deg - 1)) AS BIGINT)
               AS clustering_millionths
    FROM deg d LEFT JOIN pern p ON p.node = d.v
    WHERE d.v % 25 = 0 AND d.deg >= 2
    ORDER BY node
    """,
    survey="G5,triangle-count,§8.7",
    doc="Per-node triangle counts + local clustering coefficient "
    "(millionths, floor-division integer-exact) via degree-ordered "
    "orientation: out-degrees bounded O(sqrt(m)) so the wedge join "
    "never pays hub-quadratic cost. Output mod-sampled; computed on "
    "the full graph.",
)
def triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.graph import triangle_counts

    cust = spark.read.parquet(table_path(sf_dir, "customer")).select(
        F.col("c_custkey").cast("long").alias("k")
    )
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    edges = (
        cust.crossJoin(F.broadcast(n))
        .select("k", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("off"), "n")
        .select(F.col("k").alias("src"), ((F.col("k") + F.col("off")) % F.col("n")).alias("dst"))
    )
    out = triangle_counts(edges, src="src", dst="dst")
    return (
        out.where(F.col("node") % 25 == 0)
        .select("node", "degree", "n_triangles", "clustering_millionths")
        .orderBy("node")
    )
