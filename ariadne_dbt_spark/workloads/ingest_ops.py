"""Ingest-pipeline workloads (SURVEY §2.1 S1-S5, S9) — the REAL manifest
/catalog/run_results ingest (ariadne_dbt_spark.ingest) on the Spark
side, verified against DuckDB's own JSON reader over the SAME committed
fixture files (tests/fixtures/*.json). Both engines parse the identical
dbt artifacts from first principles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.workloads import query

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_FIX = os.path.join(_REPO, "tests", "fixtures")
MANIFEST = os.path.join(_FIX, "manifest.json")
CATALOG = os.path.join(_FIX, "catalog.json")
RUN_RESULTS = os.path.join(_FIX, "run_results.json")

#: shared oracle prelude: the manifest as one JSON value + nodes pivoted
#: to rows (the manifest "nodes" member is a MAP keyed by unique_id —
#: SURVEY §1.3; both sides pivot map→rows)
_MAN_SQL = f"""
    raw AS MATERIALIZED (
        SELECT json FROM read_json_objects('{MANIFEST}', format='unstructured')),
    node_rows AS MATERIALIZED (
        SELECT uid, json_extract(json, '$.nodes."' || uid || '"') AS node
        FROM (SELECT unnest(json_keys(json, '$.nodes')) AS uid, json FROM raw))
"""

_IDX_CACHE: dict = {}


def fixture_index(spark: SparkSession, *, catalog: bool = False, run_results: bool = False):
    from ariadne_dbt_spark.ingest.indexer import AriadneIndex

    key = (id(spark.sparkContext), catalog, run_results)
    if key not in _IDX_CACHE:
        _IDX_CACHE[key] = AriadneIndex.build(
            spark,
            MANIFEST,
            catalog_path=CATALOG if catalog else None,
            run_results_path=RUN_RESULTS if run_results else None,
        )
    return _IDX_CACHE[key]


# --------------------------------------------------------------------------
# S1 + P1/P7/P9: manifest ingest — resource-type split, field
# projection/rename, layer classification (name prefix OR fqn[:-1]/tags
# keyword probes — reference: indexer.py:22-36).
# --------------------------------------------------------------------------
@query(
    "manifest_models_index",
    oracle=f"""
    WITH {_MAN_SQL},
    m AS (
        SELECT uid AS unique_id,
               json_extract_string(node, '$.name') AS name,
               json_extract_string(node, '$.schema') AS db_schema,
               json_extract_string(node, '$.original_file_path') AS file_path,
               COALESCE(json_extract_string(node, '$.config.materialized'), 'view')
                   AS materialization,
               list_transform(
                   array_slice(CAST(json_extract(node, '$.fqn') AS VARCHAR[]), 1,
                               len(CAST(json_extract(node, '$.fqn') AS VARCHAR[])) - 1)
                   || CAST(json_extract(node, '$.tags') AS VARCHAR[]),
                   x -> lower(x)) AS probes
        FROM node_rows
        WHERE json_extract_string(node, '$.resource_type') = 'model')
    SELECT unique_id, name, db_schema, file_path, materialization,
           CASE
             WHEN name LIKE 'stg\\_%' ESCAPE '\\'
                  OR len(list_filter(probes, x -> x IN ('staging', 'stg'))) > 0
               THEN 'staging'
             WHEN name LIKE 'int\\_%' ESCAPE '\\'
                  OR len(list_filter(probes, x -> x IN ('intermediate', 'int'))) > 0
               THEN 'intermediate'
             WHEN name LIKE 'fct\\_%' ESCAPE '\\' OR name LIKE 'dim\\_%' ESCAPE '\\'
                  OR name LIKE 'fact\\_%' ESCAPE '\\'
                  OR len(list_filter(probes, x -> x IN ('marts', 'mart', 'fct', 'dim'))) > 0
               THEN 'marts'
             ELSE 'other'
           END AS layer
    FROM m ORDER BY unique_id
    """,
    survey="S1,P1,P7,P9",
    doc="Manifest ingest through the real indexer: resource-type split, "
    "schema→db_schema rename, layer classification — vs DuckDB parsing "
    "the same manifest.json.",
)
def manifest_models_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = fixture_index(spark)
    return idx.models.select(
        "unique_id", "name", "db_schema", "file_path", "materialization", "layer"
    ).orderBy("unique_id")


# --------------------------------------------------------------------------
# G8 + A1/A2: edge construction from parent_map (kind-prefix filtered)
# and degree/centrality derivation.
# --------------------------------------------------------------------------
@query(
    "manifest_edges_degrees",
    oracle=f"""
    WITH {_MAN_SQL},
    children AS (
        SELECT unnest(json_keys(json, '$.parent_map')) AS child, json FROM raw),
    pairs AS (
        SELECT DISTINCT parent, child FROM (
            SELECT unnest(CAST(json_extract(json, '$.parent_map."' || child || '"')
                          AS VARCHAR[])) AS parent, child
            FROM children
            WHERE child LIKE 'model.%' OR child LIKE 'exposure.%')
        WHERE parent LIKE 'model.%' OR parent LIKE 'source.%'),
    m AS (SELECT uid FROM node_rows
          WHERE json_extract_string(node, '$.resource_type') = 'model'),
    deg AS (
        SELECT m.uid AS unique_id,
               COALESCE(u.c, 0) AS upstream_count,
               COALESCE(d.c, 0) AS downstream_count,
               COALESCE(u.c, 0) + COALESCE(d.c, 0) AS degree
        FROM m
        LEFT JOIN (SELECT child, COUNT(*) AS c FROM pairs GROUP BY 1) u
               ON m.uid = u.child
        LEFT JOIN (SELECT parent, COUNT(*) AS c FROM pairs GROUP BY 1) d
               ON m.uid = d.parent)
    SELECT unique_id, upstream_count, downstream_count,
           CAST(degree AS DOUBLE) / (SELECT MAX(degree) FROM deg) AS centrality
    FROM deg ORDER BY unique_id
    """,
    survey="G8,A1,A2,G5",
    doc="parent_map→edges with kind-prefix filters + per-model degrees "
    "and normalized centrality (reference: indexer.py:447-469).",
)
def manifest_edges_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = fixture_index(spark)
    return idx.models.select(
        "unique_id",
        F.col("upstream_count").cast("long").alias("upstream_count"),
        F.col("downstream_count").cast("long").alias("downstream_count"),
        "centrality",
    ).orderBy("unique_id")


# --------------------------------------------------------------------------
# J3 over the real manifest: PK/FK flags from the fixture's dbt tests.
# --------------------------------------------------------------------------
@query(
    "manifest_pk_fk",
    oracle=f"""
    WITH {_MAN_SQL},
    t AS (
        SELECT json_extract_string(node, '$.attached_node') AS model_id,
               json_extract_string(node, '$.column_name') AS column_name,
               lower(json_extract_string(node, '$.test_metadata.name')) AS test_type
        FROM node_rows
        WHERE json_extract_string(node, '$.resource_type') = 'test'),
    pk AS (
        SELECT model_id, column_name FROM t
        WHERE test_type IN ('unique', 'not_null')
        GROUP BY 1, 2 HAVING COUNT(DISTINCT test_type) >= 2),
    fk AS (SELECT DISTINCT model_id, column_name FROM t
           WHERE test_type = 'relationships')
    SELECT c.model_id, c.column_name AS name,
           (pk.model_id IS NOT NULL) AS is_primary_key,
           (fk.model_id IS NOT NULL) AS is_foreign_key
    FROM (
        SELECT uid AS model_id,
               unnest(json_keys(node, '$.columns')) AS column_name
        FROM node_rows
        WHERE json_extract_string(node, '$.resource_type') = 'model') c
    LEFT JOIN pk ON c.model_id = pk.model_id AND c.column_name = pk.column_name
    LEFT JOIN fk ON c.model_id = fk.model_id AND c.column_name = fk.column_name
    WHERE pk.model_id IS NOT NULL OR fk.model_id IS NOT NULL
    ORDER BY c.model_id, name
    """,
    survey="J3,S1",
    doc="PK/FK derivation from the fixture manifest's real dbt tests.",
)
def manifest_pk_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = fixture_index(spark)
    return (
        idx.columns.where(F.col("is_primary_key") | F.col("is_foreign_key"))
        .select("model_id", "name", "is_primary_key", "is_foreign_key")
        .orderBy("model_id", "name")
    )


# --------------------------------------------------------------------------
# S4: metadata KV store.
# --------------------------------------------------------------------------
@query(
    "manifest_metadata_kv",
    oracle=f"""
    WITH {_MAN_SQL}
    SELECT k AS key, json_extract_string(json, '$.metadata.' || k) AS value
    FROM (SELECT unnest(['project_name', 'adapter_type', 'dbt_version',
                         'generated_at']) AS k),
         raw
    ORDER BY key
    """,
    survey="S4",
    doc="Project metadata KV rows (reference: indexer.py:164-176).",
)
def manifest_metadata_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = fixture_index(spark)
    return idx.index_metadata.orderBy("key")


# --------------------------------------------------------------------------
# S5: full-refresh overwrite sinks — build → save → rebuild → save
# (overwrite) → load → per-table counts. Appending instead of
# overwriting would double every count.
# --------------------------------------------------------------------------
@query(
    "manifest_reindex_counts",
    oracle=f"""
    WITH {_MAN_SQL},
    n AS (SELECT json_extract_string(node, '$.resource_type') AS rt, node
          FROM node_rows)
    SELECT 'models' AS tbl, COUNT(*) AS n_rows FROM n WHERE rt = 'model'
    UNION ALL
    SELECT 'columns', SUM(len(json_keys(node, '$.columns')))
    FROM n WHERE rt = 'model'
    UNION ALL
    SELECT 'tests', COUNT(*) FROM n WHERE rt = 'test'
    UNION ALL
    SELECT 'sources', (SELECT len(json_keys(json, '$.sources')) FROM raw)
    UNION ALL
    SELECT 'source_columns',
           (SELECT SUM(len(json_keys(json, '$.sources."' || s || '".columns')))
            FROM (SELECT unnest(json_keys(json, '$.sources')) AS s, json FROM raw))
    UNION ALL
    SELECT 'macros', (SELECT len(json_keys(json, '$.macros')) FROM raw)
    UNION ALL
    SELECT 'exposures', (SELECT len(json_keys(json, '$.exposures')) FROM raw)
    UNION ALL
    SELECT 'edges', (
        SELECT COUNT(*) FROM (
            SELECT DISTINCT parent, child FROM (
                SELECT unnest(CAST(json_extract(json, '$.parent_map."' || child || '"')
                              AS VARCHAR[])) AS parent, child
                FROM (SELECT unnest(json_keys(json, '$.parent_map')) AS child, json
                      FROM raw)
                WHERE child LIKE 'model.%' OR child LIKE 'exposure.%')
            WHERE parent LIKE 'model.%' OR parent LIKE 'source.%'))
    UNION ALL
    SELECT 'index_metadata', 4
    ORDER BY tbl
    """,
    survey="S5,E5",
    doc="Full-snapshot refresh: save → rebuild → save(overwrite) → load; "
    "counts match a single build (append would double them).",
)
def manifest_reindex_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.ingest.indexer import AriadneIndex

    out_dir = os.path.join(_REPO, ".tmp", "reindex_idx")
    idx1 = AriadneIndex.build(spark, MANIFEST)
    idx1.save(out_dir)
    idx2 = AriadneIndex.build(spark, MANIFEST)
    idx2.save(out_dir)  # S5: second save must OVERWRITE, not append
    loaded = AriadneIndex.load(spark, out_dir)
    tables = (
        "models", "columns", "tests", "sources", "source_columns",
        "macros", "exposures", "edges", "index_metadata",
    )
    rows = [(t, getattr(loaded, t).count()) for t in tables]
    return spark.createDataFrame(sorted(rows), "tbl string, n_rows long")


# --------------------------------------------------------------------------
# S2: catalog enrichment — row_count/bytes/last_modified into models,
# case-insensitive column type merge into columns.
# --------------------------------------------------------------------------
@query(
    "manifest_catalog_enrich",
    oracle=f"""
    WITH {_MAN_SQL},
    cat AS MATERIALIZED (
        SELECT json FROM read_json_objects('{CATALOG}', format='unstructured')),
    cnodes AS (
        SELECT uid, json_extract(json, '$.nodes."' || uid || '"') AS node
        FROM (SELECT unnest(json_keys(json, '$.nodes')) AS uid, json FROM cat)),
    stats AS (
        SELECT uid,
               CAST(json_extract(node, '$.stats.num_rows.value') AS BIGINT) AS row_count,
               CAST(json_extract(node, '$.stats.num_bytes.value') AS BIGINT) AS bytes,
               json_extract_string(node, '$.metadata.last_modified') AS last_modified
        FROM cnodes)
    SELECT m.uid AS unique_id, s.row_count, s.bytes, s.last_modified
    FROM (SELECT uid FROM node_rows
          WHERE json_extract_string(node, '$.resource_type') = 'model') m
    LEFT JOIN stats s ON m.uid = s.uid
    ORDER BY unique_id
    """,
    survey="S2",
    doc="Catalog stats joined into models (reference: indexer.py:100-134) "
    "— both sides parse the same catalog.json.",
)
def manifest_catalog_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = fixture_index(spark, catalog=True)
    return idx.models.select(
        "unique_id", "row_count", "bytes", "last_modified"
    ).orderBy("unique_id")


@query(
    "manifest_catalog_column_types",
    oracle=f"""
    WITH {_MAN_SQL},
    cat AS MATERIALIZED (
        SELECT json FROM read_json_objects('{CATALOG}', format='unstructured')),
    ccols AS (
        SELECT uid, lower(json_extract_string(
                   json_extract(json, '$.nodes."' || uid || '".columns."' || c || '"'),
                   '$.name')) AS col_lower,
               json_extract_string(
                   json_extract(json, '$.nodes."' || uid || '".columns."' || c || '"'),
                   '$.type') AS cat_type
        FROM (SELECT uid, unnest(json_keys(json, '$.nodes."' || uid || '".columns')) AS c,
                     json
              FROM (SELECT unnest(json_keys(json, '$.nodes')) AS uid, json FROM cat))),
    mcols AS (
        SELECT uid AS model_id, c AS name,
               json_extract_string(
                   json_extract(node, '$.columns."' || c || '"'), '$.data_type')
                   AS manifest_type
        FROM (SELECT uid, node, unnest(json_keys(node, '$.columns')) AS c
              FROM node_rows
              WHERE json_extract_string(node, '$.resource_type') = 'model'))
    SELECT m.model_id, m.name,
           COALESCE(NULLIF(cc.cat_type, ''), m.manifest_type, '') AS data_type
    FROM mcols m
    LEFT JOIN ccols cc ON m.model_id = cc.uid AND lower(m.name) = cc.col_lower
    ORDER BY m.model_id, m.name
    """,
    survey="S2",
    doc="Case-insensitive catalog column-type merge (reference: "
    "indexer.py:117-125 joins on lower(name) both sides).",
)
def manifest_catalog_column_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = fixture_index(spark, catalog=True)
    return idx.columns.select("model_id", "name", "data_type").orderBy(
        "model_id", "name"
    )


# --------------------------------------------------------------------------
# S3: run-results enrichment — status, Σ timing deltas, failures.
# --------------------------------------------------------------------------
@query(
    "manifest_run_results_enrich",
    oracle=f"""
    WITH {_MAN_SQL},
    rr AS MATERIALIZED (
        SELECT json FROM read_json_objects('{RUN_RESULTS}', format='unstructured')),
    results AS (
        SELECT unnest(CAST(json_extract(json, '$.results') AS JSON[])) AS r FROM rr),
    enriched AS (
        SELECT json_extract_string(r, '$.unique_id') AS unique_id,
               json_extract_string(r, '$.status') AS last_status,
               CAST(json_extract(r, '$.failures') AS INT) AS last_failures,
               COALESCE((
                   SELECT SUM(epoch(CAST(json_extract_string(t, '$.completed_at')
                                         AS TIMESTAMP))
                              - epoch(CAST(json_extract_string(t, '$.started_at')
                                           AS TIMESTAMP)))
                   FROM unnest(CAST(json_extract(r, '$.timing') AS JSON[])) AS u(t)
               ), 0.0) AS last_execution_time
        FROM results
        WHERE json_extract_string(r, '$.unique_id') LIKE 'test.%')
    SELECT t.uid AS unique_id, e.last_status, e.last_failures,
           ROUND(COALESCE(e.last_execution_time, 0.0), 3) AS exec_seconds
    FROM (SELECT uid FROM node_rows
          WHERE json_extract_string(node, '$.resource_type') = 'test') t
    LEFT JOIN enriched e ON t.uid = e.unique_id
    ORDER BY unique_id
    """,
    survey="S3,A11",
    doc="run_results enrichment: status + Σ(completed-started) + failures, "
    "tests only (reference: indexer.py:136-160).",
)
def manifest_run_results_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = fixture_index(spark, run_results=True)
    return idx.tests.select(
        "unique_id",
        "last_status",
        "last_failures",
        F.round(F.coalesce("last_execution_time", F.lit(0.0)), 3).alias("exec_seconds"),
    ).orderBy("unique_id")


# --------------------------------------------------------------------------
# S9: config discovery — walk up for ariadne_spark.toml + dbt_project.yml
# from a nested directory; artifact defaults under <root>/target.
# --------------------------------------------------------------------------
@query(
    "config_discovery",
    oracle=f"""
    SELECT * FROM (VALUES
        ('catalog_path', ''),
        ('manifest_path', 'target/manifest.json'),
        ('max_pivots', '4'),
        ('project_root', '{os.path.join(_FIX, "proj")}'),
        ('token_budget', '8000'),
        ('extra.extra_knob', 'on')
    ) AS t(key, value) ORDER BY key
    """,
    survey="S9",
    doc="Config discovery from a nested dir: toml overrides + dbt root "
    "defaults (reference: config.py:88-159).",
)
def config_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.project_config import discover

    start = os.path.join(_FIX, "proj", "nested", "sub")
    cfg = discover(start)
    rows = [
        ("catalog_path", cfg.catalog_path or ""),
        ("manifest_path", cfg.manifest_path or ""),
        ("max_pivots", str(cfg.max_pivots)),
        ("project_root", cfg.project_root or ""),
        ("token_budget", str(cfg.token_budget)),
        ("extra.extra_knob", str(cfg.extra.get("extra_knob", ""))),
    ]
    return spark.createDataFrame(sorted(rows), "key string, value string")


# --------------------------------------------------------------------------
# S7: markdown sinks — the generator writes the reference's full file set
# (CLAUDE.md, memory.md, skills, dag summary, cursor + windsurf rules);
# memory.md is never overwritten. The oracle pins the expected file set
# and the preservation contract.
# --------------------------------------------------------------------------
@query(
    "generator_file_set",
    oracle="""
    SELECT * FROM (VALUES
        ('.claude/CLAUDE.md', true, true),
        ('.claude/context/dag_summary.md', true, true),
        ('.claude/memory.md', true, true),
        ('.claude/skills/debug_test.md', true, true),
        ('.claude/skills/new_model.md', true, true),
        ('.cursor/rules/ariadne.mdc', true, true),
        ('.windsurf/rules/ariadne.md', true, true)
    ) AS t(relpath, non_trivial, memory_preserved) ORDER BY relpath
    """,
    survey="S7",
    doc="Generator writes the reference's file set (reference: "
    "generator.py:65-130); a pre-existing memory.md survives reindex.",
)
def generator_file_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ariadne_dbt_spark.operators.generator import DocsGenerator

    idx = fixture_index(spark)
    root = os.path.join(_REPO, ".tmp", "genroot")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, ".claude"), exist_ok=True)
    sentinel = "USER NOTES — do not clobber"
    with open(os.path.join(root, ".claude", "memory.md"), "w") as f:
        f.write(sentinel)

    gen = DocsGenerator(idx)
    gen.generate_all(root, ["claude_code", "cursor", "windsurf"])
    mem_ok = sentinel in open(os.path.join(root, ".claude", "memory.md")).read()

    expected = [
        ".claude/CLAUDE.md",
        ".claude/context/dag_summary.md",
        ".claude/memory.md",
        ".claude/skills/debug_test.md",
        ".claude/skills/new_model.md",
        ".cursor/rules/ariadne.mdc",
        ".windsurf/rules/ariadne.md",
    ]
    rows = []
    for rel in expected:
        p = os.path.join(root, rel)
        non_trivial = os.path.exists(p) and len(open(p).read()) > 20
        rows.append((rel, non_trivial, mem_ok))
    return spark.createDataFrame(
        sorted(rows), "relpath string, non_trivial boolean, memory_preserved boolean"
    )


# --------------------------------------------------------------------------
# S8: usage-log sink — date-partitioned append-mode parquet writes, read
# back and aggregated (reference: usage.py:21-45 one row per tool call).
# --------------------------------------------------------------------------
@query(
    "usage_log_roundtrip",
    oracle="""
    WITH calls(tool_name, intent, duration_ms) AS (VALUES
        ('search_models', 'explore', 40),
        ('search_models', 'debug', 60),
        ('get_context_capsule', 'debug', 300),
        ('get_context_capsule', 'add_feature', 250),
        ('get_lineage', 'explore', 20),
        ('search_models', 'explore', 45))
    SELECT tool_name, COUNT(*) AS n_calls,
           CAST(SUM(duration_ms) AS BIGINT) AS total_ms
    FROM calls GROUP BY tool_name ORDER BY tool_name
    """,
    survey="S8,A10",
    doc="Append-only telemetry sink round-trip: 6 recorded calls across "
    "2 partitioned days, re-read and rolled up per tool.",
)
def usage_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from datetime import datetime

    from ariadne_dbt_spark.operators.usage import UsageLog

    log_dir = os.path.join(_REPO, ".tmp", "usage_log")
    shutil.rmtree(log_dir, ignore_errors=True)
    log = UsageLog(spark, log_dir)
    calls = [
        ("search_models", "explore", 40, datetime(2026, 1, 5, 9, 0)),
        ("search_models", "debug", 60, datetime(2026, 1, 5, 10, 0)),
        ("get_context_capsule", "debug", 300, datetime(2026, 1, 5, 11, 0)),
        ("get_context_capsule", "add_feature", 250, datetime(2026, 1, 6, 9, 0)),
        ("get_lineage", "explore", 20, datetime(2026, 1, 6, 10, 0)),
        ("search_models", "explore", 45, datetime(2026, 1, 6, 11, 0)),
    ]
    for tool, intent, ms, ts in calls:
        log.record(tool, intent=intent, duration_ms=ms, ts=ts)
    df = spark.read.parquet(log_dir)
    return (
        df.groupBy("tool_name")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum("duration_ms").cast("long").alias("total_ms"),
        )
        .orderBy("tool_name")
    )


@query(
    "csv_source_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    survey="source-csv",
    doc="CSV source/sink roundtrip: documents written as quoted CSV "
    "(header, explicit schema on read — no inference drift), read back "
    "and aggregated per language; counts and character mass must equal "
    "the oracle's direct derivation from the parquet source, proving "
    "the format conversion is lossless for tabular text data.",
)
def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ariadne_dbt_spark.session import table_path

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", "text", "lang", "n_chars"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        # md5, not hash(): PYTHONHASHSEED salts hash() per process, which
        # would leak a fresh orphan dir on every crashed run
        "ariadne_csv_roundtrip_"
        + __import__("hashlib").md5(sf_dir.encode()).hexdigest()[:8],
    )
    shutil.rmtree(out, ignore_errors=True)
    try:
        docs.write.mode("overwrite").option("header", True).option(
            "quoteAll", True
        ).csv(out)
        back = spark.read.schema(
            "doc_id bigint, text string, lang string, n_chars bigint"
        ).option("header", True).csv(out)
        res = (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
            .orderBy("lang")
        )
        import pandas as pd

        return spark.createDataFrame(
            res.toPandas(), "lang string, n_docs bigint, total_chars bigint"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "orc_source_roundtrip",
    oracle="""
    SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
    FROM documents GROUP BY source ORDER BY source
    """,
    survey="source-orc",
    doc="ORC source/sink roundtrip (Spark-native columnar format beside "
    "parquet/csv/jsonl/warc): documents written as ORC with zlib "
    "compression, read back and aggregated per source; counts and "
    "character mass must equal the oracle's direct derivation from the "
    "parquet source — the conversion is lossless.",
)
def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ariadne_dbt_spark.session import table_path

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select(
        "doc_id", "text", "source", "n_chars"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        "ariadne_orc_roundtrip_"
        + __import__("hashlib").md5(sf_dir.encode()).hexdigest()[:8],
    )
    shutil.rmtree(out, ignore_errors=True)
    try:
        docs.write.mode("overwrite").option("compression", "zlib").orc(out)
        back = spark.read.orc(out)
        res = (
            back.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
            .orderBy("source")
        )
        import pandas as pd  # noqa: F401

        return spark.createDataFrame(
            res.toPandas(), "source string, n_docs bigint, total_chars bigint"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "binary_file_source",
    oracle="""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS file_name,
           CAST(strlen(text) AS BIGINT) AS size_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id % 25 = 0
    ORDER BY file_name
    """,
    survey="source-binaryfile",
    doc="binaryFile source — how multimodal corpora ingest raw asset "
    "files into binary columns (path/length/content + glob filtering): "
    "one file per sampled doc written to disk, read back via "
    "format('binaryFile') with pathGlobFilter, verified by per-file "
    "size + md5 against a direct derivation from the parquet source. "
    "Real binary payloads (PNG) go through the same source in "
    "tests/test_image_probe.py; at 100 TB this source lists in "
    "parallel and never reads files a pathGlobFilter excludes.",
)
def binary_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ariadne_dbt_spark.session import table_path

    docs = (
        spark.read.parquet(table_path(sf_dir, "documents"))
        .where(F.col("doc_id") % 25 == 0)
        .select("doc_id", "text")
    )
    out = os.path.join(
        tempfile.gettempdir(),
        "ariadne_binfiles_"
        + __import__("hashlib").md5(sf_dir.encode()).hexdigest()[:8],
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    try:
        # fixture materialization (bounded: 1/25 sample); a real pipeline
        # starts from files already on object storage
        for r in docs.collect():
            with open(os.path.join(out, f"doc_{r['doc_id']}.txt"), "wb") as f:
                f.write(r["text"].encode("utf-8"))
        # a decoy the glob must exclude
        with open(os.path.join(out, "ignore.bin"), "wb") as f:
            f.write(b"\x00\xff")
        back = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.txt")
            .load(out)
        )
        res = (
            back.select(
                F.element_at(F.split("path", "/"), -1).alias("file_name"),
                F.col("length").alias("size_bytes"),
                F.md5("content").alias("content_md5"),
            )
            .orderBy("file_name")
        )
        import pandas as pd  # noqa: F401

        return spark.createDataFrame(
            res.toPandas(), "file_name string, size_bytes bigint, content_md5 string"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "delta_log_read",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           CASE WHEN o_orderkey % 3 = 1 THEN 'keep' ELSE 'late' END AS cohort
    FROM orders WHERE o_orderkey % 3 IN (1, 2)
    ORDER BY o_orderkey
    """,
    survey="source-delta-log",
    doc="Delta Lake interop source (ingest/delta_reader.py read_delta): "
    "resolve a Delta table's live files from its _delta_log "
    "transaction log — pure-Python metadata replay of "
    "protocol/metaData/add/remove actions, NO delta-spark runtime — "
    "then scan them as plain parquet with the LOG's schema. The "
    "fixture writes three parquet files from orders and fabricates a "
    "two-commit log (v0 adds the %3==0 and %3==1 files; v1 removes "
    "the %3==0 file and adds the %3==2 file), so the latest snapshot "
    "must contain exactly the %3 in (1,2) rows — the oracle derives "
    "the same set relationally. Removed-file exclusion, late-add "
    "inclusion, and log-schema reads are all on the hash path.",
)
def delta_log_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from pyspark.sql import functions as F

    from ariadne_dbt_spark.ingest.delta_reader import read_delta
    from ariadne_dbt_spark.session import table_path

    orders = spark.read.parquet(table_path(sf_dir, "orders")).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        F.when(F.col("o_orderkey") % 3 == 1, "keep")
        .otherwise("late")
        .alias("cohort"),
    )
    work = _tf.mkdtemp(prefix="ariadne_delta_src_")
    try:
        table = _os.path.join(work, "dtable")
        _os.makedirs(table)

        def part(name, pred):
            tmp = _os.path.join(work, "stage")
            orders.where(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
            src = _glob.glob(_os.path.join(tmp, "part-*.parquet"))[0]
            _sh.move(src, _os.path.join(table, name))
            _sh.rmtree(tmp)
            return name

        f0 = part("part-000.parquet", F.col("o_orderkey") % 3 == 0)
        f1 = part("part-001.parquet", F.col("o_orderkey") % 3 == 1)
        f2 = part("part-002.parquet", F.col("o_orderkey") % 3 == 2)
        schema_string = _json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "o_orderkey", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "price", "type": "double", "nullable": True, "metadata": {}},
                    {"name": "cohort", "type": "string", "nullable": True, "metadata": {}},
                ],
            }
        )
        log = _os.path.join(table, "_delta_log")
        _os.makedirs(log)

        def commit(v, actions):
            with open(_os.path.join(log, f"{v:020d}.json"), "w") as f:
                for a in actions:
                    f.write(_json.dumps(a) + "\n")

        def add(p):
            return {"add": {"path": p, "partitionValues": {}, "size": 1,
                            "modificationTime": 0, "dataChange": True}}

        commit(0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "fixture",
                          "format": {"provider": "parquet", "options": {}},
                          "schemaString": schema_string,
                          "partitionColumns": [], "configuration": {}}},
            add(f0), add(f1),
            {"commitInfo": {"operation": "WRITE", "timestamp": 1}},
        ])
        commit(1, [
            {"remove": {"path": f0, "dataChange": True}}, add(f2),
            {"commitInfo": {"operation": "MERGE", "timestamp": 2}},
        ])

        out = read_delta(spark, table).orderBy("o_orderkey")
        return spark.createDataFrame(
            out.toPandas(), "o_orderkey bigint, price double, cohort string"
        )
    finally:
        _sh.rmtree(work, ignore_errors=True)
