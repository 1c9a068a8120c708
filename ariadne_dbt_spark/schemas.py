"""Explicit StructTypes for the index tables (FIXTURES.md §3).

The reference stores nested values as JSON-in-TEXT (reference:
src/ariadne_dbt/schema.sql:19,31-36); here every nested field is a
first-class Spark type — ArrayType for fqn/tags/depends_on,
MapType(string,string) for meta/config (heterogeneous values re-encoded
as JSON strings).
"""

from __future__ import annotations

from pyspark.sql import types as T

_s = T.StringType()
_arr = T.ArrayType(_s)
_map = T.MapType(_s, _s)


def _f(name, dtype, nullable=True):
    return T.StructField(name, dtype, nullable)


MODELS = T.StructType([
    _f("unique_id", _s, False),
    _f("name", _s),
    _f("fqn", _arr),
    _f("package_name", _s),
    _f("database", _s),
    _f("db_schema", _s),
    _f("alias", _s),
    _f("file_path", _s),
    _f("raw_code", _s),
    _f("compiled_code", _s),
    _f("language", _s),
    _f("description", _s),
    _f("layer", _s),
    _f("materialization", _s),
    _f("tags", _arr),
    _f("meta", _map),
    _f("config", _map),
    _f("depends_on_nodes", _arr),
    _f("refs", _arr),
    _f("sources", _arr),
    _f("row_count", T.LongType()),
    _f("bytes", T.LongType()),
    _f("last_modified", _s),
    _f("upstream_count", T.IntegerType()),
    _f("downstream_count", T.IntegerType()),
    _f("centrality", T.DoubleType()),
])

COLUMNS = T.StructType([
    _f("model_id", _s, False),
    _f("name", _s, False),
    _f("data_type", _s),
    _f("description", _s),
    _f("meta", _map),
    _f("tags", _arr),
    _f("is_primary_key", T.BooleanType()),
    _f("is_foreign_key", T.BooleanType()),
])

SOURCES = T.StructType([
    _f("unique_id", _s, False),
    _f("name", _s),
    _f("source_name", _s),
    _f("schema_name", _s),
    _f("database", _s),
    _f("identifier", _s),
    _f("description", _s),
    _f("loader", _s),
    _f("freshness_warn_count", T.IntegerType()),
    _f("freshness_warn_period", _s),
    _f("freshness_error_count", T.IntegerType()),
    _f("freshness_error_period", _s),
    _f("tags", _arr),
    _f("meta", _map),
])

SOURCE_COLUMNS = T.StructType([
    _f("source_id", _s, False),
    _f("name", _s, False),
    _f("data_type", _s),
    _f("description", _s),
])

TESTS = T.StructType([
    _f("unique_id", _s, False),
    _f("name", _s),
    _f("test_type", _s),  # not_null|unique|accepted_values|relationships|generic|singular
    _f("model_id", _s),
    _f("column_name", _s),
    _f("depends_on", _arr),
    _f("severity", _s),
    _f("test_kwargs", _s),  # JSON: accepted values list / relationship target
    _f("last_status", _s),
    _f("last_execution_time", T.DoubleType()),
    _f("last_failures", T.IntegerType()),
])

MACROS = T.StructType([
    _f("unique_id", _s, False),
    _f("name", _s),
    _f("package_name", _s),
    _f("file_path", _s),
    _f("description", _s),
    _f("arguments", _arr),
    _f("macro_sql", _s),
])

EXPOSURES = T.StructType([
    _f("unique_id", _s, False),
    _f("name", _s),
    _f("label", _s),
    _f("exposure_type", _s),
    _f("url", _s),
    _f("description", _s),
    _f("owner_name", _s),
    _f("owner_email", _s),
    _f("depends_on", _arr),
    _f("tags", _arr),
])

EDGES = T.StructType([
    _f("parent_id", _s, False),
    _f("child_id", _s, False),
])

METADATA = T.StructType([_f("key", _s, False), _f("value", _s)])

USAGE_LOG = T.StructType([
    _f("id", T.LongType(), False),
    _f("ts", T.TimestampType()),
    _f("tool_name", _s),
    _f("task_text", _s),
    _f("intent", _s),
    _f("focus_model", _s),
    _f("pivot_count", T.IntegerType()),
    _f("token_estimate", T.IntegerType()),
    _f("duration_ms", T.IntegerType()),
])
