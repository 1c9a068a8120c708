"""Workload registry: every operator from SURVEY.md §2 (plus the scale
extensions) is demonstrated as a named query over the driver-generated
synthetic tables, each paired with an ANSI-SQL oracle that DuckDB can run
on the same parquet files.

Design rules for oracle stability (the driver hash-compares values):

* Aggregated money/quantity columns are cast to DECIMAL *before* the
  aggregate — decimal arithmetic is exact, so Spark and DuckDB produce
  identical values regardless of partitioning / accumulation order.
* The FINAL projection never emits DecimalType: every decimal aggregate is
  cast to DOUBLE on BOTH sides. Python ``Decimal`` cells hash differently
  across the driver's two fetch paths when they carry trailing zeros
  (round-1 CORRECTNESS showed hash_match=false exactly on the queries with
  trailing-zero decimals); equal decimals cast to double are bit-identical
  (integer units < 2^53 at these scales), so doubles are hash-safe.
* Floating point is otherwise produced only by a single deterministic
  IEEE-754 operation (e.g. one division), or rounded.
* Every computed column is aliased identically in the Spark plan and the
  oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: submodules that register queries on import
_MODULES = (
    "relational",
    "text_search",
    "graph",
    "quality",
    "timeseries",
    "dedup",
    "similarity",
    "textstats",
    "dbt_pipeline",
    "olap_ext",
    "meta_ops",
    "capsule_ops",
    "ingest_ops",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    survey: str  # SURVEY.md §2 operator ids this demonstrates
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, survey: str, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame workload."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate workload name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, survey, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every workload module and return the full registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return REGISTRY
