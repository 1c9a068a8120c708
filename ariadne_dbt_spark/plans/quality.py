"""Data-quality test compiler (SURVEY §2.10).

Each dbt test type compiles to a Spark assertion query returning the
VIOLATING rows; a test passes when the violation count is 0, mirroring
the run_results statuses the reference ingests (reference:
src/ariadne_dbt/indexer.py:136-160, schema.sql:103-105).

| type             | violation set                                     |
| not_null         | rows where col IS NULL                            |
| unique           | groupBy(col) HAVING count>1                       |
| accepted_values  | rows where col NOT IN values                      |
| relationships    | child LEFT ANTI JOIN parent on the key            |
| singular         | arbitrary SQL's own result rows                   |

All are single-shuffle (or shuffle-free) DataFrame programs — at 100 TB
`unique` is one hash aggregation on the tested key, `relationships` one
join that AQE turns into broadcast when the parent side is a dim.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RelationResolver = Callable[[str], DataFrame]

_REF_IN_KWARG = re.compile(r"ref\(\s*['\"](\w+)['\"]\s*\)")


@dataclass
class TestResult:
    unique_id: str
    name: str
    test_type: str
    status: str  # pass | fail | error
    failures: int


def compile_test(
    test_row: dict,
    resolve: RelationResolver,
    *,
    spark=None,
) -> DataFrame:
    """Return the violating-rows DataFrame for one test row (dict with the
    index `tests` schema: test_type, model_id, column_name, test_kwargs)."""
    ttype = test_row["test_type"]
    kwargs = json.loads(test_row.get("test_kwargs") or "{}")
    model_name = (test_row.get("model_id") or "").split(".")[-1]
    col = test_row.get("column_name") or kwargs.get("column_name") or ""
    rel = resolve(model_name)

    if ttype == "not_null":
        return rel.where(F.col(col).isNull())
    if ttype == "unique":
        return (
            rel.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
        )
    if ttype == "accepted_values":
        values = kwargs.get("values") or []
        return rel.where(~F.col(col).isin(values) | F.col(col).isNull())
    if ttype == "relationships":
        to = kwargs.get("to") or ""
        field = kwargs.get("field") or col
        m = _REF_IN_KWARG.search(to)
        parent_name = m.group(1) if m else to
        parent = resolve(parent_name).select(F.col(field).alias("__parent_key")).distinct()
        child = rel.where(F.col(col).isNotNull())
        return child.join(
            parent, child[col] == parent.__parent_key, "left_anti"
        )
    if ttype in ("singular", "generic"):
        sql = test_row.get("raw_code") or ""
        if sql and spark is not None:
            return spark.sql(sql)
        # unknown generic test: no-op (vacuous pass), matching the
        # reference's tolerance for unclassifiable tests
        return rel.limit(0)
    raise ValueError(f"unknown test type: {ttype}")


def run_tests(
    tests: list[dict],
    resolve: RelationResolver,
    *,
    spark=None,
) -> list[TestResult]:
    """Execute a test list; failures = violation count (status 'error' on
    compile/execution exceptions, like dbt)."""
    out = []
    for t in tests:
        try:
            violations = compile_test(t, resolve, spark=spark)
            n = violations.count()
            out.append(
                TestResult(
                    unique_id=t["unique_id"],
                    name=t["name"],
                    test_type=t["test_type"],
                    status="pass" if n == 0 else "fail",
                    failures=n,
                )
            )
        except Exception:
            out.append(
                TestResult(
                    unique_id=t.get("unique_id", ""),
                    name=t.get("name", ""),
                    test_type=t.get("test_type", ""),
                    status="error",
                    failures=-1,
                )
            )
    return out
