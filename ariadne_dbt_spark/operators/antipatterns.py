"""Project anti-pattern detection (reference README roadmap v1.0
"anti-pattern detection" — no implementing code ships in v0.1, so the
rule set below is this engine's reading of standard dbt conventions,
each derivable from the index tables alone):

* ``no_tests``               — model with zero attached tests
* ``view_mart``              — marts-layer model materialized as a view
                               (marts are consumption tables; views push
                               compute to every downstream reader)
* ``source_direct_to_mart``  — a mart reading a raw source directly,
                               bypassing staging
* ``layer_inversion``        — an edge flowing against the
                               staging → intermediate → marts order
* ``undocumented``           — model with an empty description

All rules are broadcast-scale DataFrame ops over the (metadata-sized)
index tables: anti-joins and self-joins on models/tests/edges, no
collect, no UDFs. The model/test dims carry explicit broadcast hints —
index tables come from local relations whose stats the planner may not
fold, and without the hint every rule planned as a sort-merge join
(verified via executedPlan; now 0 SMJs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES = (
    "no_tests",
    "view_mart",
    "source_direct_to_mart",
    "layer_inversion",
    "undocumented",
)

_OUT_COLS = ("rule", "unique_id", "name", "layer")


def _layer_rank(col):
    return (
        F.when(col == "staging", 0).when(col == "intermediate", 1).otherwise(2)
    )


def detect_antipatterns(index, rules: tuple[str, ...] | None = None) -> DataFrame:
    """``(rule, unique_id, name, layer)`` — one row per violation."""
    rules = tuple(rules) if rules else RULES
    models = index.models.select(
        "unique_id", "name", "layer", "materialization", "description"
    )
    parts: list[DataFrame] = []

    def tag(df: DataFrame, rule: str) -> DataFrame:
        return df.select(
            F.lit(rule).alias("rule"), "unique_id", "name", "layer"
        )

    if "no_tests" in rules:
        tested = index.tests.select(
            F.col("model_id").alias("unique_id")
        ).distinct()
        parts.append(
            tag(models.join(F.broadcast(tested), "unique_id", "left_anti"), "no_tests")
        )
    if "view_mart" in rules:
        parts.append(
            tag(
                models.where(
                    (F.col("layer") == "marts")
                    & (F.col("materialization") == "view")
                ),
                "view_mart",
            )
        )
    if "source_direct_to_mart" in rules:
        src_children = (
            index.edges.where(F.col("parent_id").startswith("source."))
            .select(F.col("child_id").alias("unique_id"))
            .distinct()
        )
        parts.append(
            tag(
                models.where(F.col("layer") == "marts").join(
                    F.broadcast(src_children), "unique_id", "left_semi"
                ),
                "source_direct_to_mart",
            )
        )
    if "layer_inversion" in rules:
        p = models.select(
            F.col("unique_id").alias("parent_id"),
            _layer_rank(F.col("layer")).alias("p_rank"),
        )
        c = models.select(
            F.col("unique_id").alias("child_id"),
            "name",
            "layer",
            _layer_rank(F.col("layer")).alias("c_rank"),
        )
        inv = (
            index.edges.join(F.broadcast(p), "parent_id")
            .join(F.broadcast(c), "child_id")
            .where(F.col("p_rank") > F.col("c_rank"))
            .select(F.col("child_id").alias("unique_id"), "name", "layer")
            .distinct()
        )
        parts.append(tag(inv, "layer_inversion"))
    if "undocumented" in rules:
        parts.append(
            tag(
                models.where(
                    F.col("description").isNull() | (F.col("description") == "")
                ),
                "undocumented",
            )
        )

    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out
