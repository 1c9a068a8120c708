"""Corpus snapshot versioning (north-star scale extension): training
datasets ship as versioned snapshots, and every release needs an audit
of what changed — which documents were added, removed, or edited — to
reason about training-data drift and to build incremental updates.

``corpus_diff`` compares two snapshots by normalized content
fingerprint: ONE full-outer shuffle join on the document id (both
sides' fingerprints are computed map-side; at 100 TB bucket both
snapshots by id so the join co-locates without a shuffle), then a
four-way CASE. No collect, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.text import fingerprint_md5

__all__ = ["corpus_diff"]


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``(id, status)`` with status ∈ {added, removed, changed,
    unchanged}, comparing whitespace-normalized MD5 fingerprints (the
    same key exact dedup uses, so 'unchanged' is insensitive to
    whitespace-only edits). Ids are assumed unique within each
    snapshot (run exact dedup first otherwise — duplicate ids would
    fan out through the full-outer join)."""
    o = old.select(
        F.col(id_col).alias("id"), fingerprint_md5(text_col).alias("_fo")
    )
    n = new.select(
        F.col(id_col).alias("id"), fingerprint_md5(text_col).alias("_fn")
    )
    j = o.join(n, "id", "full")
    return j.select(
        "id",
        F.when(F.col("_fo").isNull(), F.lit("added"))
        .when(F.col("_fn").isNull(), F.lit("removed"))
        .when(F.col("_fo") != F.col("_fn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
