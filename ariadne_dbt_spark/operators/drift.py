"""Distribution-drift audit between two corpus snapshots — the
monitoring stage of a continuously-rebuilt training corpus: when a new
crawl / filter deployment / source onboarding shifts the data mix, PSI
(population stability index) per feature is the standard alarm
(PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 action).

``psi = Σ_buckets (p_b - p_a) · ln(p_b / p_a)`` over a shared bucketing:
categorical features bucket by value; numeric features bucket by the
BASELINE snapshot's exact interpolated quantile edges (so "the data
moved" is measured against where A's mass sat, the standard recipe).
Laplace smoothing ``(count + 1) / (n + k)`` keeps empty buckets finite
and makes every value an exact integer ratio → deterministic doubles
(the SQL oracle mirrors it term for term).

Scale shape: two groupBy counts (one per snapshot) + a full-outer join
on bucket — bucket cardinality is feature-bounded (k categories / bins),
never data-bounded; the numeric edges are one distributed percentile
aggregate over A compiled into a literal CASE. No operation here scales
worse than one pass per snapshot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _psi_from_buckets(
    a_bucketed: DataFrame, b_bucketed: DataFrame, feature: str
) -> DataFrame:
    ca = a_bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_a"))
    cb = b_bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_b"))
    joined = ca.join(cb, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
    )
    # totals + union bucket count k as one tiny broadcast row
    tot = joined.agg(
        F.sum("n_a").alias("_ta"),
        F.sum("n_b").alias("_tb"),
        F.count(F.lit(1)).alias("_k"),
    )
    pa = (F.col("n_a") + 1.0) / (F.col("_ta") + F.col("_k"))
    pb = (F.col("n_b") + 1.0) / (F.col("_tb") + F.col("_k"))
    return joined.crossJoin(F.broadcast(tot)).select(
        F.lit(feature).alias("feature"),
        "bucket",
        "n_a",
        "n_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round((pb - pa) * F.log(pb / pa), 6).alias("psi_term"),
    )


def categorical_psi(
    df_a: DataFrame, df_b: DataFrame, col: str, *, feature: str | None = None
) -> DataFrame:
    """Per-category PSI terms between snapshot A (baseline) and B —
    ``(feature, bucket, n_a, n_b, p_a, p_b, psi_term)``; total PSI is
    ``sum(psi_term)``. Categories absent from one side get smoothed
    mass, so new/vanished sources still register drift."""
    a = df_a.select(F.col(col).cast("string").alias("bucket"))
    b = df_b.select(F.col(col).cast("string").alias("bucket"))
    return _psi_from_buckets(a, b, feature or col)


def quantile_edges(df: DataFrame, col: str, *, bins: int = 10) -> list[float]:
    """Exact interpolated quantile edges of ``col`` (bins-1 internal
    cuts) — one distributed aggregate."""
    probs = [i / bins for i in range(1, bins)]
    row = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs])).alias("e")
    ).first()
    return [float(x) for x in row["e"]]


def bucketize(col: Column, edges: list[float]) -> Column:
    """CASE-compiled bucket label: ``b01`` = (-inf, e1], …,
    ``b{k}`` = (e_{k-1}, inf). Literal expression — map-only."""
    n = len(edges) + 1
    out = F.lit(f"b{n:02d}")
    for i in range(len(edges), 0, -1):
        out = F.when(col <= F.lit(edges[i - 1]), F.lit(f"b{i:02d}")).otherwise(out)
    return out


def numeric_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    bins: int = 10,
    feature: str | None = None,
) -> DataFrame:
    """PSI over ``bins`` baseline-quantile buckets of a numeric column.
    Edges come from snapshot A only (the baseline), compiled into a
    literal CASE applied to both sides."""
    edges = quantile_edges(df_a, col, bins=bins)
    a = df_a.select(bucketize(F.col(col), edges).alias("bucket"))
    b = df_b.select(bucketize(F.col(col), edges).alias("bucket"))
    return _psi_from_buckets(a, b, feature or col)
