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
    cuts).

    Round 10: VALUE-histogram rank selection instead of
    ``F.percentile`` — Spark's exact percentile buffers EVERY value of
    the column in one aggregation buffer (the known 100x scale-killer;
    same fix corpus_report_card and ccnet_perplexity_buckets carry).
    Here: one groupBy(value) count with map-side combine, a cumulative
    sum over DISTINCT values only, and per-edge rank cutoffs as
    conditional mins in a single tiny aggregate. The interpolation
    reproduces Spark's ``Percentile`` formula bit-for-bit
    (``lo·(k1-r) + hi·(r-k0)`` at rank ``r = p·(n-1)``), which is what
    the DuckDB ``quantile_cont`` oracles were verified against.

    Round 11: the cumulative sum is TWO-LEVEL distributed — the round-
    10 shape ran ``Window.orderBy`` with no partition, a single-
    partition pass over every distinct value (fine for int-length
    histograms, a scale-killer for a continuous column). Now the
    histogram is range-partitioned on the value, each partition
    cumulates independently under a per-partition window, and the
    cross-partition prefix is a tiny per-partition-total collect
    turned into a literal offset map — the textbook parallel prefix
    sum. No single task ever sees more than its value range. The
    range-partition count derives from the INPUT's optimizer size
    estimate (guide §2 — scale-adaptive, not a constant): one
    partition per ``SPARK_GRAFT_QE_PART_BYTES`` (64 MB default) of
    input, capped at the session parallelism — a small input keeps
    npart=1 and pays zero extra jobs (the range sample and the prefix
    collect only exist when there is something to distribute), a
    100 TB column fans out to every core."""
    import os as _os

    from pyspark.sql.window import Window

    probs = [i / bins for i in range(1, bins)]
    hist = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    part_bytes = int(
        _os.environ.get("SPARK_GRAFT_QE_PART_BYTES", str(64 * 1024 * 1024))
    )
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # estimate unavailable: assume big (the safe side)
        est = part_bytes * df.sparkSession.sparkContext.defaultParallelism
    npart = max(
        1,
        min(
            df.sparkSession.sparkContext.defaultParallelism,
            est // part_bytes,
        ),
    )
    if npart > 1:
        ranged = hist.repartitionByRange(npart, "_v").withColumn(
            "_pid", F.spark_partition_id()
        )
        ranged = ranged.persist()
        try:
            partials = {
                r["_pid"]: r["_t"]
                for r in ranged.groupBy("_pid")
                .agg(F.sum("_c").alias("_t"))
                .collect()
            }
            n = int(sum(partials.values()))
            if n == 0:
                raise ValueError(
                    f"quantile_edges({col!r}): no non-NULL values to cut"
                )
            offset = 0
            off_expr = F.lit(0)
            for pid in sorted(partials):
                off_expr = F.when(F.col("_pid") == pid, F.lit(offset)).otherwise(
                    off_expr
                )
                offset += partials[pid]
            wv = (
                Window.partitionBy("_pid")
                .orderBy("_v")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            cum = ranged.select(
                "_v", (F.sum("_c").over(wv) + off_expr).alias("_cum")
            )
            aggs = []
            for i, p in enumerate(probs):
                rank = p * (n - 1)
                aggs.append(
                    F.min(
                        F.when(F.col("_cum") >= int(rank // 1) + 1, F.col("_v"))
                    ).alias(f"_lo{i}")
                )
                aggs.append(
                    F.min(
                        F.when(F.col("_cum") >= int(-(-rank // 1)) + 1, F.col("_v"))
                    ).alias(f"_hi{i}")
                )
            row = cum.agg(*aggs).first()
        finally:
            ranged.unpersist()
    else:
        # small input: the single-partition cumulative IS the cheap
        # plan (one job, no range sample, no prefix collect) — n rides
        # the same pass as a global sum
        wv = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.select(
            "_v",
            F.sum("_c").over(wv).alias("_cum"),
            F.sum("_c").over(Window.partitionBy()).alias("_n"),
        )
        aggs = [F.max("_n").alias("_n")]
        for i, p in enumerate(probs):
            rank = F.lit(p) * (F.col("_n") - 1).cast("double")
            aggs.append(
                F.min(
                    F.when(F.col("_cum") >= F.floor(rank) + 1, F.col("_v"))
                ).alias(f"_lo{i}")
            )
            aggs.append(
                F.min(
                    F.when(F.col("_cum") >= F.ceil(rank) + 1, F.col("_v"))
                ).alias(f"_hi{i}")
            )
        row = cum.agg(*aggs).first()
        if row["_n"] is None:
            raise ValueError(
                f"quantile_edges({col!r}): no non-NULL values to cut"
            )
        n = int(row["_n"])
    edges = []
    for i, p in enumerate(probs):
        r = p * (n - 1)
        k0, k1 = float(int(r // 1)), float(-(-r // 1))
        lo, hi = float(row[f"_lo{i}"]), float(row[f"_hi{i}"])
        edges.append(lo if k0 == k1 else lo * (k1 - r) + hi * (r - k0))
    return edges


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
