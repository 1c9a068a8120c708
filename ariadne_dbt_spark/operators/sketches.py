"""Mergeable sketch tables: pre-aggregated HyperLogLog / Count-Min
summaries that answer distinct-count and frequency questions WITHOUT
rescanning raw data.

The 100 TB pattern this enables (the reason sketches matter at all —
``approx_count_distinct`` alone still scans the corpus every time):

* **Build once per ingest partition.** Each day/shard of a 100 TB fact
  table reduces to a KB-scale row of sketch bytes per group — one scan,
  at ingest time, embarrassingly parallel.
* **Merge, don't rescan.** Distinct-users-per-type over ANY subset of
  days is a union of the stored sketches — metadata-scale work. HLL
  union is lossless (the merged sketch equals the sketch of the unioned
  stream), so the pre-aggregation costs no accuracy; CMS tables of the
  same shape add cell-wise.
* **Any coarser grouping later.** The sketch table is built at the
  FINEST grouping you'll ever ask about; every rollup above it is a
  union. This is the classic "data cube of sketches" design (see the
  Apache DataSketches system papers) — Spark ships the DataSketches HLL
  under ``hll_sketch_agg`` / ``hll_union_agg``.

HLL uses only public ``pyspark.sql.functions`` (JVM-side, codegen);
rollups are plain groupBy so Catalyst/AQE treat them like any
aggregate. Count-Min uses Spark's ``count_min_sketch`` aggregate for
the BUILD (one JVM pass over the data); because Spark exposes no SQL
function to query or union the resulting bytes, the metadata-scale
side (merge across partitions, point estimates) is implemented here in
NumPy against the documented V1 serialization — sketch tables are
KB-per-group, so post-build work is never data-scale.

Reference parity: the reference engine has no sketch subsystem (it
rebuilds aggregates wholesale, ``src/ariadne_dbt/indexer.py``); this
module is part of the §8 scale extensions a 100 TB corpus pipeline
needs (per-domain URL cardinality, per-shard token-frequency probes).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "hll_sketch_table",
    "hll_rollup",
    "hll_estimate",
    "cms_sketch_table",
    "cms_parse",
    "cms_serialize",
    "cms_merge",
    "cms_query",
    "cms_rollup_estimates",
    "value_histogram_table",
    "histogram_rollup",
    "histogram_quantiles",
]

#: DataSketches HLL lgK default: 2^12 registers ≈ 0.8% relative
#: standard error — 4 KB per group, fine for per-partition tables
DEFAULT_LGK = 12


# --------------------------------------------------------------------------
# HyperLogLog sketch tables
# --------------------------------------------------------------------------


def hll_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One scan of ``df`` → ``(group_cols..., n_rows, sketch)`` with a
    DataSketches HLL over ``value_col`` per group. Build this at the
    FINEST grouping you will ever roll up to (e.g. ``[day, domain]``)
    and persist it partitioned by the ingest key — every later
    distinct-count question is a union of these rows, never a rescan.

    The sketch column is opaque binary; pair it with ``n_rows`` (an
    exact count) so rollups can report both mass and cardinality.
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
    )


def hll_rollup(
    sketch_df: DataFrame, group_cols: list[str], *, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Roll a sketch table up to a coarser grouping:
    ``(group_cols..., n_rows, n_distinct_est)``. Input rows are
    KB-scale sketches — this aggregate shuffles sketch bytes, not raw
    data, so it is metadata-scale no matter how large the corpus that
    built the table was. ``allowDifferentLgConfigK`` stays False: a
    mixed-precision union silently degrades to the coarsest sketch, so
    feeding tables built at different lgK is refused loudly."""
    grouped = (
        sketch_df.groupBy(*group_cols)
        if group_cols
        else sketch_df.groupBy(F.lit(1).alias("_all"))
    )
    out = grouped.agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(False))
        ).alias("n_distinct_est"),
    )
    return out.drop("_all") if not group_cols else out


def hll_estimate(sketch_df: DataFrame) -> DataFrame:
    """Per-row estimate of an existing sketch table (no union):
    appends ``n_distinct_est``."""
    return sketch_df.withColumn(
        "n_distinct_est", F.hll_sketch_estimate(F.col("sketch"))
    )


# --------------------------------------------------------------------------
# Count-Min sketch tables (mergeable frequency summaries)
# --------------------------------------------------------------------------
#
# Spark's `count_min_sketch` aggregate serializes
# org.apache.spark.util.sketch.CountMinSketchImpl V1 (big-endian,
# java.io.DataOutputStream):
#
#   int32   version            (= 1)
#   int64   totalCount
#   int32   depth              (= ceil(ln(1/(1-confidence)) / ln 2))
#   int32   width              (= ceil(2 / eps))
#   int64[depth]       hashA   (per-row hash multipliers from seed)
#   int64[depth*width] table   (row-major counts)
# (layout pinned empirically: planted counts land at the buckets this
# module computes — see tests/test_sketches.py)
#
# For a LONG item the bucket in row i is (stream-lib lineage):
#   h = hashA[i] * item          (64-bit wrapping)
#   h += h >> 32                 (arithmetic shift)
#   h &= (1 << 31) - 1
#   bucket = h % width
# tests/test_sketches.py pins this empirically: planted exact counts on
# a wide sketch must read back exactly.

_CMS_VERSION = 1
_CMS_PRIME = (1 << 31) - 1
_MASK64 = (1 << 64) - 1


def cms_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    *,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 11,
) -> DataFrame:
    """One scan → ``(group_cols..., n_rows, cms)`` with a Count-Min
    sketch of the LONG column ``item_col`` per group. Width is
    ``ceil(2/eps)`` int64 cells × ``depth`` rows, so eps=1e-4 is ~1.1 MB
    per group — size the grouping accordingly (per-day, not per-user).

    Long items only, by design: Spark hashes strings into CMS with a
    private Murmur3 path we refuse to re-implement; hash string keys to
    ``xxhash64`` first (frequency estimation only needs identity, and
    a 64-bit collision is ~n²/2⁶⁴ — the same disclosed trade every
    hashed operator here makes). All sketches that will ever be merged
    must share (eps, confidence, seed) — ``cms_merge`` enforces it via
    the serialized dims + hashA.
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_min_sketch(
            F.col(item_col).cast("long"),
            F.lit(float(eps)),
            F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("cms"),
    )


def cms_parse(raw: bytes) -> dict:
    """Decode a V1 CountMinSketch payload → dict of
    ``{total, depth, width, table (numpy int64 [depth,width]), hashA}``."""
    import numpy as np

    version, total, depth, width = struct.unpack(">iqii", raw[:20])
    if version != _CMS_VERSION:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    need = 20 + 8 * depth + 8 * depth * width
    if len(raw) != need:
        raise ValueError(f"CMS payload {len(raw)}B, expected {need}B")
    hash_a = np.frombuffer(raw, dtype=">i8", count=depth, offset=20).astype(
        np.int64
    )
    table = (
        np.frombuffer(raw, dtype=">i8", count=depth * width, offset=20 + 8 * depth)
        .astype(np.int64)
        .reshape(depth, width)
    )
    return {
        "total": total,
        "depth": depth,
        "width": width,
        "table": table,
        "hashA": hash_a,
    }


def cms_serialize(sk: dict) -> bytes:
    """Inverse of :func:`cms_parse` — byte-identical round-trip, so a
    merged sketch can be stored back into a sketch table and later
    merged again (associative, like the HLL path)."""
    head = struct.pack(
        ">iqii", _CMS_VERSION, int(sk["total"]), sk["depth"], sk["width"]
    )
    return (
        head
        + sk["hashA"].astype(">i8").tobytes()
        + sk["table"].astype(">i8").tobytes()
    )


def cms_merge(payloads) -> bytes:
    """Union of CMS payloads built with the SAME (eps, confidence,
    seed): cell-wise table add + totalCount add (exactly Spark's
    ``mergeInPlace``). Dimension or hashA mismatch raises — adding
    tables hashed differently yields garbage silently otherwise."""
    import numpy as np

    acc = None
    for raw in payloads:
        sk = cms_parse(bytes(raw))
        if acc is None:
            acc = sk
            acc["table"] = acc["table"].copy()
            continue
        same_dims = (acc["depth"], acc["width"]) == (sk["depth"], sk["width"])
        if not same_dims or not np.array_equal(acc["hashA"], sk["hashA"]):
            raise ValueError(
                "cannot merge CountMin sketches with different "
                "(eps, confidence, seed) parameters"
            )
        acc["table"] += sk["table"]
        acc["total"] += sk["total"]
    if acc is None:
        raise ValueError("cms_merge: no payloads")
    return cms_serialize(acc)


def _cms_buckets(sk: dict, item: int):
    """Per-row bucket indices for a long item (vectorized over rows)."""
    import numpy as np

    item_u = np.uint64(int(item) & _MASK64)
    with np.errstate(over="ignore"):
        # Java's long arithmetic wraps mod 2^64; uint64 multiply +
        # int64 reinterpretation reproduces it exactly
        h = (sk["hashA"].astype(np.uint64) * item_u).view(np.int64)
        h = h + (h >> np.int64(32))  # arithmetic shift, wrapping add
    h = h & np.int64(_CMS_PRIME)
    return (h % np.int64(sk["width"])).astype(np.int64)


def cms_query(raw: bytes, items) -> list[int]:
    """Point frequency estimates for long ``items`` — min over the
    depth rows; never underestimates, overestimates by at most
    ``eps * totalCount`` with probability ``confidence``."""
    import numpy as np

    sk = cms_parse(bytes(raw))
    rows = np.arange(sk["depth"])
    out = []
    for it in items:
        buckets = _cms_buckets(sk, int(it))
        out.append(int(sk["table"][rows, buckets].min()))
    return out


def cms_rollup_estimates(
    sketch_df: DataFrame,
    group_cols: list[str],
    items: list[int],
    spark: SparkSession,
) -> DataFrame:
    """Merge a CMS sketch table to a coarser grouping and emit point
    estimates: ``(group_cols..., item, freq_est)``. Runs as
    ``applyInPandas`` over the GROUPED SKETCH TABLE — per group the
    input is a handful of ~MB payloads, so executor memory is bounded
    by sketch size × partitions-per-group, never by corpus size."""
    import pandas as pd

    items = [int(i) for i in items]

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = cms_merge(list(pdf["cms"]))
        ests = cms_query(merged, items)
        base = {c: pdf[c].iloc[0] for c in group_cols}
        return pd.DataFrame(
            [{**base, "item": it, "freq_est": est} for it, est in zip(items, ests)]
        )

    fields = ", ".join(
        f"{c} {t}"
        for c, t in [
            *(
                (c, dict(sketch_df.dtypes)[c])
                for c in group_cols
            ),
            ("item", "bigint"),
            ("freq_est", "bigint"),
        ]
    )
    return sketch_df.groupBy(*group_cols).applyInPandas(_merge, schema=fields)


# --------------------------------------------------------------------------
# Value-histogram sketch tables (mergeable order statistics)
# --------------------------------------------------------------------------
#
# The third leg of the sketch-table trio: HLL answers distinct-count,
# CMS answers point frequency, the value histogram answers ORDER
# statistics (medians / p90 / p99) — and unlike KLL/t-digest it is
# LOSSLESS for discrete (or deliberately quantized) values: the merged
# histogram of two partitions IS the histogram of their union, so any
# quantile read off a rollup equals the exact quantile of the raw data.
# Size is bounded by the number of DISTINCT values, not rows — quantize
# first (round / floor-to-cents / bucketize) when the domain is
# continuous; the repo already uses the same recipe driver-side for
# report-card percentiles (workloads/textstats.py value-histogram rank
# selection), this module makes it a PERSISTABLE table like the other
# two sketches.


def value_histogram_table(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """One scan of ``df`` → ``(group_cols..., value, cnt)``: an exact
    exploded histogram per group, built at the FINEST grouping you will
    ever roll up to and persisted partitioned by the ingest key.

    ``value_col`` must be discrete (integers, cents, rounded scores) —
    the table's size per group is its distinct-value count, and every
    merge/rollup above it is a ``SUM(cnt)``, never a rescan. Quantize
    continuous domains before calling (e.g. ``FLOOR(x*100)`` for
    cents): the quantization error is then a DESIGN choice made once at
    ingest, not an opaque sketch property.
    """
    return df.groupBy(*group_cols, F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_rollup(hist_df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge a histogram table to a coarser grouping — a lossless
    ``SUM(cnt)`` per ``(group, value)``. The result is again a
    histogram table (associative, like ``hll_union_agg``/``cms_merge``),
    so it can be persisted and rolled up further."""
    return hist_df.groupBy(*group_cols, "value").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist_df: DataFrame, group_cols: list[str], probs: list[float]
) -> DataFrame:
    """Exact discrete quantiles read off a (rolled-up) histogram table:
    ``(group_cols..., p, q, n_rows)`` where ``q`` is the smallest value
    whose cumulative count reaches ``max(ceil(p * n_rows), 1)`` — the
    lower discrete-quantile convention (p=1.0 → max, p→0 → min), chosen
    because it is expressible identically in ANSI SQL (the oracle pins
    it value-exactly, not within-epsilon like HLL/CMS).

    Scale shape: ONE window over distinct values per group (the same
    bounded-buffer posture as the report-card percentile recipe — the
    window runs over the histogram's rows, never corpus rows), then a
    map-side explode of ``probs``; a row emits ``p`` exactly when the
    target rank falls inside its ``(cum - cnt, cum]`` span, so no
    second join or per-group collect exists.
    """
    from pyspark.sql.window import Window

    merged = histogram_rollup(hist_df, group_cols)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    cum = merged.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_rows", F.sum("cnt").over(wg)
    )
    out = (
        cum.select(
            *group_cols,
            "value",
            "cnt",
            "cum",
            "n_rows",
            F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"),
        )
        .withColumn(
            "target",
            F.greatest(F.ceil(F.col("p") * F.col("n_rows")), F.lit(1)).cast("long"),
        )
        .where(
            (F.col("cum") >= F.col("target"))
            & (F.col("cum") - F.col("cnt") < F.col("target"))
        )
        .select(*group_cols, "p", F.col("value").alias("q"), "n_rows")
    )
    return out
