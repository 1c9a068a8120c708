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
    "kmv_sketch_table",
    "kmv_rollup",
    "kmv_estimate",
    "kmv_pairwise_overlap",
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


# --------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) sketch tables: set INTERSECTION
# --------------------------------------------------------------------------
#
# The fourth sketch answers the question the other three can't: how much
# do two sets OVERLAP (corpus-shard overlap, train/test user leakage,
# day-over-day audience churn) — HLL unions but cannot intersect. A KMV
# sketch is the k smallest hash values of a set; the bottom-k of a union
# is computable from two sketches, and the fraction of that bottom-k
# present in both sides estimates Jaccard (the classic KMV/theta-sketch
# estimator; RSE ~ 1/sqrt(k)).
#
# Hash values are stored SIGN-FLIPPED (xxhash64 XOR Long.MIN_VALUE) so
# the natural signed ordering of the stored longs equals the unsigned
# ordering of the raw hashes — every later step (array_sort, window
# order, element_at(k)) then uses plain JVM ordering, ANSI-safe with no
# overflow anywhere. The uniform fraction of a stored value v is
# v/2^64 + 0.5.

#: default bottom-k size: RSE ~ 1/sqrt(1024) ≈ 3.1%, 8 KB per group
DEFAULT_KMV_K = 1024

_LONG_MIN = -(1 << 63)


def _kmv_hash(value_col: str):
    return F.xxhash64(F.col(value_col)).bitwiseXOR(F.lit(_LONG_MIN))


def kmv_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: int = DEFAULT_KMV_K,
) -> DataFrame:
    """One scan → ``(group_cols..., n_rows, kmv)``: the sorted bottom-k
    distinct sign-flipped hashes of ``value_col`` per group (fewer when
    the group has under k distinct values — then the sketch IS the
    exact hashed set).

    Scale shape: distinct ``(group, hash)`` rows shuffle once; the
    bottom-k selection is a ``row_number`` window on that sort order —
    sort-based and streaming, never an unbounded per-group buffer —
    and only k rows per group survive into the KB-scale ``collect_list``.
    """
    from pyspark.sql.window import Window

    gcols = list(group_cols) or ["_all"]
    src = df if group_cols else df.withColumn("_all", F.lit(1))
    h = src.select(*gcols, _kmv_hash(value_col).alias("h"))
    counts = h.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy(*gcols).orderBy("h")
    bottom = (
        h.distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(*gcols)
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )
    out = counts.join(bottom, gcols)
    return out.drop("_all") if not group_cols else out


def kmv_rollup(
    sketch_df: DataFrame, group_cols: list[str], *, k: int = DEFAULT_KMV_K
) -> DataFrame:
    """Merge a KMV sketch table to a coarser grouping: bottom-k of the
    union of member sketches (explode → distinct → re-select — rows in
    flight are k × fine-groups, metadata-scale). The result is again a
    valid KMV table; merging is associative like the other sketches."""
    from pyspark.sql.window import Window

    gcols = list(group_cols) or ["_all"]
    src = sketch_df if group_cols else sketch_df.withColumn("_all", F.lit(1))
    counts = src.groupBy(*gcols).agg(F.sum("n_rows").alias("n_rows"))
    w = Window.partitionBy(*gcols).orderBy("h")
    bottom = (
        src.select(*gcols, F.explode("kmv").alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(*gcols)
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )
    out = counts.join(bottom, gcols)
    return out.drop("_all") if not group_cols else out


def _kmv_fraction(col):
    """Uniform [0,1) fraction of a stored (sign-flipped) hash."""
    return col.cast("double") / F.lit(float(1 << 64)) + F.lit(0.5)


def kmv_estimate(sketch_df: DataFrame, *, k: int = DEFAULT_KMV_K) -> DataFrame:
    """Append ``n_distinct_est``: exact ``size(kmv)`` when the group
    holds fewer than k distinct values, else the KMV estimator
    ``(k-1) / fraction(kth smallest)``."""
    full = F.size("kmv") >= k
    kth = _kmv_fraction(F.element_at("kmv", k))
    return sketch_df.withColumn(
        "n_distinct_est",
        F.when(full, (F.lit(float(k - 1)) / kth)).otherwise(
            F.size("kmv").cast("double")
        ),
    )


def kmv_pairwise_overlap(
    sketch_df: DataFrame,
    group_cols: list[str],
    *,
    k: int = DEFAULT_KMV_K,
) -> DataFrame:
    """All distinct group pairs with estimated set overlap:
    ``(a_<group...>, b_<group...>, union_est, jaccard_est,
    intersection_est)`` — computed ENTIRELY from the KB-scale sketches
    with JVM array HOFs (no rescan, no join of the underlying sets):

    * ``u`` = bottom-k of ``array_union(a, b)`` (valid because each side
      is itself a bottom-k: the union's k smallest hashes all appear in
      one of the sides' bottom-k);
    * ``jaccard_est`` = |u ∩ a ∩ b| / |u| (fraction of the union's
      uniform bottom-k sample present in both sides);
    * ``union_est`` from the kth smallest of ``u``;
    * ``intersection_est`` = jaccard_est × union_est.

    Pair fan-out is groups², which is the INTENDED regime (shards,
    days, sources — not users); every pair's work is O(k log k).
    """
    a = sketch_df.select(
        *[F.col(c).alias(f"a_{c}") for c in group_cols], F.col("kmv").alias("_ka")
    )
    b = sketch_df.select(
        *[F.col(c).alias(f"b_{c}") for c in group_cols], F.col("kmv").alias("_kb")
    )
    pair_pred = F.struct(*[F.col(f"a_{c}") for c in group_cols]) < F.struct(
        *[F.col(f"b_{c}") for c in group_cols]
    )
    u = F.slice(F.array_sort(F.array_union("_ka", "_kb")), 1, k)
    out = (
        a.crossJoin(b)
        .where(pair_pred)
        .withColumn("_u", u)
        .withColumn(
            "_matches",
            F.size(F.array_intersect(F.array_intersect("_u", "_ka"), "_kb")),
        )
        .withColumn(
            "union_est",
            F.when(
                F.size("_u") >= k,
                F.lit(float(k - 1)) / _kmv_fraction(F.element_at("_u", k)),
            ).otherwise(F.size("_u").cast("double")),
        )
        .withColumn(
            "jaccard_est",
            F.when(
                F.size("_u") > 0,
                F.col("_matches").cast("double") / F.size("_u").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("intersection_est", F.col("jaccard_est") * F.col("union_est"))
    )
    return out.select(
        *[f"a_{c}" for c in group_cols],
        *[f"b_{c}" for c in group_cols],
        "union_est",
        "jaccard_est",
        "intersection_est",
    )
