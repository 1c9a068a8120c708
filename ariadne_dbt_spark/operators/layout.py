"""Multi-dimensional table layout: Z-order clustering for parquet.

A table range-partitioned + sorted on ONE key prunes scans on that key
only; a filter on any other column reads everything. Z-ordering
interleaves the bits of several keys into one clustering value, so
min/max row-group statistics stay tight on EVERY participating column
— a filter on any one of them skips most row groups. This is the
standard layout move for 100 TB fact tables queried along several
independent dimensions (the same idea behind Delta/Iceberg OPTIMIZE
ZORDER); here it is plain Spark + parquet: quantile-bucketize each key,
interleave bits JVM-side, repartitionByRange + sortWithinPartitions on
the z-value, write.

Everything is column expressions — the only driver-side work is one
``approxQuantile`` call to learn bucket boundaries (rank-based
bucketing keeps skewed keys from collapsing the curve; a min-max
normalization would let one outlier stretch a dimension flat).

Reference scope analog: the reference engine stores its tables in
SQLite with single-column indexes only (schema.sql); physical layout
tooling is part of this repo's warehouse-scale extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketize(col: str, boundaries: list[float], bits: int) -> F.Column:
    """Map a numeric column to its quantile bucket id in [0, 2^bits)
    via the precomputed boundary list (len 2^bits - 1)."""
    # width_bucket against a sorted literal array: count boundaries <= x
    b = F.array(*[F.lit(float(v)) for v in boundaries])
    return F.aggregate(
        b,
        F.lit(0).cast("long"),
        lambda acc, v: acc + F.when(F.col(col).cast("double") >= v, 1).otherwise(0),
    )


def z_value(bucket_cols: list[F.Column], bits: int) -> F.Column:
    """Interleave ``bits`` bits of each bucket id, round-robin by bit
    position (dim-0 lowest): the classic Morton code, as one folded JVM
    expression over ``sequence`` (no UDF)."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    # bit i of dim d lands at position i*n + d; shiftleft needs literal
    # shift amounts, so the interleave unrolls to bits*n OR terms of
    # scalar bit ops — flat, codegen-friendly, no per-row loop
    for d, c in enumerate(bucket_cols):
        for i in range(bits):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + d))
    return z


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 32,
    extra_partition_cols: list[str] | None = None,
) -> tuple[DataFrame, dict]:
    """The reusable curve pipeline behind :func:`zorder_write` and
    ``table_store.optimize_table(zorder_by=)``: quantile-bucketize each
    NUMERIC key to ``bits`` bits (one ``approxQuantile`` pass),
    Morton-interleave, ``repartitionByRange`` + sort on the z-value.
    Returns (clustered frame with the original schema, boundary
    metadata). Refuses a frame that already has a ``_z`` column —
    silently replacing-then-dropping it would commit a rewrite MISSING
    the user's column.

    ``extra_partition_cols`` composes the curve with a hive layout
    (Delta's per-partition OPTIMIZE ZORDER): the exchange + sort key on
    ``(*partition_cols, z)`` so each task holds a contiguous z-band
    WITHIN one partition value and the partitioned write emits files
    whose footer ranges are tight inside their directory. The bucket
    boundaries are fit GLOBALLY (one approxQuantile pass over the whole
    table, not one per partition) — correctness-neutral: pruning uses
    each file's own min/max footers, the global fit only means a
    partition whose key distribution differs wildly from the table's
    uses fewer effective buckets."""
    if "_z" in df.columns:
        raise ValueError(
            "frame already has a column named '_z' (the z-order scratch "
            "name); rename it before z-ordering"
        )
    pcols = list(extra_partition_cols or [])
    overlap = [c for c in cols if c in pcols]
    if overlap:
        raise ValueError(
            f"zorder_by columns {overlap} are hive partition columns — "
            f"they are constant within each file's directory already; "
            f"z-order the non-partition keys only"
        )
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = {
        c: q
        for c, q in zip(
            cols,
            df.stat.approxQuantile([c for c in cols], probs, 0.001),
        )
    }
    buckets = [_bucketize(c, bounds[c], bits) for c in cols]
    order = [*pcols, "_z"]
    out = (
        df.withColumn("_z", z_value(buckets, bits))
        .repartitionByRange(n_files, *order)
        .sortWithinPartitions(*order)
        .drop("_z")
    )
    # note: _z must be dropped AFTER the exchange+sort or the range
    # partitioning has nothing to key on; Catalyst keeps the ordering
    return out, {"cols": list(cols), "bits": bits, "boundaries": bounds}


def zorder_write(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 32,
) -> dict:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols`` (see :func:`zorder_frame`) so row-group min/max stats are
    tight on every key. Returns the boundary metadata (persist it to
    bucketize query literals the same way if needed).
    """
    out, meta = zorder_frame(df, cols, bits=bits, n_files=n_files)
    out.write.mode("overwrite").parquet(out_dir)
    return meta


def rowgroup_overlap_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Fraction of parquet row groups whose [min, max] statistics for
    ``col`` intersect [lo, hi] — the fraction a stats-pruning reader
    must actually read. Driver-side metadata walk (pyarrow footers
    only, no data IO); the evidence behind the z-order claim."""
    import os

    import pyarrow.parquet as pq

    total = 0
    overlapping = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                c = grp.column(ci)
                if c.path_in_schema == col:
                    total += 1
                    st = c.statistics
                    if st is None or st.min is None:
                        overlapping += 1
                    elif not (st.max < lo or st.min > hi):
                        overlapping += 1
    return overlapping / total if total else 1.0


def compact_parquet(
    spark,
    path: str,
    *,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into ~``target_mb``-sized files —
    the maintenance pass every streaming/append sink needs (a
    foreachBatch or micro-batch writer leaves one small file per
    trigger; a 100 TB table read pays per-file open + footer + task
    overhead for each).

    File count = ceil(total_bytes / target), from a driver-side
    listing (no data scan); one shuffle (`repartition`, or a range
    partition + sort when ``sort_by`` re-clusters for pruning). The
    swap is crash-safe in the same order as the dbt executor's
    materialization (dbt_executor.py): write ``__tmp`` fully, move the
    live dir aside, promote, delete — no window where the path is
    unreadable, and a crash mid-swap leaves ``__old`` recoverable.
    """
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + "__tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(path.rstrip("/"), old)
    os.replace(tmp, path.rstrip("/"))
    shutil.rmtree(old)
    return {"input_bytes": total, "files_out": n_out}
