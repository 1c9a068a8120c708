"""Z-order layout: row-group stats must stay tight on EVERY clustered
column, so a narrow filter on either dimension skips most row groups —
the property a single-column sort provably lacks on its second key."""

from __future__ import annotations

import pytest

from ariadne_dbt_spark.operators.layout import (
    rowgroup_overlap_fraction,
    z_value,
    zorder_write,
)


@pytest.fixture(scope="module")
def grid(spark):
    # 200x200 uniform integer grid -> 40k rows, two independent keys
    return spark.sql(
        """
        SELECT id % 200 AS x, CAST(id / 200 AS INT) AS y,
               id AS payload
        FROM range(40000)
        """
    )


def test_z_value_morton_interleave(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 5)], "a long, b long")
    got = df.select(z_value([F.col("a"), F.col("b")], bits=4).alias("z")).first().z
    # morton(3, 5) with a in even bit positions: a=0011, b=0101
    # z bits (LSB first): a0,b0,a1,b1,a2,b2,a3,b3 = 1,1,1,0,0,1,0,0 -> 0b00100111
    assert got == 0b00100111


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    zdir = str(tmp_path / "zorder")
    lindir = str(tmp_path / "linear")
    # force many row groups so stats have resolution
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(16 * 1024)
    )
    try:
        meta = zorder_write(grid, zdir, ["x", "y"], bits=6, n_files=16)
        assert set(meta["boundaries"]) == {"x", "y"}
        # baseline: same file count, sorted by x ONLY
        (
            grid.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lindir)
        )
    finally:
        spark.sparkContext._jsc.hadoopConfiguration().unset("parquet.block.size")

    # same total rows round-trip
    assert spark.read.parquet(zdir).count() == 40000

    # a 10%-wide filter on each dimension: the z-ordered layout must
    # skip most row groups on BOTH keys; the x-sorted baseline prunes
    # x but reads ~everything for y
    z_x = rowgroup_overlap_fraction(zdir, "x", 40, 59)
    z_y = rowgroup_overlap_fraction(zdir, "y", 40, 59)
    lin_x = rowgroup_overlap_fraction(lindir, "x", 40, 59)
    lin_y = rowgroup_overlap_fraction(lindir, "y", 40, 59)
    assert z_x < 0.5 and z_y < 0.5, (z_x, z_y)
    assert lin_y > 0.9, lin_y  # the single-sort layout can't prune y
    assert lin_x < 0.5, lin_x  # ...but of course prunes its own key
    # the trade: z gives up some single-key sharpness (z_x ~4x lin_x at
    # this row-group granularity) to buy pruning on BOTH keys — summed
    # over one query per dimension it reads strictly less
    assert z_x + z_y < lin_x + lin_y, (z_x, z_y, lin_x, lin_y)


def test_compact_parquet_small_files(spark, tmp_path):
    """20 one-row-ish files -> one right-sized file, same rows, and the
    live path never disappears (swap leaves no __tmp/__old behind)."""
    import os

    from ariadne_dbt_spark.operators.layout import compact_parquet

    p = str(tmp_path / "t")
    # simulate a streaming sink: 20 tiny appends
    for i in range(20):
        spark.range(i * 10, i * 10 + 10).write.mode("append").parquet(p)
    n_before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert n_before >= 20

    stats = compact_parquet(spark, p, target_mb=128)
    assert stats["files_out"] == 1
    n_after = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert n_after == 1
    got = sorted(r.id for r in spark.read.parquet(p).collect())
    assert got == list(range(200))
    assert not os.path.exists(p + "__tmp") and not os.path.exists(p + "__old")


def test_compact_parquet_sorted_reclusters(spark, tmp_path):
    """sort_by re-clusters during compaction: row-group stats become
    tight enough that a narrow filter prunes most groups."""
    from ariadne_dbt_spark.operators.layout import (
        compact_parquet,
        rowgroup_overlap_fraction,
    )

    p = str(tmp_path / "s")
    # append shuffled chunks so the initial layout has no order
    for i in range(8):
        spark.sql(
            f"SELECT ((id * 37) % 4000) AS k, id AS v FROM range({i*500}, {(i+1)*500})"
        ).write.mode("append").parquet(p)
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(16 * 1024)
    )
    try:
        compact_parquet(spark, p, target_mb=1, sort_by=["k"])
    finally:
        spark.sparkContext._jsc.hadoopConfiguration().unset("parquet.block.size")
    frac = rowgroup_overlap_fraction(p, "k", 100, 300)  # 5% slice
    assert frac < 0.5, frac
    assert spark.read.parquet(p).count() == 4000
