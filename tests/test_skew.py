"""salted_join: result parity with the plain join + salted plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.skew import hot_keys, salted_join


def _skewed_pair(spark):
    # 90% of big rows share one hot key
    big = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id").cast("string")).alias("dim")
    )
    return big, small


def test_salted_inner_join_parity(spark):
    big, small = _skewed_pair(spark)
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", salts=8).select("k", "payload", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_parity(spark):
    big, small = _skewed_pair(spark)
    # drop the hot key from the dim so left-join null preservation is exercised
    small2 = small.where(F.col("k") != 7)
    plain = big.join(small2, "k", "left").select("k", "payload", "dim")
    salted = salted_join(big, small2, "k", salts=8, how="left").select("k", "payload", "dim")
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_salt_is_in_the_join_keys(spark):
    big, small = _skewed_pair(spark)
    plan = (
        salted_join(big, small, "k", salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan  # the shuffle/join really runs on (k, _salt)


def test_hot_keys_detects_the_hot_key(spark):
    big, _ = _skewed_pair(spark)
    hot = {r["k"] for r in hot_keys(big, "k", threshold_rows=1000).collect()}
    assert hot == {7}
