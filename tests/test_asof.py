"""As-of / range join semantics: tie inclusivity, forward direction,
no-match nulls, bucketized ≡ broadcast paths."""

from __future__ import annotations

from ariadne_dbt_spark.operators.asof import asof_join, range_join


def _mk(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 7, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 10, 200.0), (1, 15, 300.0), (2, 9, 400.0)],
        "k long, ts long, v double",
    )
    return left, right


def test_asof_backward_with_ties(spark):
    left, right = _mk(spark)
    out = {
        (r.k, r.ts): r.v_right
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out[(1, 10)] == 200.0  # tie at ts=10 is inclusive
    assert out[(1, 20)] == 300.0
    assert out[(2, 5)] is None    # right row is later → no match
    assert out[(3, 7)] is None    # key has no right rows


def test_asof_forward(spark):
    left, right = _mk(spark)
    out = {
        (r.k, r.ts): r.v_right
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="forward",
        ).collect()
    }
    assert out[(1, 10)] == 200.0  # inclusive tie
    assert out[(1, 20)] is None   # nothing after ts=20
    assert out[(2, 5)] == 400.0


def test_range_join_paths_agree(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "pid long, x double"
    )
    intervals = spark.createDataFrame(
        [("lo", 0.0, 20.0), ("mid", 15.0, 35.0), ("hi", 30.0, 49.0)],
        "band string, lo double, hi double",
    )
    naive = {
        (r.pid, r.band)
        for r in range_join(
            points, intervals, point_col="x", lo_col="lo", hi_col="hi"
        ).collect()
    }
    bucketed = {
        (r.pid, r.band)
        for r in range_join(
            points, intervals, point_col="x", lo_col="lo", hi_col="hi", bucket_width=7.0
        ).collect()
    }
    assert naive == bucketed
    assert (17, "lo") in naive and (17, "mid") in naive  # overlap honored
