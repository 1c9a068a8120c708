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


# --- SCD Type-2 history --------------------------------------------------


def test_scd2_history_hand_stream(spark):
    """Change stream A A B A: three versions, half-open intervals chained
    exactly, only the last current; same-ts rows break ties on the
    tiebreak column."""
    import datetime as dt

    from ariadne_dbt_spark.operators.asof import scd2_history

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (7, t0, 1, "A"),
        (7, t0 + dt.timedelta(hours=1), 2, "A"),
        (7, t0 + dt.timedelta(hours=2), 3, "B"),
        (7, t0 + dt.timedelta(hours=3), 4, "A"),
        # second key: single state, always current
        (8, t0, 5, "X"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = scd2_history(
        df, key_col="user_id", attr_col="event_type", ts_col="ts", tiebreak_col="event_id"
    )
    got = {(r["user_id"], r["version"]): r for r in out.collect()}
    assert len(got) == 4
    v1, v2, v3 = got[(7, 1)], got[(7, 2)], got[(7, 3)]
    assert (v1["state"], v2["state"], v3["state"]) == ("A", "B", "A")
    assert v1["n_events"] == 2 and v2["n_events"] == 1 and v3["n_events"] == 1
    # half-open chain: each valid_to is the next valid_from
    assert v1["valid_to"] == v2["valid_from"] and v2["valid_to"] == v3["valid_from"]
    assert (v1["is_current"], v2["is_current"], v3["is_current"]) == (False, False, True)
    assert v3["valid_to"] is None
    assert got[(8, 1)]["is_current"] and got[(8, 1)]["n_events"] == 1


def test_scd2_same_timestamp_tiebreak(spark):
    """Two different states at the SAME ts: the tiebreak column orders
    them deterministically into two versions."""
    import datetime as dt

    from ariadne_dbt_spark.operators.asof import scd2_history

    t0 = dt.datetime(2024, 6, 1)
    df = spark.createDataFrame(
        [(1, t0, 10, "A"), (1, t0, 11, "B")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = scd2_history(
        df, key_col="user_id", attr_col="event_type", ts_col="ts", tiebreak_col="event_id"
    ).collect()
    by_ver = {r["version"]: r["state"] for r in out}
    assert by_ver == {1: "A", 2: "B"}


def test_scd2_merge_equals_full_rebuild(spark):
    """Batch with: a continuation (key 1 keeps A), a change (key 1 then
    B), a brand-new key (3), and an untouched key (2, no batch rows) —
    merged output must equal scd2_history over the full stream."""
    import datetime as dt

    from ariadne_dbt_spark.operators.asof import scd2_history, scd2_merge

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    old = [
        (1, ts(0), 1, "A"),
        (1, ts(1), 2, "B"),
        (1, ts(2), 3, "A"),  # key 1 current state A
        (2, ts(0), 4, "X"),  # key 2: untouched by batch
    ]
    new = [
        (1, ts(3), 5, "A"),  # continuation of current interval
        (1, ts(4), 6, "B"),  # change -> closes it
        (3, ts(3), 7, "Z"),  # brand-new key
        (3, ts(5), 8, "W"),
    ]
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    kw = dict(key_col="user_id", attr_col="event_type", ts_col="ts", tiebreak_col="event_id")
    merged = scd2_merge(
        scd2_history(spark.createDataFrame(old, schema), **kw),
        spark.createDataFrame(new, schema),
        **kw,
    )
    full = scd2_history(spark.createDataFrame(old + new, schema), **kw)
    key = ["user_id", "version"]
    m = {tuple(r[k] for k in key): r for r in merged.collect()}
    f = {tuple(r[k] for k in key): r for r in full.collect()}
    assert set(m) == set(f)
    for k in f:
        for col in ("state", "valid_from", "valid_to", "is_current", "n_events"):
            assert m[k][col] == f[k][col], (k, col, m[k][col], f[k][col])
    # spot-check semantics: key 1's A-interval absorbed the continuation
    assert m[(1, 3)]["n_events"] == 2 and m[(1, 3)]["state"] == "A"
    assert m[(1, 4)]["is_current"] and m[(2, 1)]["is_current"] and m[(3, 2)]["is_current"]
