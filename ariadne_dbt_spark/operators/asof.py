"""As-of and range joins — operators Spark lacks natively, composed from
built-ins (the preference order in /opt/skills/guides/pyspark_guide.md:
compose DataFrame ops before reaching for applyInPandas).

* ``asof_join`` — the union+window encoding: tag both sides, union on a
  common schema, one window pass per key carries the latest right-side
  values forward (``last(..., ignorenulls=True)``), then keep left rows.
  ONE shuffle on the join key — same cost as a regular sort-merge join,
  no per-group pandas, no skew beyond the key's own.
* ``range_join`` — interval containment via bucketization: intervals
  explode into coarse buckets, point side equi-joins on (key, bucket),
  exact predicate filters the boundary spill. Turns an O(n·m) theta join
  into an equi-join Catalyst can shuffle-hash; bucket width trades
  duplication for selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest PRECEDING right row's values
    (``direction='backward'``, ties inclusive — matches DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``). ``'forward'`` mirrors it.

    Returns all left columns plus ``<value_col><suffix>`` for each value
    column (null when no right row qualifies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")

    lcols = left.columns
    out_vals = [f"{v}{suffix}" for v in value_cols]

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left at equal ts → ties are inclusive
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = [F.last(f"__v_{v}", ignorenulls=True).over(w).alias(o)
                  for v, o in zip(value_cols, out_vals)]
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts"), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = [F.first(f"__v_{v}", ignorenulls=True).over(w).alias(o)
                  for v, o in zip(value_cols, out_vals)]

    return (
        u.select(*lcols, F.col("__is_left").alias("__il"), *picked)
        .where(F.col("__il") == 1)
        .drop("__il")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: str | None = None,
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval containing it
    (``lo ≤ point ≤ hi``), optionally also equi-keyed on ``on``.

    With ``bucket_width`` set, intervals explode to bucket ids and the
    join is an equi-join on bucket (+ key) — the scale path. Without it,
    a broadcast theta join (correct for small interval dims).
    """
    exact = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    if bucket_width is None:
        cond = exact if on is None else ((points[on] == intervals[on]) & exact)
        return points.join(F.broadcast(intervals), cond, how)

    bw = float(bucket_width)
    p = points.withColumn("__b", F.floor(F.col(point_col) / bw).cast("long"))
    iv = intervals.withColumn(
        "__bi",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                F.floor(F.col(hi_col) / bw).cast("long"),
            )
        ),
    )
    # the exact predicate is part of the JOIN CONDITION (not a post-join
    # filter): a post-join .where() would silently drop the null-extended
    # rows of an outer join, degenerating how='left' to inner
    if on is not None:
        iv = iv.withColumnRenamed(on, "__on_r")
    cond = (p["__b"] == iv["__bi"]) & exact
    if on is not None:
        cond = cond & (p[on] == iv["__on_r"])
    return p.join(iv, cond, how).drop("__b", "__bi", "__on_r")


def scd2_history(
    df: DataFrame,
    *,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: collapse an append-only change
    stream into per-key attribute VALIDITY INTERVALS (the warehouse
    dimension-history build; reference keeps only current state —
    schema.sql models are full-refresh snapshots — so history derivation
    is a scale extension).

    Gaps-and-islands, exactly one shuffle on ``key_col``:

    1. ``lag(attr)`` over (key ORDER BY ts, tiebreak) marks change rows;
    2. a running ``sum(is_change)`` over the SAME window ordering
       numbers each run (``version``) — both windows and the subsequent
       ``groupBy(key, version)`` reuse the one HashPartitioning(key)
       exchange (ClusteredDistribution on a superset of the partition
       keys is satisfied without re-shuffling);
    3. per-run min/max/count collapse, then ``lead(valid_from)`` closes
       each interval half-open: ``valid_to`` = next version's
       ``valid_from``, NULL ⇒ ``is_current``.

    At 100 TB this is the canonical one-pass history build: no
    self-join, no iteration; skew is bounded by the hottest single key's
    event count (windows stream within a partition — no per-key
    materialization beyond the sort).

    Returns ``key, version, state, valid_from, valid_to, is_current,
    n_events`` with original column names for key/attr preserved.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    runs = df.select(
        key_col,
        ts_col,
        tiebreak_col,
        F.col(attr_col).alias("state"),
        F.lag(attr_col).over(w).alias("_prev"),
    ).withColumn(
        "version",
        F.sum(
            F.when(
                F.col("_prev").isNull() | (F.col("_prev") != F.col("state")), 1
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    collapsed = runs.groupBy(key_col, "version").agg(
        F.first("state").alias("state"),
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return collapsed.select(
        key_col,
        "version",
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )


def scd2_merge(
    existing: DataFrame,
    batch: DataFrame,
    *,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Incremental SCD Type-2 maintenance: apply a NEW batch of change
    events to an existing history table (the output shape of
    :func:`scd2_history`) without re-reading the raw history — the
    warehouse nightly-merge pattern. Result is identical to running
    ``scd2_history`` over the full event set (the gate's contract).

    Contract: the batch is APPEND-ONLY — every batch event's ``ts`` is
    at or after the key's current ``valid_from``. Late events that
    belong inside closed intervals need a reprocess of the affected
    keys (the standard SCD2 limitation).

    Shape: one shuffle on the key for the batch windows (lag seeded
    with each key's CURRENT state via a left join, so a batch that
    continues the open interval extends it instead of opening a new
    version), plus one join against the existing current rows. Closed
    historical rows pass through untouched; only batch keys recompute
    their ``valid_to``/``is_current`` chain.
    """
    from pyspark.sql.window import Window

    cur = existing.where(F.col("is_current")).select(
        F.col(key_col),
        F.col("version").alias("_cur_version"),
        F.col("state").alias("_cur_state"),
        F.col("valid_from").alias("_cur_vf"),
        F.col("n_events").alias("_cur_n"),
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    runs = (
        batch.select(key_col, ts_col, tiebreak_col, F.col(attr_col).alias("state"))
        .join(cur.select(key_col, "_cur_state", "_cur_version"), key_col, "left")
        .withColumn("_prev", F.coalesce(F.lag("state").over(w), F.col("_cur_state")))
        .withColumn(
            "_chg",
            F.when(F.col("_prev").isNull() | (F.col("_prev") != F.col("state")), 1).otherwise(0),
        )
        .withColumn(
            "version",
            F.coalesce(F.col("_cur_version"), F.lit(0))
            + F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    collapsed = runs.groupBy(key_col, "version").agg(
        F.first("state").alias("state"),
        F.min(ts_col).alias("_batch_vf"),
        F.count(F.lit(1)).alias("_batch_n"),
    )
    # fold the continuation group (version == current version) into the
    # open interval: original valid_from, summed event count
    updated = collapsed.join(cur, key_col, "left").select(
        key_col,
        "version",
        "state",
        F.when(F.col("version") == F.col("_cur_version"), F.col("_cur_vf"))
        .otherwise(F.col("_batch_vf"))
        .alias("valid_from"),
        (
            F.col("_batch_n")
            + F.when(F.col("version") == F.col("_cur_version"), F.col("_cur_n")).otherwise(
                F.lit(0)
            )
        ).alias("n_events"),
    )
    # a current row whose state was NOT continued by the batch (first
    # batch event changed it) must still appear, now closed
    batch_keys = updated.select(key_col).distinct()
    untouched_cur = (
        existing.where(F.col("is_current"))
        .join(updated.select(key_col, "version"), [key_col, "version"], "left_anti")
        .join(batch_keys, key_col, "left_semi")
        .select(key_col, "version", "state", "valid_from", F.col("n_events"))
    )
    closed_hist = existing.where(~F.col("is_current")).join(
        batch_keys, key_col, "left_semi"
    ).select(key_col, "version", "state", "valid_from", "n_events")
    rebuilt_keys = updated.unionByName(untouched_cur).unionByName(closed_hist)
    wv = Window.partitionBy(key_col).orderBy("version")
    rebuilt = rebuilt_keys.select(
        key_col,
        "version",
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )
    passthrough = existing.join(batch_keys, key_col, "left_anti").select(
        key_col, "version", "state", "valid_from", "valid_to", "is_current", "n_events"
    )
    return rebuilt.unionByName(passthrough)
