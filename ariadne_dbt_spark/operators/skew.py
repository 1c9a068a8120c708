"""Explicit skew mitigation: salted joins and hot-key splitting.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles sort-merge joins it can observe. This module is the
EXPLICIT tool for the cases AQE cannot rewrite — broadcast-ineligible
hot-key equi-joins feeding further keyed work, or engines/settings
without AQE — and doubles as the executable reference for the salting
pattern SCALE.md describes.

``salted_join(big, small, key, salts=S)``: the big side gets a
deterministic per-row salt in [0, S); the small side is replicated S
times with every salt value; the join runs on (key, salt), spreading
each hot key across S shuffle partitions. Row multiplicity is exactly
that of the unsalted join (each big row meets each matching small row
under precisely one salt), proven in tests/test_skew.py together with
the plan shape (join keys include the salt column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    *,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with an S-way salt on the
    shuffle. ``how`` supports inner and left (the big side is the
    preserved side; right/full would need the salt on the other side).

    The big-side salt is a deterministic hash of the whole row (stable
    across retries, unlike ``rand()``/``monotonically_increasing_id``),
    so the operator is safe under speculative execution and replays.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    b = big.withColumn("_salt", salt_col.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return b.join(s, keys + ["_salt"], how).drop("_salt")


def hot_keys(df: DataFrame, key: str | list[str], *, threshold_rows: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold_rows`` — the sampling
    step for split-join strategies (route hot keys through salted_join
    or broadcast, cold keys through a plain join)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > threshold_rows)
    )
