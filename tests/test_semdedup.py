"""SemDeDup invariants the SQL oracle can't check: the trained-centroid
(Lloyd) path separates planted clusters, the Arrow blockwise path agrees
exactly with the JVM join path, and assignment is scale-invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators import similarity as S
from ariadne_dbt_spark.operators.similarity import semantic_dedup


def _planted(spark, dim=8, n_groups=6, copies=4):
    """n_groups well-separated directions, `copies` BIT-IDENTICAL
    vectors per group (identical input → identical cosine to every
    centroid → same cluster guaranteed, regardless of training)."""
    rows = []
    for g in range(n_groups):
        base = [0.1] * dim
        base[g % dim] = 10.0 + g
        for c in range(copies):
            rows.append((g * 100 + c, list(base)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_trained_path_rule_consistent(spark):
    """Trained-Lloyd end-to-end: whatever assignment training produced,
    keep flags must satisfy the SemDeDup rule exactly (recomputed in
    numpy per cluster), and the planted copies must be pruned."""
    import numpy as np

    df = _planted(spark)
    out = semantic_dedup(df, eps=0.99, n_clusters=6, iters=4)
    rows = {r.vec_id: (r.cluster, r.keep) for r in out.collect()}
    vecs = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    dropped = {i for i, (_, k) in rows.items() if not k}
    # 3 of 4 identical copies per group must drop (more if clusters merge)
    assert len(dropped) >= 18
    for i, (cl_i, keep_i) in rows.items():
        neighbors = [
            j for j, (cl_j, _) in rows.items() if cl_j == cl_i and j < i
        ]
        has_dup = any(
            float(
                vecs[i] @ vecs[j] / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))
            )
            >= 0.99
            for j in neighbors
        )
        assert keep_i == (not has_dup), f"rule violated at {i}"


def test_arrow_path_matches_jvm_path(spark, monkeypatch):
    df = _planted(spark)
    jvm = {(r.vec_id, r.cluster, r.keep) for r in semantic_dedup(df, eps=0.99, n_clusters=6, iters=4).collect()}
    monkeypatch.setattr(S, "_ARROW_COSINE_MIN_DIM", 1)
    arrow = {(r.vec_id, r.cluster, r.keep) for r in semantic_dedup(df, eps=0.99, n_clusters=6, iters=4).collect()}
    assert jvm == arrow


def test_assignment_scale_invariant(spark):
    """cosine-argmax assignment: x and 2x land in the same cluster."""
    df = _planted(spark)
    doubled = df.select("vec_id", F.transform("embedding", lambda x: x + x).alias("embedding"))
    cents = [[float(i == j) for j in range(8)] for i in range(4)]
    a = {r.vec_id: r.cluster for r in semantic_dedup(df, centroids=cents).collect()}
    b = {r.vec_id: r.cluster for r in semantic_dedup(doubled, centroids=cents).collect()}
    assert a == b


def test_eps_monotone(spark):
    """Lower eps can only drop more."""
    df = _planted(spark)
    cents = [[float(i == j) for j in range(8)] for i in range(4)]
    strict = {r.vec_id for r in semantic_dedup(df, eps=0.999, centroids=cents).collect() if not r.keep}
    loose = {r.vec_id for r in semantic_dedup(df, eps=0.5, centroids=cents).collect() if not r.keep}
    assert strict <= loose
