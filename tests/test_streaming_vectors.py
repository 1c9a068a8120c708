"""Streaming IVF maintenance (streaming/vector_stream.py): the
streamed-built index serves exactly the union of its micro-batches,
and the checkpoint makes re-runs exactly-once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.similarity import (
    brute_force_topk,
    ivf_query_index,
)
from ariadne_dbt_spark.streaming.vector_stream import ivf_ingest_stream


def _vectors(spark, n=60, dim=8):
    rows = [
        (i, [float(((i * 7 + j * 3) % 10)) for j in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_streamed_index_equals_bruteforce_and_is_exactly_once(spark, tmp_path):
    vec = _vectors(spark)
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    vec.repartition(3).write.parquet(src)

    n1 = ivf_ingest_stream(spark, src, idx, n_centroids=4, iters=2)
    assert n1 == 3  # one train batch + two appends

    q = [float(((5 * 7 + j * 3) % 10)) for j in range(8)]
    served = {
        (r.vec_id, round(r.cos_sim, 9))
        for r in ivf_query_index(spark, idx, q, k=10, nprobe=4).collect()
    }
    exact = {
        (r.vec_id, round(r.cos_sim, 9))
        for r in brute_force_topk(vec, q, k=10).collect()
    }
    assert served == exact

    # exactly-once: a re-run over the same checkpoint applies nothing,
    # and the served results are untouched
    n2 = ivf_ingest_stream(spark, src, idx, n_centroids=4, iters=2)
    assert n2 == 0
    served2 = {
        (r.vec_id, round(r.cos_sim, 9))
        for r in ivf_query_index(spark, idx, q, k=10, nprobe=4).collect()
    }
    assert served2 == exact

    # NEW files after the checkpoint are picked up as appends
    extra = spark.createDataFrame(
        [(1000, [float(((5 * 7 + j * 3) % 10)) for j in range(8)])],
        "vec_id bigint, embedding array<float>",
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    n3 = ivf_ingest_stream(spark, src, idx, n_centroids=4, iters=2)
    assert n3 == 1
    # ids 5,15,...,55 are exact clones of q (the generator is periodic
    # in 10), so the appended clone ties at cos 1.0 and ranks after
    # them by id — k=10 must include it
    got = {r.vec_id for r in ivf_query_index(spark, idx, q, k=10, nprobe=4).collect()}
    assert 1000 in got  # the appended exact match serves immediately

    # the checkpoint survived the first batch's index build (it lives
    # beside, not inside, the index dir)
    assert os.path.exists(idx + "_checkpoint")
