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


def test_replayed_microbatch_does_not_duplicate(spark, tmp_path):
    """Round 8 (ADVICE): foreachBatch is at-least-once — a crash AFTER
    ivf_append's stats.json commit but BEFORE the streaming checkpoint
    commit replays the micro-batch. apply_vector_batch (the exact
    function foreachBatch runs) must short-circuit the replayed
    epoch_id on the stream-epoch marker instead of blind-appending the
    same vec_ids under a fresh gen."""
    import json

    from ariadne_dbt_spark.streaming.vector_stream import apply_vector_batch

    vec = _vectors(spark)
    idx = str(tmp_path / "idx")
    sid = "ckpt-A"
    b0 = vec.where(F.col("vec_id") < 20)
    b1 = vec.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 40))
    b2 = vec.where(F.col("vec_id") >= 40)
    assert apply_vector_batch(b0, idx, sid, 0, n_centroids=4)
    assert apply_vector_batch(b1, idx, sid, 1, n_centroids=4)
    assert apply_vector_batch(b2, idx, sid, 2, n_centroids=4)
    with open(os.path.join(idx, "stats.json")) as f:
        stats1 = json.load(f)
    assert stats1["n_vectors"] == 60
    assert stats1["stream_epochs"] == {sid: 2}

    # the crash window: index commit landed, streaming commit didn't —
    # Structured Streaming re-invokes foreachBatch with the SAME epoch
    assert apply_vector_batch(b2, idx, sid, 2, n_centroids=4) is False
    with open(os.path.join(idx, "stats.json")) as f:
        stats2 = json.load(f)
    assert stats2["n_vectors"] == 60  # no duplicate append
    assert stats2["gen"] == stats1["gen"]

    # brute-force parity still holds after the replay
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

    # a LATER epoch under the same stream still applies
    extra = spark.createDataFrame(
        [(1000, [float(((5 * 7 + j * 3) % 10)) for j in range(8)])],
        "vec_id bigint, embedding array<float>",
    )
    assert apply_vector_batch(extra, idx, sid, 3, n_centroids=4)
    with open(os.path.join(idx, "stats.json")) as f:
        assert json.load(f)["n_vectors"] == 61

    # a DIFFERENT stream id (new checkpoint, epochs restart at 0) is
    # never falsely skipped
    extra2 = spark.createDataFrame(
        [(1001, [1.0] * 8)], "vec_id bigint, embedding array<float>"
    )
    assert apply_vector_batch(extra2, idx, "ckpt-B", 0, n_centroids=4)


def test_replayed_first_batch_build_does_not_duplicate(spark, tmp_path):
    """Crash after the FIRST batch's build but before its streaming
    commit: the replay sees stats.json exists and takes the APPEND
    path — the build-time stream-epoch marker must stop it."""
    import json

    from ariadne_dbt_spark.streaming.vector_stream import apply_vector_batch

    vec = _vectors(spark, n=20)
    idx = str(tmp_path / "idx")
    assert apply_vector_batch(vec, idx, "ckpt", 0, n_centroids=4)
    assert apply_vector_batch(vec, idx, "ckpt", 0, n_centroids=4) is False
    with open(os.path.join(idx, "stats.json")) as f:
        assert json.load(f)["n_vectors"] == 20
