"""Streaming near-dup ingest: micro-batches flagged against the
persisted shingle index, accepted docs' postings appended so LATER
batches reject clones of EARLIER ones — deterministic end-state."""

from __future__ import annotations

import os

from ariadne_dbt_spark.operators.dedup import build_shingle_index
from ariadne_dbt_spark.streaming.neardup_stream import near_dup_ingest_stream

BASE = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (2, "completely different text about database engines and query plans now"),
    (3, "yet another unrelated document mentioning spark shuffles and joins ok"),
]


def test_near_dup_ingest_stream_cross_batch(spark, tmp_path):
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    src = str(tmp_path / "src")
    os.makedirs(src)

    corpus = spark.createDataFrame(BASE, "doc_id long, text string")
    build_shingle_index(corpus, idx, "doc_id", "text", n=3)

    # batch 1 (one file): a clone of corpus doc 1 (reject), a fresh doc
    # (accept), and an in-batch exact clone pair (first id wins)
    b1 = [
        (10, BASE[0][1]),                                    # reject: corpus dup
        (11, "a genuinely new document with words never seen before in here"),
        (12, "identical twin text inside one single micro batch of docs"),
        (13, "identical twin text inside one single micro batch of docs"),
    ]
    # batch 2 (second file): a clone of b1's ACCEPTED doc 11 (reject —
    # only possible because batch 1's postings were appended), a near
    # clone of corpus doc 2 (reject via threshold), and a fresh doc
    b2 = [
        (20, b1[1][1]),                                      # reject: cross-batch
        # append-one-word near clone: 9 of 10 shingles shared -> J=0.9
        (21, BASE[1][1] + " indeed"),                        # reject: near dup
        (22, "the final brand new record closing out this little stream test"),
    ]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )

    n = near_dup_ingest_stream(
        spark,
        src + "/*/",
        idx,
        out,
        n=3,
        threshold=0.8,
        max_files_per_trigger=1,
    )
    kept = {
        r.doc_id for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    }
    assert kept == {11, 12, 22}, kept
    assert n == 3
    # the index grew by exactly the accepted docs' postings — read
    # through the epoch pointer: the maintainer may have auto-compacted
    # mid-stream (round 9's bloom fpp signal fires on the tiny fold),
    # retiring the flat epoch-0 dir this test used to read directly
    from ariadne_dbt_spark.operators import epoch_store

    post_ids = {
        r.id
        for r in epoch_store.read_gen_data(spark, idx, "postings")
        .select("id").distinct().collect()
    }
    assert post_ids == {1, 2, 3, 11, 12, 22}, post_ids
