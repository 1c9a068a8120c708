"""Degenerate-input robustness for the round-5 operators: NULL text,
empty text, single-token docs, empty frames — no exceptions, sensible
outputs (ANSI mode raises on silent overflow, so these paths must be
explicitly total)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def edge_docs(spark):
    return spark.createDataFrame(
        [(1, None), (2, ""), (3, "solo"), (4, "two tokens"), (5, "   ")],
        "doc_id long, text string",
    )


def test_lm_ops_total_on_edge_docs(edge_docs):
    from ariadne_dbt_spark.operators.lm import lm_cross_entropy, train_bigram_lm

    # only doc 4 has a bigram; NULL/empty/single-token docs drop out
    out = lm_cross_entropy(edge_docs, "doc_id", "text").collect()
    assert {r.doc_id for r in out} == {4}
    assert train_bigram_lm(edge_docs, "doc_id", "text").count() == 1


def test_gopher_total_on_edge_docs(edge_docs):
    from ariadne_dbt_spark.operators.text import gopher_quality_flags

    rows = {r.id: r for r in gopher_quality_flags(edge_docs, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # NULL text behaves exactly like empty text
    r1, r2 = rows[1].asDict(), rows[2].asDict()
    assert r1 == {**r2, "id": 1}
    assert r1["n_words"] == 0 and not r1["r_word_count"] and not r1["pass_all"]
    assert not rows[3].r_word_count and not rows[3].pass_all


def test_spans_and_shuffle_total_on_edge_docs(edge_docs):
    from ariadne_dbt_spark.operators.dedup import shared_span_pairs
    from ariadne_dbt_spark.operators.sampling import deterministic_shuffle

    assert shared_span_pairs(edge_docs, "doc_id", "text", k=4, min_span=8).count() == 0
    sh = deterministic_shuffle(edge_docs, "doc_id", seed=1)
    assert sh.count() == 5  # NULL text survives: key is the id


def test_bpe_total_on_edge_docs(edge_docs, spark):
    from ariadne_dbt_spark.operators.bpe import bpe_encode, bpe_train, word_counts

    wc = word_counts(edge_docs, "text")
    got = {r.word for r in wc.collect()}
    assert got == {"solo", "two", "tokens"}
    merges = bpe_train(wc, 3)
    enc = {r.doc_id: r.bpe_tokens for r in bpe_encode(edge_docs, "text", merges).collect()}
    assert enc[3] and enc[2] == []  # empty text -> empty token list


def test_semdedup_empty_and_single(spark):
    from ariadne_dbt_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0], [0.0, 1.0]]
    one = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    out = semantic_dedup(one, centroids=cents).collect()
    assert len(out) == 1 and out[0].keep
    empty = one.where(F.col("vec_id") < 0)
    assert semantic_dedup(empty, centroids=cents).count() == 0


def test_corpus_diff_identical_snapshots(spark):
    from ariadne_dbt_spark.operators.versioning import corpus_diff

    df = spark.createDataFrame([(1, "a b"), (2, "c d")], "doc_id long, text string")
    out = {r.status for r in corpus_diff(df, df, "doc_id", "text").collect()}
    assert out == {"unchanged"}


def test_urls_malformed_inputs(spark):
    from ariadne_dbt_spark.operators.urls import normalize_url, registered_domain

    df = spark.createDataFrame(
        [(1, ""), (2, "no scheme here"), (3, "http://"), (4, None)],
        "i long, url string",
    )
    rows = df.select(
        "i", normalize_url("url").alias("n"), registered_domain("url").alias("d")
    ).collect()
    got = {r.i: (r.n, r.d) for r in rows}
    assert got[1] == ("", "") and got[2][1] == ""
    assert got[4] == (None, None)  # NULL propagates, never raises


def test_unicode_normalize_matches_duckdb(spark):
    """Char-for-char parity with the oracle's nfc_normalize /
    strip_accents on composed, decomposed, stacked-mark, ligature and
    fullwidth inputs (ligatures/fullwidth are NOT touched by NFC —
    that's NFKC, deliberately not applied)."""
    import duckdb

    from ariadne_dbt_spark.operators.text import unicode_normalize

    samples = [
        "café", "café", "Zürich", "señor",
        "naïve", "ﬁre", "Ａｂｃ", "ę́", "",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, s string"
    )
    got = {
        r.i: (r.n, r.st)
        for r in df.select(
            "i",
            unicode_normalize("s").alias("n"),
            unicode_normalize("s", strip_marks=True).alias("st"),
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        want = con.sql(
            "SELECT nfc_normalize(?), strip_accents(nfc_normalize(?))", params=[s, s]
        ).fetchone()
        assert got[i] == want, f"{s!r}: {got[i]!r} != {want!r}"
