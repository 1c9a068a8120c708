"""Model-based language ID (operators/langid.py) — pins the round-6
buzzer-landed classifier: featurization determinism, label↔prediction
mapping, held-out confusion diagonal on the planted corpus, and the
CCNet wiring (perplexity_buckets keyed off the model when no curated
lang column exists)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.langid import (
    LANG_LEXICONS,
    char_ngram_tokens,
    detect_language_model,
    synth_lang_corpus,
    train_language_classifier,
)


def test_lexicons_pairwise_disjoint_and_big_enough():
    seen: dict[str, str] = {}
    for lang, words in LANG_LEXICONS.items():
        assert len(words) >= 10
        for w in words:
            assert w not in seen, f"{w!r} in both {seen.get(w)} and {lang}"
            seen[w] = lang
    assert len(LANG_LEXICONS) == 12


def test_char_ngram_tokens_exact_and_deterministic(spark):
    df = spark.createDataFrame([("AbC",), ("x",)], "t string")
    got = [r["g"] for r in df.select(char_ngram_tokens("t").alias("g")).collect()]
    # " abc " → [" ab", "abc", "bc "]; " x " → [" x "]
    assert got[0] == [" ab", "abc", "bc "]
    assert got[1] == [" x "]
    again = [r["g"] for r in df.select(char_ngram_tokens("t").alias("g")).collect()]
    assert got == again


def test_synth_corpus_words_come_from_the_assigned_lexicon(spark):
    corpus = synth_lang_corpus(spark.range(36).withColumnRenamed("id", "doc_id"), "doc_id")
    for r in corpus.collect():
        lex = set(LANG_LEXICONS[r["lang_true"]])
        assert set(r["text"].split()) <= lex


def test_train_detect_confusion_is_diagonal(spark):
    n_langs = len(LANG_LEXICONS)
    corpus = synth_lang_corpus(
        spark.range(n_langs * 20).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    half = F.expr(f"(doc_id div {n_langs}) % 2")
    clf = train_language_classifier(corpus.where(half == 0), "text", "lang_true")
    # labels are the alphabetical language codes — the prediction→code
    # mapping detect_language_model relies on
    assert clf["labels"] == sorted(LANG_LEXICONS)
    pred = detect_language_model(corpus.where(half == 1), clf, "text")
    rows = pred.select("lang_true", "lang_pred", "lang_prob").collect()
    assert len(rows) == n_langs * 10
    for r in rows:
        assert r["lang_pred"] == r["lang_true"]
        assert r["lang_prob"] > 0.9
    # inference is map-only: no exchange in the scoring plan
    plan = pred._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_perplexity_buckets_model_keyed_equals_curated(spark):
    """CCNet wiring: with NO curated lang column, perplexity_buckets
    keys the terciles off the trained classifier — and on the planted
    corpus (perfect classifier) that equals the curated-column result
    exactly."""
    from ariadne_dbt_spark.operators.lm import perplexity_buckets

    n_langs = len(LANG_LEXICONS)
    corpus = synth_lang_corpus(
        spark.range(n_langs * 12).withColumnRenamed("id", "doc_id"),
        "doc_id",
        words_per_doc=12,
    ).localCheckpoint(eager=True)
    clf = train_language_classifier(corpus, "text", "lang_true")

    curated = perplexity_buckets(
        corpus.withColumnRenamed("lang_true", "lang"),
        "doc_id",
        "text",
        lang_col="lang",
    )
    derived = perplexity_buckets(
        corpus.select("doc_id", "text"), "doc_id", "text", lang_clf=clf
    )
    a = sorted(map(tuple, curated.collect()))
    b = sorted(map(tuple, derived.collect()))
    assert a == b


def test_perplexity_buckets_arg_validation(spark):
    from ariadne_dbt_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame([(1, "a b", "en")], "doc_id bigint, text string, lang string")
    with pytest.raises(ValueError):
        perplexity_buckets(df, "doc_id", "text")
    with pytest.raises(ValueError):
        perplexity_buckets(df, "doc_id", "text", lang_col="lang", lang_clf={})


def test_classifier_save_load_roundtrip(spark, tmp_path):
    """Persisted classifier predicts identically after reload — the
    train-once / load-everywhere production shape."""
    from ariadne_dbt_spark.operators.langid import (
        load_language_classifier,
        save_language_classifier,
    )

    n_langs = len(LANG_LEXICONS)
    corpus = synth_lang_corpus(
        spark.range(n_langs * 10).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    clf = train_language_classifier(corpus, "text", "lang_true")
    save_language_classifier(clf, str(tmp_path / "clf"))
    clf2 = load_language_classifier(str(tmp_path / "clf"))
    assert clf2["labels"] == clf["labels"] and clf2["n"] == clf["n"]
    a = sorted(
        map(tuple, detect_language_model(corpus, clf, "text")
            .select("doc_id", "lang_pred", "lang_prob").collect())
    )
    b = sorted(
        map(tuple, detect_language_model(corpus, clf2, "text")
            .select("doc_id", "lang_pred", "lang_prob").collect())
    )
    assert a == b


def test_partition_corpus_by_language_prunes_and_quarantines(spark, tmp_path):
    """CCNet layout: the corpus lands partitioned by the PREDICTED
    language; a one-language read physically prunes the other
    partitions (PartitionFilters), and low-confidence docs land in
    'und' instead of polluting a language."""
    from ariadne_dbt_spark.operators.langid import partition_corpus_by_language

    n_langs = len(LANG_LEXICONS)
    corpus = synth_lang_corpus(
        spark.range(n_langs * 10).withColumnRenamed("id", "doc_id"), "doc_id"
    ).localCheckpoint(eager=True)
    clf = train_language_classifier(corpus, "text", "lang_true")
    out = str(tmp_path / "by_lang")
    sizes = partition_corpus_by_language(
        corpus.select("doc_id", "text"), clf, "text", out
    )
    assert sizes == {lang: 10 for lang in LANG_LEXICONS}

    one = spark.read.parquet(out).where(F.col("lang_part") == "de")
    assert one.count() == 10
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "lang_part" in plan.split("PartitionFilters")[1][:200]

    # an impossible confidence floor quarantines everything to 'und'
    out2 = str(tmp_path / "by_lang_strict")
    sizes2 = partition_corpus_by_language(
        corpus.select("doc_id", "text"), clf, "text", out2, min_prob=1.1
    )
    assert sizes2 == {"und": n_langs * 10}
