"""Quality classifier: separability on planted good/bad corpora,
held-out generalization, threshold filter, and map-only inference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.classifier import (
    quality_filter,
    score_quality,
    train_quality_classifier,
)

_GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "spark executes the query plan with whole stage code generation enabled",
    "a clear and well formed paragraph that has normal english words in it",
    "the training corpus should contain clean natural language like this",
    "documentation explains how the adaptive query engine splits skewed joins",
]
_BAD = [
    "$$$ ### @@@ %%% ^^^ &&& *** ((( ))) !!! ??? ~~~ ``` |||",
    "buy buy buy buy buy buy buy buy buy buy buy buy buy buy",
    "zzz qqq kkk vvv xxx jjj www yyy fff ggg hhh lll mmm nnn",
    "click here click here click here click here click here now",
    "111 222 333 444 555 666 777 888 999 000 111 222 333 444",
]


def _labeled(spark, reps=6):
    rows = []
    i = 0
    for r in range(reps):
        for g in _GOOD:
            rows.append((i, f"{g} variant {r}", 1.0))
            i += 1
        for b in _BAD:
            rows.append((i, f"{b} variant {r}", 0.0))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_and_generalizes(spark):
    df = _labeled(spark)
    # hold out the LAST variant of every sentence (ids 50-59): unseen
    # rows, seen vocabulary — the regime a hashing classifier supports
    # (a fully-unseen sentence has zero-weight features by construction)
    train = df.where(F.col("doc_id") < 50)
    test = df.where(F.col("doc_id") >= 50)
    model = train_quality_classifier(train, "text")
    scored = score_quality(test, model, "text")
    agree = scored.where(F.col("quality_pred") == F.col("label")).count()
    total = test.count()
    assert agree / total >= 0.9, f"held-out accuracy {agree}/{total}"
    # probabilities ordered: every good doc above every bad doc on average
    means = {
        r.label: r.m
        for r in scored.groupBy("label").agg(F.avg("quality_prob").alias("m")).collect()
    }
    assert means[1.0] > 0.8 > 0.2 > means[0.0]


def test_quality_filter_threshold(spark):
    df = _labeled(spark)
    model = train_quality_classifier(df, "text")
    kept = quality_filter(df, model, "text", min_prob=0.5)
    assert kept.count() == df.where(F.col("label") == 1.0).count()
    assert kept.where(F.col("label") == 0.0).count() == 0
    # ML intermediates are dropped; original columns survive
    assert set(kept.columns) == {"doc_id", "text", "label", "quality_prob", "quality_pred"}


def test_inference_is_map_only(spark):
    df = _labeled(spark)
    model = train_quality_classifier(df, "text")
    plan = (
        score_quality(df.select("doc_id", "text"), model, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
