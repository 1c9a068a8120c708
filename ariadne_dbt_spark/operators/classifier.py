"""Model-based document quality classification (north-star scale
extension): after heuristic filters (Gopher rules, LM perplexity),
production pipelines train a lightweight text classifier on
weak/curated labels and keep documents scoring above a threshold
(fastText-style; e.g. the GPT-3/LLaMA "looks like reference corpus"
filters).

Spark-native shape via MLlib (public pyspark.ml API):

* features = hashed token counts (``HashingTF`` — stateless feature
  hashing: map-only, no vocabulary fit, no shuffle, any corpus size),
* model = ``LogisticRegression`` (distributed L-BFGS; the TRAINING set
  is the small curated side — millions of rows at most — while
  INFERENCE over the 100 TB corpus is a map-only transform of the
  broadcast coefficient vector),
* inference adds ``quality_prob`` / ``quality_pred`` columns; the
  filter is then one predicate.

Determinism: hashing is seedless-stable, L-BFGS on a fixed dataset with
fixed params converges deterministically on a fixed partitioning —
pinned by the separability pytest rather than a SQL oracle (iterative
optimization is the one stage a declarative mirror cannot express).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_classifier", "score_quality", "quality_filter"]

_N_FEATURES = 1 << 14


def _pipeline(label_col: str):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=_N_FEATURES
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=30,
        regParam=1e-3,
        standardization=False,
    )
    return Pipeline(stages=[tf, lr])


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_toks", F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )


def train_quality_classifier(
    labeled: DataFrame, text_col: str, label_col: str = "label"
):
    """Fit the hashing-TF + logistic-regression pipeline on a labeled
    frame (label 1.0 = keep). Returns the fitted PipelineModel."""
    return _pipeline(label_col).fit(_with_tokens(labeled, text_col))


def score_quality(df: DataFrame, model, text_col: str) -> DataFrame:
    """Map-only inference: adds ``quality_prob`` (P(keep)) and
    ``quality_pred``; drops the intermediate ML columns."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_with_tokens(df, text_col))
    return scored.withColumn(
        "quality_prob", vector_to_array(F.col("probability")).getItem(1)
    ).withColumn("quality_pred", F.col("prediction")).drop(
        "_toks", "_features", "rawPrediction", "probability", "prediction"
    )


def quality_filter(
    df: DataFrame, model, text_col: str, *, min_prob: float = 0.5
) -> DataFrame:
    """Keep documents with P(keep) >= ``min_prob`` — one predicate over
    the map-only scores."""
    return score_quality(df, model, text_col).where(
        F.col("quality_prob") >= F.lit(float(min_prob))
    )
