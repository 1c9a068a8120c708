"""Statistical language-model scoring for training-data pipelines
(north-star scale extension; CCNet-style quality filtering).

A bigram LM with Laplace (add-one) smoothing is trained corpus-wide as
two aggregations, then each document is scored by its mean bigram
negative log-likelihood (cross-entropy, nats). Documents whose
cross-entropy is far above the corpus median are "surprising" under the
corpus' own statistics — the classic perplexity-based quality filter
(CCNet trains a KenLM on Wikipedia; here the LM is any pretrained
counts table, including the corpus itself).

Everything is JVM-side column expressions:

* bigram extraction is the proven shingle shape — posexplode + one
  window ``lead`` per doc (ONE hash exchange on doc id; higher-order
  ``transform``/``slice`` lambdas re-inline upstream expressions after
  projection collapse and were measured 20x slower at scale),
* training is two groupBy aggregations with map-side partial combine,
* scoring joins the doc bigrams to the LM — broadcast when the LM is
  pruned/pretrained (the production CCNet shape: scoring is then
  MAP-ONLY, no shuffle on the 100 TB side except the per-doc agg).

At 100 TB the LM table is bounded by observed-vocabulary², and
``prune_min_count`` keeps only heavy bigrams (context totals are
computed BEFORE pruning so probabilities stay consistent), which is
what makes the broadcast path viable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "doc_bigrams",
    "train_bigram_lm",
    "vocab_size",
    "lm_cross_entropy",
    "score_with_lm",
]


def _tokens(text_col: str) -> F.Column:
    """Whitespace tokens of the lowercased, trimmed text."""
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, w1, w2)`` — one row per in-document bigram.

    posexplode + window ``lead`` keeps bigram construction below a
    single doc-id exchange (the measured-fast shingle shape, see
    operators/dedup.py:shingle_sets).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_tokens(text_col)).alias("_pos", "w1"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    return (
        toks.select("_id", "w1", F.lead("w1").over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
        .withColumnRenamed("_id", id_col)
    )


def train_bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    prune_min_count: int = 1,
) -> DataFrame:
    """Train bigram counts: ``(w1, w2, c12, c1)`` where ``c12`` is the
    corpus-wide bigram count and ``c1 = SUM(c12) GROUP BY w1`` is the
    context total.

    ``prune_min_count > 1`` drops rare bigrams AFTER context totals are
    computed — the surviving rows still carry the full-corpus ``c1``,
    so smoothed probabilities are unchanged for kept bigrams and the
    pruned LM is small enough to broadcast (the scale path).
    """
    lm = doc_bigrams(df, id_col, text_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    ctx = lm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    out = lm.join(ctx, "w1")
    if prune_min_count > 1:
        out = out.where(F.col("c12") >= F.lit(int(prune_min_count)))
    return out


def vocab_size(df: DataFrame, text_col: str) -> DataFrame:
    """1-row frame ``(vocab_v)`` — COUNT(DISTINCT token) corpus-wide,
    the Laplace smoothing denominator."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_v"))
    )


def score_with_lm(
    df: DataFrame,
    lm: DataFrame,
    vocab_v: int,
    id_col: str,
    text_col: str,
    *,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-doc cross-entropy under a (possibly pretrained) bigram LM:
    ``(id, n_bigrams, xent)`` with
    ``xent = ROUND(AVG(-ln((c12+1)/(c1+V))), 6)`` (Laplace smoothing;
    unseen bigram → c12=0, unseen context → c1=0, so OOV text degrades
    to ``-ln(1/V)`` rather than -inf).

    With ``broadcast_lm=True`` (pretrained/pruned LM — the CCNet
    production shape) both probability joins are broadcast hash joins:
    the corpus side never shuffles except for its own per-doc
    aggregation. The rounding to 6 decimals absorbs cross-engine
    summation-order and ``ln`` last-ulp differences (repo float rule).
    """
    bg = doc_bigrams(df, id_col, text_col)
    ctx = lm.select("w1", "c1").distinct()
    pair = lm.select("w1", "w2", "c12")
    if broadcast_lm:
        ctx, pair = F.broadcast(ctx), F.broadcast(pair)
    scored = (
        bg.join(pair, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(vocab_v)))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("xent"),
    )


def lm_cross_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-shot: train on the corpus, score the corpus (self-scoring —
    every bigram is in-vocabulary). ``(id, n_bigrams, xent)``.

    The LM here is corpus-derived (not prunable without changing
    scores), so the probability joins shuffle on token keys; scale
    users pretrain + prune and call :func:`score_with_lm` broadcast.
    """
    lm = train_bigram_lm(df, id_col, text_col)
    vocab = vocab_size(df, text_col)
    bg = doc_bigrams(df, id_col, text_col)
    scored = (
        bg.join(lm, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                -F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vocab_v")))
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("xent"),
    )
