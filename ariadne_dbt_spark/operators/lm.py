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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "doc_bigrams",
    "doc_trigrams",
    "train_bigram_lm",
    "train_backoff_lm",
    "vocab_size",
    "lm_cross_entropy",
    "perplexity_buckets",
    "score_with_lm",
    "stupid_backoff_scores",
    "dsir_log_ratios",
    "dsir_select",
]


def _tokens(text_col: str) -> F.Column:
    """Whitespace tokens of the lowercased, trimmed text."""
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, w1, w2)`` — one row per in-document bigram.

    MAP-ONLY (round 10): ``explode(arrays_zip(slice(t, 1, n-1),
    slice(t, 2, n-1)))`` pairs each token with its successor with zero
    exchanges — the old posexplode + window ``lead`` shape paid a
    corpus-sized hash exchange on doc id plus a per-doc sort just to
    look one row ahead. The token array appears only as a direct
    argument (never captured inside a lambda), so projection collapse
    cannot re-evaluate the regex split per element (the measured HOF
    pathology that originally motivated the window shape); codegen
    subexpression elimination evaluates the split once per row.
    """
    t = _tokens(text_col)
    n = F.greatest(F.size(t) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(t, 1, n).alias("w1"),
        F.slice(t, 2, n).alias("w2"),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
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

    Both the training counts and the scoring join hang off ONE
    ``repartition(w1, w2)`` boundary over the bigram build: without it
    each branch re-ran the posexplode+window tokenizer subtree, and
    under projection collapse the inlined tokenizer HOFs can
    re-evaluate per element — the measured intermittent 10x on
    `corpus_build_pipeline` (3-45 s warm at sf0.1 across
    otherwise-identical sessions, 12 document scans in the plan). The
    explicit exchange pins a collapse-proof boundary the optimizer
    cannot inline through (and gives identical branches for exchange
    reuse) with ZERO persisted storage — an eager checkpoint here
    would park corpus-sized bigram blocks in the block manager for the
    plan's lifetime. The TRUE 100 TB path remains
    pretrain+prune+broadcast via :func:`score_with_lm`.
    """
    bg = doc_bigrams(df, id_col, text_col).repartition("w1", "w2")
    lm = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    lm = lm.join(lm.groupBy("w1").agg(F.sum("c12").alias("c1")), "w1")
    vocab = vocab_size(df, text_col)
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


def doc_trigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, w1, w2, w3)`` — one row per in-document trigram (same
    map-only zip-of-slices shape as :func:`doc_bigrams`)."""
    t = _tokens(text_col)
    n = F.greatest(F.size(t) - 2, F.lit(0))
    triples = F.arrays_zip(
        F.slice(t, 1, n).alias("w1"),
        F.slice(t, 2, n).alias("w2"),
        F.slice(t, 3, n).alias("w3"),
    )
    return df.select(F.col(id_col), F.explode(triples).alias("_tg")).select(
        id_col,
        F.col("_tg.w1").alias("w1"),
        F.col("_tg.w2").alias("w2"),
        F.col("_tg.w3").alias("w3"),
    )


def train_backoff_lm(df: DataFrame, id_col: str, text_col: str) -> dict:
    """Count tables for a trigram stupid-backoff LM (Brants et al.
    2007, "Large Language Models in Machine Translation" — the backoff
    scheme designed for MapReduce-scale training: no discounting
    renormalization, just raw counts, so training is three independent
    aggregations with map-side combine).

    Returns ``{"tri": (w1,w2,w3,c123), "bi": (w1,w2,c12),
    "uni": (w,c1), "n_tokens": int, "vocab_v": int}`` — the count
    frames are unmaterialized plans; persist or write them for reuse.
    """
    toks = df.select(F.explode(_tokens(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    bi = (
        doc_bigrams(df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    tri = (
        doc_trigrams(df, id_col, text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c123"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("w").alias("v")
    ).first()
    return {
        "tri": tri,
        "bi": bi,
        "uni": uni,
        "n_tokens": int(totals["n"]),
        "vocab_v": int(totals["v"]),
    }


def stupid_backoff_scores(
    df: DataFrame,
    lm: dict,
    id_col: str,
    text_col: str,
    *,
    alpha: float = 0.4,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-doc trigram cross-entropy under stupid backoff:
    ``(id, n_trigrams, n_tri_hits, n_bi_backoffs, n_uni_backoffs,
    xent_sb)`` with

    * seen trigram:            S = c123 / c12(w1,w2)
    * else seen bigram (w2,w3): S = alpha · c23 / c1(w2)
    * else (unigram floor):    S = alpha² · (c3 + 1) / (N + V)
      (Laplace floor so fully-OOV words stay finite)

    and ``xent_sb = ROUND(AVG(-ln S), 6)``. The branch counters make
    the oracle check every backoff path, not just the blended score.
    All five probability joins broadcast when the LM fits (pruned /
    pretrained — the production shape); the corpus side's only
    exchanges are its own trigram window and the final per-doc agg.
    """
    tri, bi, uni = lm["tri"], lm["bi"], lm["uni"]
    if broadcast_lm:
        tri, bi, uni = F.broadcast(tri), F.broadcast(bi), F.broadcast(uni)
    n_tok, v = float(lm["n_tokens"]), float(lm["vocab_v"])
    tg = doc_trigrams(df, id_col, text_col)
    j = (
        tg.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi.select("w1", "w2", F.col("c12").alias("_c12_ctx")), ["w1", "w2"], "left")
        .join(
            bi.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c12").alias("_c23")
            ),
            ["w2", "w3"],
            "left",
        )
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("_c2")), ["w2"], "left")
        .join(uni.select(F.col("w").alias("w3"), F.col("c1").alias("_c3")), ["w3"], "left")
    )
    a = F.lit(float(alpha))
    s = (
        F.when(F.col("c123").isNotNull(), F.col("c123") / F.col("_c12_ctx"))
        .when(F.col("_c23").isNotNull(), a * F.col("_c23") / F.col("_c2"))
        .otherwise(
            a * a * (F.coalesce(F.col("_c3"), F.lit(0)) + F.lit(1.0)) / F.lit(n_tok + v)
        )
    )
    branch = (
        F.when(F.col("c123").isNotNull(), F.lit("tri"))
        .when(F.col("_c23").isNotNull(), F.lit("bi"))
        .otherwise(F.lit("uni"))
    )
    scored = j.select(id_col, (-F.log(s)).alias("nll"), branch.alias("_branch"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.count(F.when(F.col("_branch") == "tri", 1)).alias("n_tri_hits"),
        F.count(F.when(F.col("_branch") == "bi", 1)).alias("n_bi_backoffs"),
        F.count(F.when(F.col("_branch") == "uni", 1)).alias("n_uni_backoffs"),
        F.round(F.avg("nll"), 6).alias("xent_sb"),
    )


def dsir_log_ratios(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"),
    re-expressed on the bigram LM: score every corpus document under a
    TARGET-domain LM and under the RAW-corpus LM, and return
    ``(id, n_bigrams, xent_target, xent_raw, log_ratio)`` where
    ``log_ratio = xent_raw − xent_target`` (mean per-bigram
    log p_target/p_raw — positive = more target-like than the corpus
    average; DSIR resamples ∝ exp of this).

    Both LMs are corpus-level count tables; with ``broadcast_lm`` the
    four probability joins broadcast and the 100 TB side only shuffles
    for its own per-doc aggregations. The two scoring passes share the
    same bigram derivation shape (and can share a persisted bigram
    table at scale).
    """
    lm_t = train_bigram_lm(target, id_col, text_col)
    v_t = int(vocab_size(target, text_col).first()["vocab_v"])
    lm_r = train_bigram_lm(corpus, id_col, text_col)
    v_r = int(vocab_size(corpus, text_col).first()["vocab_v"])
    st = score_with_lm(
        corpus, lm_t, v_t, id_col, text_col, broadcast_lm=broadcast_lm
    ).select(id_col, "n_bigrams", F.col("xent").alias("xent_target"))
    sr = score_with_lm(
        corpus, lm_r, v_r, id_col, text_col, broadcast_lm=broadcast_lm
    ).select(id_col, F.col("xent").alias("xent_raw"))
    return st.join(sr, id_col).select(
        id_col,
        "n_bigrams",
        "xent_target",
        "xent_raw",
        F.round(F.col("xent_raw") - F.col("xent_target"), 6).alias("log_ratio"),
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int,
) -> DataFrame:
    """Top-k most target-like documents by DSIR log-ratio
    (deterministic: ties break on id; the paper resamples ∝ weight —
    top-k is the greedy deterministic variant)."""
    r = dsir_log_ratios(corpus, target, id_col, text_col)
    return r.orderBy(F.desc("log_ratio"), id_col).limit(int(k))


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information:
    ``pmi(w1,w2) = ln( P(w1,w2) / (P(w1) P(w2)) )`` with bigram/unigram
    MLE probabilities over the corpus — the classic collocation-mining
    statistic (Church & Hanks 1990), used in data pipelines to surface
    boilerplate phrases and build phrase vocabularies.

    Determinism contract (oracle-exact): the PMI argument is computed as
    ONE double expression with a fixed association order —
    ``(c12 * 1.0 * n_tok / n_pairs) * n_tok / (c1 * 1.0 * c2)`` — IEEE
    double ops are exactly rounded so both engines agree bitwise; the
    single ``ln`` may drift a last ulp and is rounded to 6 decimals.
    Ordering/top-k cutoff uses the ROUNDED value (+ (w1, w2) tie-break)
    so rank boundaries can't flip across engines.

    Scale shape: bigram counting is two shuffles with map-side combine
    (the ``train_bigram_lm`` path); unigram totals join back on w1/w2
    (fine to broadcast once pruned by ``min_count``); global totals are
    computed as 1-row aggregates and cross-joined (broadcast literal).
    """
    bg = doc_bigrams(df, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    toks = df.select(F.explode(_tokens(text_col)).alias("tok")).where(F.col("tok") != "")
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = c12.agg(F.sum("c12").cast("bigint").alias("n_pairs")).crossJoin(
        uni.agg(F.sum("c").cast("bigint").alias("n_tok"))
    )
    scored = (
        c12.where(F.col("c12") >= F.lit(int(min_count)))
        .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("pair_count"),
            F.round(
                F.log(
                    F.col("c12") * F.lit(1.0) * F.col("n_tok") / F.col("n_pairs")
                    * F.col("n_tok") / (F.col("c1") * F.lit(1.0) * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(int(k))


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lang_col: str | None = None,
    lang_clf: dict | None = None,
) -> DataFrame:
    """CCNet head/middle/tail buckets PER LANGUAGE (Wenzek et al. 2020):
    bigram-LM cross-entropy terciles within each language —
    ``(id, lang, xent, ppl_bucket)``.

    The language key is the curated ``lang_col`` when the corpus has
    one; otherwise it is DERIVED by the trained language-ID model
    (``lang_clf`` from ``operators.langid.train_language_classifier``,
    applied map-only via ``detect_language_model``) — reference-grade
    CCNet keys everything off the classifier, not off curated metadata
    that 100 TB of web text doesn't have. Exactly one of
    ``lang_col``/``lang_clf`` must be given.

    Scale shape: xent is one LM pass; the tercile boundaries come from a
    VALUE-histogram rank selection — group by ``(lang, xent)`` counts,
    cumulative sums over DISTINCT rounded xent values per language, then
    the boundary is the smallest value whose cumulative count reaches the
    tercile rank. No executor ever buffers a language's full score list
    (exact ``percentile`` would — on CCNet's real workload a single
    language holds billions of docs), and the per-language window runs
    over distinct 6-decimal-rounded xents, never corpus rows.

    Membership equivalence with interpolated terciles (what DuckDB's
    ``quantile_cont`` computes): the interpolated boundary q(p) lies in
    ``[v_k, v_{k+1}]`` for ``k = floor(1 + (n-1)p)``, and no DATA value
    falls strictly between adjacent sorted values, so for every doc
    ``xent <= q(p)`` iff ``xent <= v_k`` — the boundary value at rank k.
    The bucket labels are therefore bit-identical to the exact-percentile
    formulation; only the aggregation shape changed.
    """
    from pyspark.sql.window import Window

    if (lang_col is None) == (lang_clf is None):
        raise ValueError("pass exactly one of lang_col= or lang_clf=")
    if lang_col is not None:
        langed = df.select(
            F.col(id_col), F.col(lang_col).alias("lang"), F.col(text_col)
        )
    else:
        from ariadne_dbt_spark.operators.langid import detect_language_model

        langed = detect_language_model(
            df.select(id_col, text_col), lang_clf, text_col
        ).select(F.col(id_col), F.col("lang_pred").alias("lang"), F.col(text_col))
    x = lm_cross_entropy(langed, id_col, text_col).select(id_col, "xent")
    xl = x.join(langed.select(id_col, "lang"), id_col)
    hist = xl.groupBy("lang", "xent").agg(F.count(F.lit(1)).alias("c"))
    wv = (
        Window.partitionBy("lang")
        .orderBy("xent")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "lang",
        "xent",
        F.sum("c").over(wv).alias("cum"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n"),
    )
    # rank of the interpolated boundary's floor value: k = 1 + (n-1)p DIV 1
    b1 = (
        cum.where(F.col("cum") >= F.expr("1 + (n - 1) DIV 3"))
        .groupBy("lang")
        .agg(F.min("xent").alias("b1"))
    )
    b2 = (
        cum.where(F.col("cum") >= F.expr("1 + (2 * (n - 1)) DIV 3"))
        .groupBy("lang")
        .agg(F.min("xent").alias("b2"))
    )
    qs = b1.join(b2, "lang")
    bucket = (
        F.when(F.col("xent") <= F.col("b1"), F.lit("head"))
        .when(F.col("xent") <= F.col("b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        xl.join(F.broadcast(qs), "lang")
        .select(id_col, "lang", "xent", bucket.alias("ppl_bucket"))
        .orderBy(id_col)
    )
