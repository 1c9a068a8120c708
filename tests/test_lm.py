"""Bigram-LM cross-entropy scoring: self-scoring vs pretrained-broadcast
equivalence, pruning consistency, OOV degradation, and plan shape
(broadcast joins on the pretrained path)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.lm import (
    doc_bigrams,
    lm_cross_entropy,
    score_with_lm,
    train_bigram_lm,
    vocab_size,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran on the mat"),
        (3, "a dog sat on a log near the mat"),
        (4, "spark shuffles join keys across executors"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_extraction(corpus):
    bg = doc_bigrams(corpus, "doc_id", "text")
    per_doc = {r["doc_id"]: r["n"] for r in bg.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # n_tokens - 1 bigrams per doc
    assert per_doc == {1: 5, 2: 5, 3: 8, 4: 5}
    first = bg.where((F.col("doc_id") == 1)).orderBy("w1", "w2").collect()
    assert ("the", "cat") in {(r.w1, r.w2) for r in first}


def test_self_scoring_matches_pretrained_path(corpus):
    """score_with_lm(corpus-trained LM, broadcast) must equal the
    one-shot lm_cross_entropy exactly (after the shared round-6)."""
    one_shot = {r.doc_id: (r.n_bigrams, r.xent) for r in lm_cross_entropy(corpus, "doc_id", "text").collect()}
    lm = train_bigram_lm(corpus, "doc_id", "text")
    v = vocab_size(corpus, "text").first()["vocab_v"]
    pre = {
        r.doc_id: (r.n_bigrams, r.xent)
        for r in score_with_lm(corpus, lm, v, "doc_id", "text", broadcast_lm=True).collect()
    }
    assert one_shot == pre


def test_hand_computed_probability(spark):
    """Single doc 'a b a b' — hand-check Laplace bigram probabilities."""
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    # bigrams: (a,b) x2, (b,a) x1; contexts: a->2, b->1; V=2
    # p(a,b) = (2+1)/(2+2) = 0.75 ; p(b,a) = (1+1)/(1+2) = 2/3
    expected = -(2 * math.log(0.75) + math.log(2 / 3)) / 3
    row = lm_cross_entropy(df, "doc_id", "text").first()
    assert row["n_bigrams"] == 3
    assert abs(row["xent"] - round(expected, 6)) < 1e-9


def test_oov_scores_finite_and_higher(corpus, spark):
    """Scoring unseen text against a pretrained LM: no NaN/inf, and
    fully-OOV text is more surprising than in-domain text."""
    lm = train_bigram_lm(corpus, "doc_id", "text")
    v = vocab_size(corpus, "text").first()["vocab_v"]
    new = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "zzz qqq www yyy xxx vvv")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.xent for r in score_with_lm(new, lm, v, "doc_id", "text").collect()}
    assert all(math.isfinite(x) for x in got.values())
    # fully-OOV bigrams degrade to -ln(1/V) = ln(V), the max smoothed score
    assert got[11] == round(math.log(v), 6)
    assert got[10] < got[11]


def test_prune_keeps_probabilities_consistent(corpus, spark):
    """Pruned LM keeps full-corpus context totals: surviving bigrams
    score identically to the unpruned LM."""
    full = train_bigram_lm(corpus, "doc_id", "text")
    pruned = train_bigram_lm(corpus, "doc_id", "text", prune_min_count=2)
    kept = {(r.w1, r.w2): (r.c12, r.c1) for r in pruned.collect()}
    assert kept, "expected at least one repeated bigram in the fixture"
    full_map = {(r.w1, r.w2): (r.c12, r.c1) for r in full.collect()}
    for k, v_ in kept.items():
        assert full_map[k] == v_


def test_pretrained_path_is_broadcast(corpus, spark):
    """The production scoring shape — a MATERIALIZED (pretrained) LM,
    as it would be read from parquet: both probability joins broadcast,
    no sort-merge join anywhere; the corpus side's only exchanges are
    its own bigram window and the per-doc aggregation."""
    lm_local = spark.createDataFrame(
        train_bigram_lm(corpus, "doc_id", "text").toPandas()
    )
    v = vocab_size(corpus, "text").first()["vocab_v"]
    df = score_with_lm(corpus, lm_local, v, "doc_id", "text", broadcast_lm=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


class TestStupidBackoff:
    def test_hand_computed_branches(self, spark):
        """Train on one doc, score text hitting all three branches."""
        import math

        from ariadne_dbt_spark.operators.lm import (
            stupid_backoff_scores,
            train_backoff_lm,
        )

        train = spark.createDataFrame(
            [(1, "a b c a b d")], "doc_id long, text string"
        )
        # counts: tri {abc:1, bca:1, cab:1, abd:1}; bi {ab:2, bc:1, ca:1, bd:1}
        # uni {a:2, b:2, c:1, d:1}; N=6, V=4
        lm = train_backoff_lm(train, "doc_id", "text")
        assert lm["n_tokens"] == 6 and lm["vocab_v"] == 4
        ev = spark.createDataFrame(
            [(10, "a b c"), (11, "c a x"), (12, "x y z")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in stupid_backoff_scores(ev, lm, "doc_id", "text").collect()}
        # doc 10: trigram 'a b c' seen -> tri branch, S = 1/2
        assert (rows[10].n_tri_hits, rows[10].n_bi_backoffs, rows[10].n_uni_backoffs) == (1, 0, 0)
        assert abs(rows[10].xent_sb - round(-math.log(0.5), 6)) < 1e-9
        # doc 11: 'c a x' unseen tri; (a,x) unseen bi; x unseen -> uni floor
        assert (rows[11].n_tri_hits, rows[11].n_bi_backoffs, rows[11].n_uni_backoffs) == (0, 0, 1)
        assert abs(rows[11].xent_sb - round(-math.log(0.16 * 1.0 / 10), 6)) < 1e-9
        # doc 12: everything OOV -> uni floor with c3(z)=0
        assert (rows[12].n_tri_hits, rows[12].n_bi_backoffs, rows[12].n_uni_backoffs) == (0, 0, 1)

    def test_bi_branch(self, spark):
        from ariadne_dbt_spark.operators.lm import (
            stupid_backoff_scores,
            train_backoff_lm,
        )
        import math

        train = spark.createDataFrame(
            [(1, "a b c a b d")], "doc_id long, text string"
        )
        lm = train_backoff_lm(train, "doc_id", "text")
        # 'd a b': tri unseen, bigram (a,b) seen c23=2, c2(a)=2 -> 0.4*2/2
        r = stupid_backoff_scores(
            spark.createDataFrame([(20, "d a b")], "doc_id long, text string"),
            lm, "doc_id", "text",
        ).first()
        assert (r.n_tri_hits, r.n_bi_backoffs, r.n_uni_backoffs) == (0, 1, 0)
        assert abs(r.xent_sb - round(-math.log(0.4), 6)) < 1e-9

    def test_backoff_plan_broadcasts(self, spark):
        from ariadne_dbt_spark.operators.lm import (
            stupid_backoff_scores,
            train_backoff_lm,
        )

        train = spark.createDataFrame(
            [(1, "a b c a b d e f g h")], "doc_id long, text string"
        )
        lm = train_backoff_lm(train, "doc_id", "text")
        # materialize counts as a pretrained LM would be
        lm = {
            **lm,
            "tri": spark.createDataFrame(lm["tri"].toPandas()),
            "bi": spark.createDataFrame(lm["bi"].toPandas()),
            "uni": spark.createDataFrame(lm["uni"].toPandas()),
        }
        df = stupid_backoff_scores(train, lm, "doc_id", "text")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert plan.count("BroadcastHashJoin") >= 5
        assert "SortMergeJoin" not in plan


class TestDSIR:
    def test_target_docs_rank_first(self, spark):
        """Docs drawn from the target distribution must outrank
        off-domain docs by log-ratio."""
        from ariadne_dbt_spark.operators.lm import dsir_log_ratios, dsir_select

        target_rows = [(i, "spark plans shuffle joins across executors efficiently") for i in range(5)]
        noise_rows = [(100 + i, "ducks geese herons swans waders paddle around ponds") for i in range(5)]
        corpus = spark.createDataFrame(target_rows + noise_rows, "doc_id long, text string")
        target = spark.createDataFrame(target_rows, "doc_id long, text string")
        r = {x.doc_id: x.log_ratio for x in dsir_log_ratios(corpus, target, "doc_id", "text").collect()}
        assert min(r[i] for i in range(5)) > max(r[100 + i] for i in range(5))
        top = {x.doc_id for x in dsir_select(corpus, target, "doc_id", "text", k=5).collect()}
        assert top == set(range(5))

    def test_ratio_decomposition(self, spark):
        """log_ratio must equal the rounded difference of the two xents
        returned alongside it."""
        from ariadne_dbt_spark.operators.lm import dsir_log_ratios

        corpus = spark.createDataFrame(
            [(i, f"w{i % 3} common tokens shared here") for i in range(9)],
            "doc_id long, text string",
        )
        target = corpus.where(F.col("doc_id") % 3 == 0)
        for x in dsir_log_ratios(corpus, target, "doc_id", "text").collect():
            assert abs(x.log_ratio - round(x.xent_raw - x.xent_target, 6)) < 1e-9


class TestPerplexityBucketsScale:
    """Round 8: perplexity_buckets' terciles come from value-histogram
    rank selection (group by (lang, xent) + cumulative counts over
    DISTINCT rounded xents), never an exact percentile that buffers a
    language's full score list in one aggregation buffer — on CCNet's
    real workload a single language ('en') holds billions of docs."""

    def test_no_exact_percentile_in_plan(self, spark):
        from ariadne_dbt_spark.operators.lm import perplexity_buckets

        df = spark.createDataFrame(
            [(i, "en", "the cat sat on the mat again " + str(i % 7)) for i in range(30)],
            "doc_id long, lang string, text string",
        )
        out = perplexity_buckets(df, "doc_id", "text", lang_col="lang")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "percentile" not in plan.lower()

    def test_giant_language_skew_buckets_match_interpolated(self, spark):
        """Planted skew: one language holds 94% of docs. Bucket labels
        must equal the interpolated-tercile formulation (quantile_cont
        membership), doc by doc — the histogram recipe is an exact
        re-aggregation, not an approximation."""
        import numpy as np

        from ariadne_dbt_spark.operators.lm import (
            lm_cross_entropy,
            perplexity_buckets,
        )

        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        rows = []
        for i in range(470):  # giant language
            t = " ".join(words[(i + j) % len(words)] for j in range(5 + i % 9))
            rows.append((i, "en", t))
        for i in range(470, 500):  # tiny language
            t = " ".join(words[(i * 3 + j) % len(words)] for j in range(4 + i % 5))
            rows.append((i, "fr", t))
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

        got = {
            r.doc_id: r.ppl_bucket
            for r in perplexity_buckets(df, "doc_id", "text", lang_col="lang").collect()
        }

        # independent expectation: numpy interpolated terciles per lang
        x = {
            r.doc_id: r.xent
            for r in lm_cross_entropy(df, "doc_id", "text").collect()
        }
        langs = {r.doc_id: r.lang for r in df.select("doc_id", "lang").collect()}
        for lang in ("en", "fr"):
            vals = sorted(v for d, v in x.items() if langs[d] == lang)
            b1 = float(np.quantile(vals, 1 / 3, method="linear"))
            b2 = float(np.quantile(vals, 2 / 3, method="linear"))
            for d, v in x.items():
                if langs[d] != lang:
                    continue
                want = "head" if v <= b1 else ("middle" if v <= b2 else "tail")
                assert got[d] == want, (d, v, b1, b2, got[d], want)

    def test_tiny_language_edges(self, spark):
        """n=1 and n=2 languages: rank-selection boundaries must match
        numpy's interpolated terciles at the degenerate sizes too."""
        import numpy as np

        from ariadne_dbt_spark.operators.lm import (
            lm_cross_entropy,
            perplexity_buckets,
        )

        rows = [
            (1, "solo", "alpha beta alpha beta gamma"),
            (2, "duo", "one two three four five"),
            (3, "duo", "one two one two one two seven"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {
            r.doc_id: r.ppl_bucket
            for r in perplexity_buckets(df, "doc_id", "text", lang_col="lang").collect()
        }
        x = {r.doc_id: r.xent for r in lm_cross_entropy(df, "doc_id", "text").collect()}
        assert got[1] == "head"  # single doc: b1=b2=its own xent
        duo = sorted([x[2], x[3]])
        b1 = float(np.quantile(duo, 1 / 3))
        b2 = float(np.quantile(duo, 2 / 3))
        for d in (2, 3):
            want = "head" if x[d] <= b1 else ("middle" if x[d] <= b2 else "tail")
            assert got[d] == want
