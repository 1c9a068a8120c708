"""Unit tests for the round-5 text-analytics additions: lexical
diversity, PMI collocations, per-source quality-percentile pruning,
and blocked Levenshtein fuzzy matching (the gate rows exercise the
sf corpora; these pin the semantics on hand-computable inputs)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id bigint, text string",
    )


class TestLexicalDiversity:
    def test_hand_computed(self, spark):
        from ariadne_dbt_spark.operators.text import lexical_diversity

        # doc 1: "a b a c" -> 4 tokens, 3 types, hapax {b, c} = 2
        # doc 2: "x x x"   -> 3 tokens, 1 type, 0 hapax
        df = _docs(spark, [(1, "a b a c"), (2, "x x x")])
        got = {
            r["doc_id"]: r.asDict()
            for r in lexical_diversity(df, "doc_id", "text").collect()
        }
        assert got[1]["n_words"] == 4 and got[1]["n_types"] == 3
        assert got[1]["ttr_millionths"] == 3 * 1000000 // 4
        assert got[1]["hapax_millionths"] == 2 * 1000000 // 4
        assert got[2]["n_words"] == 3 and got[2]["n_types"] == 1
        assert got[2]["ttr_millionths"] == 1000000 // 3
        assert got[2]["hapax_millionths"] == 0

    def test_case_fold_and_whitespace(self, spark):
        from ariadne_dbt_spark.operators.text import lexical_diversity

        df = _docs(spark, [(1, "  The THE the  ")])
        row = lexical_diversity(df, "doc_id", "text").collect()[0]
        assert row["n_words"] == 3 and row["n_types"] == 1


class TestPmiCollocations:
    def test_hand_computed_pmi(self, spark):
        from ariadne_dbt_spark.operators.lm import pmi_collocations

        # corpus: one doc "a b a b a b a b a b" -> tokens: 10 (5 a, 5 b)
        # bigrams: 9 total: (a,b) x5, (b,a) x4
        df = _docs(spark, [(1, "a b a b a b a b a b")])
        rows = pmi_collocations(df, "doc_id", "text", min_count=4, k=10).collect()
        got = {(r["w1"], r["w2"]): r for r in rows}
        n_tok, n_pairs = 10, 9
        exp_ab = round(math.log((5 * 1.0 * n_tok / n_pairs) * n_tok / (5 * 1.0 * 5)), 6)
        exp_ba = round(math.log((4 * 1.0 * n_tok / n_pairs) * n_tok / (5 * 1.0 * 5)), 6)
        assert got[("a", "b")]["pair_count"] == 5
        assert abs(got[("a", "b")]["pmi"] - exp_ab) < 1e-9
        assert abs(got[("b", "a")]["pmi"] - exp_ba) < 1e-9

    def test_min_count_prunes(self, spark):
        from ariadne_dbt_spark.operators.lm import pmi_collocations

        df = _docs(spark, [(1, "a b a b c d")])
        rows = pmi_collocations(df, "doc_id", "text", min_count=2, k=10).collect()
        assert {(r["w1"], r["w2"]) for r in rows} == {("a", "b")}


class TestQualityPercentilePrune:
    def test_keeps_top_pct_per_group(self, spark):
        from ariadne_dbt_spark.operators.sampling import quality_percentile_prune

        rows = [(i, "g1", 100 - i) for i in range(10)] + [(100, "g2", 5)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["id", "src", "score"]),
            "id bigint, src string, score bigint",
        )
        out = quality_percentile_prune(df, "id", "score", "src", keep_pct=30)
        kept = {r["id"] for r in out.collect() if r["keep"]}
        # g1: 10 rows, top-3 by score desc are ids 0,1,2; g2: 1 row,
        # rank 1*100 <= 1*30 is FALSE -> singleton groups drop at 30%
        assert kept == {0, 1, 2}

    def test_tie_break_deterministic(self, spark):
        from ariadne_dbt_spark.operators.sampling import quality_percentile_prune

        df = spark.createDataFrame(
            pd.DataFrame(
                [(i, "g", 7) for i in range(10)], columns=["id", "src", "score"]
            ),
            "id bigint, src string, score bigint",
        )
        out = quality_percentile_prune(df, "id", "score", "src", keep_pct=50)
        kept = {r["id"] for r in out.collect() if r["keep"]}
        assert kept == {0, 1, 2, 3, 4}  # equal scores -> id ascending


class TestEditDistanceNearDups:
    def test_blocked_pairs(self, spark):
        from ariadne_dbt_spark.operators.dedup import edit_distance_near_dups

        df = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, "small ring", "ring"),
                    (2, "smalll ring", "ring"),  # dist 1 to id 1
                    (3, "red widget", "widget"),  # other block
                    (4, "blue ring", "ring"),  # dist 4 to "small ring"
                ],
                columns=["id", "name", "blk"],
            ),
            "id bigint, name string, blk string",
        )
        out = edit_distance_near_dups(df, "id", "name", "blk", max_dist=2).collect()
        assert {(r["id_a"], r["id_b"], r["dist"]) for r in out} == {(1, 2, 1)}

    def test_keep_candidates_keeps_length_survivors(self, spark):
        from ariadne_dbt_spark.operators.dedup import edit_distance_near_dups

        df = spark.createDataFrame(
            pd.DataFrame(
                [(1, "abcd", "b"), (2, "abce", "b"), (3, "abcdefgh", "b")],
                columns=["id", "name", "blk"],
            ),
            "id bigint, name string, blk string",
        )
        out = edit_distance_near_dups(
            df, "id", "name", "blk", max_dist=2, keep_candidates=True
        ).collect()
        # (1,3)/(2,3) fail the |len diff| <= 2 prefilter; (1,2) survives
        # with dist 1 and would also survive without keep_candidates
        assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}

    def test_levenshtein_matches_reference_impl(self, spark):
        from ariadne_dbt_spark.operators.dedup import edit_distance_near_dups

        def lev(a, b):
            m = [[i + j if 0 in (i, j) else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    m[i][j] = min(
                        m[i - 1][j] + 1,
                        m[i][j - 1] + 1,
                        m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return m[-1][-1]

        names = ["kitten", "sitting", "kitchen", "mitten", "witty"]
        df = spark.createDataFrame(
            pd.DataFrame(
                [(i, n, "x") for i, n in enumerate(names)],
                columns=["id", "name", "blk"],
            ),
            "id bigint, name string, blk string",
        )
        out = edit_distance_near_dups(
            df, "id", "name", "blk", max_dist=100, keep_candidates=True
        ).collect()
        for r in out:
            assert r["dist"] == lev(names[r["id_a"]], names[r["id_b"]])


class TestContainmentPairs:
    def test_snippet_in_document(self, spark):
        from ariadne_dbt_spark.operators.dedup import containment_pairs

        df = spark.createDataFrame(
            pd.DataFrame(
                [
                    (1, "a b c d e f g h"),
                    (2, "c d e f"),  # snippet of 1
                    (3, "x y z w v u"),  # unrelated
                ],
                columns=["doc_id", "text"],
            ),
            "doc_id bigint, text string",
        )
        out = containment_pairs(df, "doc_id", "text", n=2, threshold=0.9).collect()
        got = {(r["id_a"], r["id_b"]): r["containment"] for r in out}
        # snippet bigrams {c d, d e, e f} all inside doc 1 -> 1.0;
        # reverse direction is 3/7 and must NOT appear at 0.9
        assert got == {(2, 1): 1.0}

    def test_asymmetry_vs_jaccard(self, spark):
        from ariadne_dbt_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        long = " ".join(f"w{i}" for i in range(60))
        snip = " ".join(f"w{i}" for i in range(20, 30))
        df = spark.createDataFrame(
            pd.DataFrame([(1, long), (2, snip)], columns=["doc_id", "text"]),
            "doc_id bigint, text string",
        )
        cont = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
        assert {(r["id_a"], r["id_b"]) for r in cont} == {(2, 1)}
        jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
        assert jac == []  # symmetric Jaccard is blind to the same pair

    def test_max_df_cap_drops_ubiquitous_shingles(self, spark):
        from ariadne_dbt_spark.operators.dedup import containment_pairs

        # "x y z" trigram appears in EVERY doc; with max_df=2 it leaves
        # the postings join, so docs related only through it don't pair
        rows = [(i, f"x y z a{i} b{i} c{i} d{i}") for i in range(5)]
        rows.append((99, "x y z"))  # snippet made ONLY of the hot shingle
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id bigint, text string",
        )
        capped = containment_pairs(df, "doc_id", "text", n=3, threshold=0.5, max_df=2)
        assert capped.count() == 0
        # uncapped, the boilerplate snippet pairs with every doc
        uncapped = containment_pairs(df, "doc_id", "text", n=3, threshold=0.5)
        assert uncapped.where("id_a = 99").count() == 5
