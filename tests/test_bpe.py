"""BPE induction: the merge loop against the classic Sennrich worked
example, encoder/trainer consistency, OOV behavior, and the map-only
encode plan."""

from __future__ import annotations

import pytest

from ariadne_dbt_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    symbol_pair_counts,
    word_counts,
)


#: Sennrich et al. 2016 example vocabulary (word -> frequency)
_SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_worked_example():
    """First merges of the canonical example: ('e','s') count 9,
    ('es','t') 9, ('est','</w>') 9, then ('l','o') 7, ('lo','w') 7."""
    merges = bpe_train(_SENNRICH, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_encode_consistent_with_training(spark):
    """Encoding the training words with enough merges reproduces whole
    words (+terminal); unseen words degrade to subwords, never error."""
    merges = bpe_train(_SENNRICH, 30)
    df = spark.createDataFrame(
        [(1, "low lower newest widest"), (2, "lowest")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, "text", merges).collect()}
    assert out[1] == ["low" + EOW, "lower" + EOW, "newest" + EOW, "widest" + EOW]
    # 'lowest' is OOV but decomposes into learned subwords ('low'+'est</w>')
    assert "".join(out[2]) == "lowest" + EOW
    assert len(out[2]) >= 2


def test_distributed_word_counts_feed_trainer(spark):
    rows = [(i, " ".join(w for w, n in _SENNRICH for _ in range(n))) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = word_counts(df, "text")
    got = {r.word: r.n for r in wc.collect()}
    assert got == {w: n * 3 for w, n in _SENNRICH}
    # training from the DataFrame equals training from the list (x3 counts)
    assert bpe_train(wc, 5) == bpe_train(_SENNRICH, 5)


def test_pair_counts_match_first_merge(spark):
    df = spark.createDataFrame(
        [(1, " ".join(w for w, n in _SENNRICH for _ in range(n)))],
        "doc_id long, text string",
    )
    pc = symbol_pair_counts(word_counts(df, "text"))
    top = pc.orderBy(pc.pair_count.desc(), "s1", "s2").first()
    assert (top.s1, top.s2) == bpe_train(_SENNRICH, 1)[0]


def test_driver_guard(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_driver_words"):
        bpe_train(word_counts(df, "text"), 5, max_driver_words=2)


def test_encode_is_map_only(spark):
    merges = bpe_train(_SENNRICH, 10)
    df = spark.createDataFrame([(1, "low newest")], "doc_id long, text string")
    plan = bpe_encode(df, "text", merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


class TestGopherRules:
    """Boundary behavior of the Gopher rule bundle (integer-exact)."""

    def _flags(self, spark, text):
        from ariadne_dbt_spark.operators.text import gopher_quality_flags

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return gopher_quality_flags(df, "doc_id", "text").first()

    def test_clean_doc_passes_all(self, spark):
        words = "the quick brown fox jumps over and over with great energy to be sure of that story have fun "
        r = self._flags(spark, (words * 4).strip())
        assert r.pass_all, r.asDict()

    def test_word_count_boundaries(self, spark):
        body = "the of and that have with be to " * 6  # 48 words
        assert not self._flags(spark, body.strip()).r_word_count  # 48 < 50
        assert self._flags(spark, (body + "x y").strip()).r_word_count  # 50

    def test_symbol_ratio_counts_hashes_and_ellipses(self, spark):
        fifty = "the of and that have with be to aa bb " * 5
        ok = self._flags(spark, (fifty + "# two... symbols ok ").strip())
        assert ok.r_symbol_ratio  # 2 symbols, >=20 words
        bad = self._flags(spark, "w1 w2 # ... # ... tiny doc")
        assert not bad.r_symbol_ratio

    def test_bullet_and_ellipsis_lines(self, spark):
        doc = "\n".join(["- b"] * 2 + ["plain line"] * 8)
        assert not self._flags(spark, doc).r_bullet_lines  # 2/10 > 10%
        doc2 = "\n".join(["- b"] + ["plain line"] * 9)
        assert self._flags(spark, doc2).r_bullet_lines  # exactly 10%
        doc3 = "\n".join(["ends..."] * 3 + ["plain"] * 7)
        assert self._flags(spark, doc3).r_ellipsis_lines  # exactly 30%
        doc4 = "\n".join(["ends..."] * 4 + ["plain"] * 6)
        assert not self._flags(spark, doc4).r_ellipsis_lines

    def test_alpha_and_stopwords(self, spark):
        nums = " ".join(str(i) for i in range(10))
        r = self._flags(spark, f"the of {nums}")
        assert not r.r_alpha_words  # 2/12 alphabetic
        assert r.r_stopwords  # 'the' and 'of'
        assert not self._flags(spark, "the " * 30).r_stopwords  # 1 distinct
