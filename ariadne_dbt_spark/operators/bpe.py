"""BPE tokenizer induction over a distributed corpus (north-star scale
extension: vocabulary training + tokenizer application are standard
stages of a pretraining data pipeline).

The shape mirrors production tokenizer trainers (HF tokenizers,
SentencePiece): the CORPUS-SIZED work — word counting — is one
distributed aggregation; the merge loop then runs on the distilled
``(word, count)`` table, which is VOCABULARY-sized (≈10⁵-10⁷ rows at
100 TB — driver-safe), never on the corpus. Encoding learned merges
back over the corpus is an Arrow-batched pandas UDF with a per-batch
word cache (string merge application is genuinely imperative; the
batch-level UDF is the sanctioned slow path, never row-at-a-time).

Reference algorithm: Sennrich, Haddow & Birch 2016 ("Neural Machine
Translation of Rare Words with Subword Units"), the classic
character-level BPE with an end-of-word terminal.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word terminal symbol (Sennrich's </w>)
EOW = "</w>"

__all__ = ["EOW", "word_counts", "bpe_train", "bpe_encode", "symbol_pair_counts"]


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``(word, n)`` corpus-wide — the one distributed stage of BPE
    training (map-side partial combine; output is vocabulary-sized)."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def symbol_pair_counts(wc: DataFrame) -> DataFrame:
    """``(s1, s2, pair_count)`` — adjacent character-symbol pair counts
    weighted by word frequency, over the distilled word-count table
    (chars + the ``</w>`` terminal). This is exactly the statistic the
    first BPE merge maximizes, computed as DataFrame ops so the SQL
    oracle can mirror it; the iterative loop (:func:`bpe_train`) is
    pinned by pytest instead."""
    from pyspark.sql.window import Window

    syms = wc.select(
        "word",
        "n",
        F.posexplode(
            F.concat(F.expr("regexp_extract_all(word, '.', 0)"), F.array(F.lit(EOW)))
        ).alias("pos", "s1"),
    )
    w = Window.partitionBy("word").orderBy("pos")
    pairs = syms.select(
        "word", "n", "s1", F.lead("s1").over(w).alias("s2")
    ).where(F.col("s2").isNotNull())
    return pairs.groupBy("s1", "s2").agg(F.sum("n").alias("pair_count"))


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> Counter:
    c: Counter = Counter()
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += n
    return c


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, joined = 0, pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    wc: DataFrame | list[tuple[str, int]],
    n_merges: int,
    *,
    max_driver_words: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-count table.

    Accepts the :func:`word_counts` DataFrame (collected — guarded by
    ``max_driver_words``; the distilled vocabulary is what production
    trainers hold in memory too) or a pre-collected list. Deterministic
    tie-break: highest count, then lexicographically smallest pair —
    so retrainings are bit-reproducible.
    """
    if isinstance(wc, DataFrame):
        n = wc.count()
        if n > max_driver_words:
            raise ValueError(
                f"vocabulary {n} exceeds max_driver_words={max_driver_words}; "
                "pre-aggregate (e.g. min-count filter) before training"
            )
        rows = [(r["word"], int(r["n"])) for r in wc.collect()]
    else:
        rows = list(wc)
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in rows:
        vocab[tuple(word) + (EOW,)] = vocab.get(tuple(word) + (EOW,), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(s, best): n for s, n in vocab.items()}
    return merges


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]], *, out_col: str = "bpe_tokens"
) -> DataFrame:
    """Apply learned merges: adds ``out_col: array<string>`` of subword
    tokens. Arrow-batched pandas UDF with a per-batch distinct-word
    cache — the merge table broadcasts with the UDF closure, so
    encoding is MAP-ONLY over the corpus (the production shape)."""
    import pandas as pd

    globals()["pd"] = pd  # postponed type hints resolve against module globals
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) > 1:
            cand = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cand:
                break
            r, i = min(cand)
            pair = merges[r]
            syms = list(_merge_word(tuple(syms), pair))
        cache[word] = syms
        return syms

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        cache: dict = {}
        return s.map(
            lambda t: [
                tok
                for w in str(t).strip().lower().split()
                for tok in _encode_word(w, cache)
            ]
        )

    return df.withColumn(out_col, _enc(F.col(text_col)))
