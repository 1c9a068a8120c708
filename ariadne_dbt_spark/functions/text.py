"""Tokenization primitives (SURVEY §2.7 T1/T2/T9).

Reference behavior: queries are lowercased, non-word chars stripped,
split on whitespace, stopworded, 1-char tokens dropped (reference:
src/ariadne_dbt/search.py:23-35); indexed docs additionally go through a
Porter stemmer (FTS5 ``tokenize='porter ascii'``, schema.sql:209).

Everything here stays JVM-side (regexp_replace / split / filter on array
columns) except the Porter stemmer, which is a pandas UDF over the
posting build — the one genuinely non-SQL piece, applied identically to
both index and query sides so scores stay consistent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference's 15-token stopword set (search.py:31)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "in", "on", "for", "to",
    "is", "are", "was", "with", "that",
)

_NON_WORD = "[^a-z0-9\\s]"


def tokenize(col: Column | str, *, min_len: int = 2, stop: bool = True) -> Column:
    """lower → strip non-word → split — returns an array<string> column.

    Matches the oracle pipeline:
    ``string_split_regex(regexp_replace(lower(x),'[^a-z0-9\\s]',' ','g'),'\\s+')``
    with short tokens (and optionally stopwords) filtered out.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.regexp_replace(F.lower(c), _NON_WORD, " "), "\\s+")
    if stop:
        # element-wise filter (NOT array_except, which would dedupe and
        # destroy term frequencies)
        return F.filter(toks, lambda t: (F.length(t) >= min_len) & ~t.isin(*STOPWORDS))
    return F.filter(toks, lambda t: F.length(t) >= min_len)


def tokenize_query(
    text: str, *, min_len: int = 2, stop: bool = True, stem: bool = False
) -> list[str]:
    """Driver-side twin of :func:`tokenize` for query strings. With
    ``stem=True`` Porter-stems each token — must match the posting build
    side exactly (reference: FTS5 porter tokenizer applies to both,
    schema.sql:209)."""
    import re

    toks = re.sub(r"[^a-z0-9\s]", " ", text.lower()).split()
    out = []
    for t in toks:
        if len(t) < min_len:
            continue
        if stop and t in STOPWORDS:
            continue
        out.append(t)
    if stem:
        from ariadne_dbt_spark.functions.porter import porter_stem

        out = [porter_stem(t) for t in out]
    return out


def truncate_sql(col: Column | str, n_chars: int = 2000) -> Column:
    """T9: cap SQL text entering the search index at ``n_chars``
    (default 2000 — reference: indexer.py:475-476 stores
    ``sql[:2000]`` in the FTS docs so one pathological compiled model
    can't dominate the index). Shared by the manifest indexer's posting
    build and the truncation workloads so the semantics live in exactly
    one place."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n_chars)
