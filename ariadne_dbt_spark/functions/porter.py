"""Porter stemmer (T2) — the one genuinely non-SQL piece of the search
pipeline.

The reference indexes model text with SQLite FTS5's porter tokenizer
(reference: src/ariadne_dbt/schema.sql:209 ``tokenize='porter ascii'``),
so "orders" and "order" hit the same posting. Spark has no stemmer
builtin; this is an independent implementation of the published Porter
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
14(3) 1980 — public domain algorithm), applied in TWO places that must
agree exactly:

* column-side — a pandas UDF over token arrays in the posting build
  (Arrow-batched; the per-token work is pure string ops, so the UDF cost
  is one pass over the exploded corpus at index time, never at query
  time);
* driver-side — plain Python over the handful of query tokens.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m-1... returns the
    replaced word, else None. min_m is the m-condition threshold (m > min_m-1
    i.e. m >= min_m)."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) >= min_m:
        return stem + repl
    return None


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(word: str) -> str:
    """Stem one lowercase token. Words of length <= 2 pass through
    (standard Porter behavior)."""
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, repl in _STEP2:
        if w.endswith(suf):
            out = _replace(w, suf, repl, 1)
            if out is not None:
                w = out
            break

    # step 3
    for suf, repl in _STEP3:
        if w.endswith(suf):
            out = _replace(w, suf, repl, 1)
            if out is not None:
                w = out
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


#: per-process memo — corpus vocabulary is tiny relative to token count,
#: so nearly every call is a dict hit (cleared never; bounded by vocab)
_STEM_CACHE: dict[str, str] = {}


def stem_tokens(tokens: list[str] | None) -> list[str] | None:
    if tokens is None:
        return None
    cache = _STEM_CACHE
    out = []
    for t in tokens:
        s = cache.get(t)
        if s is None:
            s = porter_stem(t)
            cache[t] = s
        out.append(s)
    return out


def stem_array_udf():
    """Pandas UDF ``array<string> -> array<string>`` stemming every token
    (Arrow-batched: one Python hop per batch, not per row)."""
    # module-level pandas import so the UDF's postponed type hints
    # ("pd.Series" under `from __future__ import annotations`) resolve
    import pandas as pd  # noqa: F401  (resolved via module globals)
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd

    @pandas_udf("array<string>")
    def _stem(col: pd.Series) -> pd.Series:
        return col.map(stem_tokens)

    return _stem
