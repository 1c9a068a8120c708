"""excise_duplicate_spans — corpus-level ExactSubstr removal (Lee et
al. 2022): every token position covered by an L-token window occurring
>= 2x corpus-wide (within-doc repeats included) is cut from EVERY
occurrence. Verified against a from-first-principles Python oracle on
hand-built corpora covering: cross-doc shared spans, within-doc
repeats, sub-L documents, whole-doc clones, overlapping-window merge,
and the hash_grams scale path's bit-parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.dedup import excise_duplicate_spans


def _oracle(rows: list[tuple[int, str]], L: int) -> dict[int, tuple[int, int, str]]:
    toks = {i: t.strip().lower().split() if t.strip() else [""] for i, t in rows}
    # NOTE: Spark's split('\\s+') on a trimmed empty string yields [""];
    # mirror that so the edge case is pinned, not papered over.
    counts: dict[tuple[str, ...], int] = {}
    for t in toks.values():
        for s in range(len(t) - L + 1):
            g = tuple(t[s : s + L])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, t in toks.items():
        covered = set()
        for s in range(len(t) - L + 1):
            if counts[tuple(t[s : s + L])] >= 2:
                covered.update(range(s, s + L))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        out[i] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


def _run(spark, rows, L, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in excise_duplicate_spans(df, "doc_id", "text", L=L, **kw).collect()
    }
    assert got == _oracle(rows, L)
    return got


def test_cross_doc_span_removed_from_both(spark):
    rows = [
        (1, "alpha beta THE SHARED RUN OF FIVE tail one"),
        (2, "intro words the shared run of five closing"),
        (3, "completely unrelated text with no repeats at all"),
    ]
    got = _run(spark, rows, L=5)
    assert got[1][2] == "alpha beta tail one"
    assert got[2][2] == "intro words closing"
    assert got[3] == (8, 0, "completely unrelated text with no repeats at all")


def test_within_doc_repeat_both_occurrences_cut(spark):
    rows = [(1, "x y z a b c q q x y z a b c w")]
    got = _run(spark, rows, L=6)
    # "x y z a b c" appears twice inside the one doc -> both cut
    assert got[1] == (15, 12, "q q w")


def test_sub_L_doc_untouched_and_whole_doc_clones_emptied(spark):
    rows = [
        (1, "one two three"),
        (2, "c l o n e d d o c b o d y"),
        (3, "c l o n e d d o c b o d y"),
    ]
    got = _run(spark, rows, L=5)
    assert got[1] == (3, 0, "one two three")
    assert got[2] == (13, 13, "")
    assert got[3] == (13, 13, "")


def test_overlapping_duplicated_windows_merge(spark):
    # doc 2 embeds a 7-token run from doc 1: its three L=5 windows
    # overlap; the union must cut exactly the 7-token run, once.
    rows = [
        (1, "p q SEVEN TOKEN RUN IS EXACTLY HERE NOW r s"),
        (2, "seven token run is exactly here now suffix junk"),
    ]
    got = _run(spark, rows, L=5)
    assert got[1][2] == "p q r s"
    assert got[2][2] == "suffix junk"


def test_whitespace_normalization_and_case_fold(spark):
    rows = [(1, "  Mixed   CASE    spacing  doc  "), (2, "other words here")]
    got = _run(spark, rows, L=5)
    assert got[1] == (4, 0, "mixed case spacing doc")


def test_hash_grams_path_is_bit_identical(spark):
    rows = [
        (i, f"unique head {i} the shared run of five tokens tail {i}")
        for i in range(20)
    ] + [(99, "nothing in common with anything else whatsoever")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = sorted(
        map(tuple, excise_duplicate_spans(df, "doc_id", "text", L=5).collect())
    )
    hashed = sorted(
        map(
            tuple,
            excise_duplicate_spans(
                df, "doc_id", "text", L=5, hash_grams=True
            ).collect(),
        )
    )
    assert exact == hashed
    _run(spark, rows, L=5)


def _oracle_keep_first(
    rows: list[tuple[int, str]], L: int
) -> dict[int, tuple[int, int, str]]:
    toks = {i: t.strip().lower().split() if t.strip() else [""] for i, t in rows}
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for i in sorted(toks):
        t = toks[i]
        for s in range(len(t) - L + 1):
            occ.setdefault(tuple(t[s : s + L]), []).append((i, s))
    out = {}
    for i, t in toks.items():
        covered = set()
        for s in range(len(t) - L + 1):
            g = occ[tuple(t[s : s + L])]
            if len(g) >= 2 and min(g) != (i, s):
                covered.update(range(s, s + L))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        out[i] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


def test_keep_first_retains_canonical_copy(spark):
    rows = [
        (1, "alpha beta THE SHARED RUN OF FIVE tail one"),
        (2, "intro words the shared run of five closing"),
        (5, "c l o n e d d o c b o d y"),
        (6, "c l o n e d d o c b o d y"),
        (7, "x y z a b c q q x y z a b c w"),
    ]
    from ariadne_dbt_spark.operators.dedup import excise_duplicate_spans

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in excise_duplicate_spans(
            df, "doc_id", "text", L=5, keep="first"
        ).collect()
    }
    assert got == _oracle_keep_first(rows, 5)
    # lowest-id doc keeps the shared span whole; the clone is cut
    assert got[1] == (9, 0, "alpha beta the shared run of five tail one")
    assert got[2][2] == "intro words closing"
    # whole-doc clones: first copy survives intact, second empties
    assert got[5][1] == 0 and got[6] == (13, 13, "")
    # within-doc repeat (L=6 run at positions 0 and 8): first copy kept
    got6 = {
        r["id"]: r["text_clean"]
        for r in excise_duplicate_spans(
            df.where(F.col("doc_id") == 7), "doc_id", "text", L=6, keep="first"
        ).collect()
    }
    assert got6[7] == "x y z a b c q q w"
    # hash_grams parity for keep="first"
    hashed = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in excise_duplicate_spans(
            df, "doc_id", "text", L=5, keep="first", hash_grams=True
        ).collect()
    }
    assert hashed == got


def test_keep_rejects_unknown_mode(spark):
    from ariadne_dbt_spark.operators.dedup import excise_duplicate_spans

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        excise_duplicate_spans(df, "doc_id", "text", L=2, keep="last")


def _decon_oracle(
    rows: list[tuple[int, str]], bench: list[str], L: int
) -> dict[int, tuple[int, int, str]]:
    btoks = [b.strip().lower().split() for b in bench]
    bgrams = set()
    for t in btoks:
        for s in range(len(t) - L + 1):
            bgrams.add(tuple(t[s : s + L]))
    out = {}
    for i, txt in rows:
        t = txt.strip().lower().split() if txt.strip() else [""]
        covered = set()
        for s in range(len(t) - L + 1):
            if tuple(t[s : s + L]) in bgrams:
                covered.update(range(s, s + L))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        out[i] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


def test_contaminated_spans_cut_clean_docs_pass_through(spark):
    from ariadne_dbt_spark.operators.dedup import excise_contaminated_spans

    bench = [
        "what is the capital of france the answer is paris",
        "solve for x in two x plus three equals seven",
    ]
    rows = [
        # embeds a full benchmark question mid-document
        (1, "intro text what is the capital of france the answer is paris outro"),
        # clean doc sharing a few (< L) benchmark tokens
        (2, "the capital markets of france reopened today"),
        # two docs contaminated by the SAME benchmark item (df doesn't
        # matter — presence in bench is the trigger, not corpus count)
        (3, "copy a solve for x in two x plus three equals seven"),
        (4, "copy b solve for x in two x plus three equals seven"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bdf = spark.createDataFrame([(t,) for t in bench], ["text"])
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in excise_contaminated_spans(
            df, bdf, "doc_id", "text", L=9
        ).collect()
    }
    assert got == _decon_oracle(rows, bench, 9)
    assert got[1][2] == "intro text outro"
    assert got[2][1] == 0
    assert got[3][2] == "copy a" and got[4][2] == "copy b"
    # corpus-internal duplication alone must NOT trigger cuts: docs 3/4
    # share a 10-token run, but the trigger set is the benchmark only
    hashed = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in excise_contaminated_spans(
            df, bdf, "doc_id", "text", L=9, hash_grams=True
        ).collect()
    }
    assert hashed == got


def test_no_cartesian_and_single_gram_shuffle(spark):
    rows = [(i, f"doc {i} body shared filler words again {i}") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    plan = (
        excise_duplicate_spans(df, "doc_id", "text", L=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # exchange ceiling for the round-10 two-phase plan: token barrier +
    # hash-count agg + hash semi-join + candidate groupBy (checkpointed)
    # + string-confirm agg/join + covered-set groupBy + rebuild left
    # join. Measured 11 pre-AQE (several are the SAME reused token
    # barrier, and the churn-sized join sides become broadcasts at
    # runtime); 13 leaves headroom without hiding a regression to a
    # recompute-heavy shape. The corpus-sized exchanges carry only
    # (id, start, int64 hash) rows — never gram strings; the old
    # string-keyed single-phase plan is the regression this pins out.
    assert plan.count("Exchange") <= 13, plan.count("Exchange")
