"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 records it has none).

The highest-value property is driver/JVM tokenizer parity:
``tokenize_query`` (pure Python) is the pinned twin of
``functions.text.tokenize`` (Spark expressions), and the zero-job index
build + LocalIndexCache query path both lean on that equivalence. Each
example batch round-trips once through a single DataFrame to keep Spark
invocations bounded.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from ariadne_dbt_spark.functions.text import tokenize, tokenize_query  # noqa: E402

# engine input domain: manifest names/descriptions/SQL — printable ASCII
# plus whitespace variety (the FTS5 reference tokenizer is ascii-mode
# too, schema.sql:209, so non-ASCII folding is out of contract)
_texts = st.text(
    alphabet=st.characters(min_codepoint=9, max_codepoint=126),
    max_size=200,
)


@settings(max_examples=15, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=25))
def test_tokenizer_twin_parity(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    jvm = [r["toks"] for r in df.select(tokenize("t").alias("toks")).collect()]
    py = [tokenize_query(t) for t in texts]
    assert jvm == py


@settings(max_examples=15, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=25))
def test_tokenizer_twin_parity_stemmed(spark, texts):
    from ariadne_dbt_spark.functions.porter import stem_array_udf

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    jvm = [
        r["toks"]
        for r in df.select(stem_array_udf()(tokenize("t")).alias("toks")).collect()
    ]
    py = [tokenize_query(t, stem=True) for t in texts]
    assert jvm == py


@settings(max_examples=10, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=20))
def test_quality_score_bounded(spark, texts):
    from pyspark.sql import functions as F

    from ariadne_dbt_spark.operators.text import quality_score_millionths

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    scores = [r["q"] for r in df.select(quality_score_millionths("t").alias("q")).collect()]
    assert all(0 <= s <= 1_000_000 for s in scores)


_words = st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=8)
_sentences = st.lists(_words, min_size=3, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_sentences, min_size=2, max_size=10))
def test_minhash_clone_invariance(spark, texts):
    """Byte-identical texts must produce identical MinHash signatures
    regardless of row identity (the LSH guaranteed-recall premise)."""
    from ariadne_dbt_spark.operators.dedup import minhash_signatures

    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(1000 + i, t) for i, t in enumerate(texts)]  # clones
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["id"]: tuple(r["sig"]) for r in minhash_signatures(df, "doc_id", "text").collect()}
    for i in range(len(texts)):
        if i in sigs or (1000 + i) in sigs:
            assert sigs.get(i) == sigs.get(1000 + i)


_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(_edges)
def test_dedup_clusters_random_graphs_match_union_find(spark, edges):
    """Min-label propagation must agree with a reference union-find on
    arbitrary random pair graphs (any topology, duplicate edges, both
    orientations)."""
    from ariadne_dbt_spark.operators.dedup import dedup_clusters

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(_sentences, min_size=1, max_size=16),
    st.integers(min_value=8, max_value=64),
)
def test_pack_sequences_invariants(spark, texts, max_tokens):
    """Packing invariants on arbitrary corpora: every doc packed exactly
    once, no pack exceeds max_tokens unless it is a single oversized
    doc, pack ids are globally unique per (bucket, pack) and bucket-
    prefixed, and packing is greedy (consecutive same-bucket packs are
    not mergeable)."""
    from ariadne_dbt_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = pack_sequences(
        df, "doc_id", "text", max_tokens=max_tokens, n_buckets=4
    ).collect()
    assert {r.id for r in rows} == set(range(len(texts)))
    packs: dict[int, list] = {}
    for r in rows:
        assert r.pack_id >> 44 == r.bucket
        packs.setdefault(r.pack_id, []).append(r)
    for members in packs.values():
        total = sum(m.n_tokens for m in members)
        assert total <= max_tokens or len(members) == 1
    # greedy first-fit: replay the recurrence and assert the returned
    # pack assignment matches it exactly (a doc opens pack p+1 iff it
    # could not fit in p)
    by_bucket: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r.id):
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, seq in by_bucket.items():
        fill, pack = 0, 0
        for r in seq:
            if fill > 0 and fill + r.n_tokens > max_tokens:
                pack += 1
                fill = 0
            fill += r.n_tokens
            assert r.pack_id == (bucket << 44) | pack, r


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["web", "books", "code", "wiki", "forum"]),
        st.integers(min_value=1, max_value=500),
        min_size=1,
        max_size=5,
    ),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_temperature_mixing_properties(spark, counts, tau):
    """Mixing-weight properties over arbitrary source distributions:
    weights are a probability vector (sum ≈ 1 within rounding), order-
    preserving (bigger source never gets a smaller weight), and tau
    interpolates monotonically toward uniform as it decreases."""
    from pyspark.sql import functions as F

    from ariadne_dbt_spark.operators.sampling import temperature_mixing

    rows = [(f"{s}_{i}", s) for s, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = {r.source: r for r in temperature_mixing(df, "source", tau=tau).collect()}
    assert set(out) == set(counts)
    total_w = sum(r.weight for r in out.values())
    assert abs(total_w - 1.0) <= 1e-5 * len(counts) + 1e-6
    ordered = sorted(counts.items(), key=lambda kv: kv[1])
    for (s_small, n_small), (s_big, n_big) in zip(ordered, ordered[1:]):
        if n_small < n_big:
            assert out[s_small].weight <= out[s_big].weight + 1e-9


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x9"]),
            min_size=0,
            max_size=9,
        ),
        min_size=1,
        max_size=16,
    ),
    st.sampled_from([4, 8, 16]),
)
def test_block_pack_matches_python_reference(spark, token_lists, block_size):
    """block_pack vs a literal Python concat-and-chunk over the same
    deterministic shuffle order: identical blocks, token-for-token."""
    import hashlib

    from ariadne_dbt_spark.operators.sampling import block_pack

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["shard"], r["block_id"]): r["block_text"].split(" ")
        for r in block_pack(df, "doc_id", "text", block_size=block_size).collect()
    }

    # python reference: md5-shuffled per-shard streams, <eos>-joined,
    # chunked
    def key(i):
        return hashlib.md5(f"0:{i}".encode()).hexdigest()

    streams: dict[str, list[str]] = {}
    order = sorted(range(len(token_lists)), key=lambda i: (key(i)[0], key(i), i))
    for i in order:
        streams.setdefault(key(i)[0], []).extend(token_lists[i] + ["<eos>"])
    want = {}
    for shard, stream in streams.items():
        for b in range(0, len(stream), block_size):
            want[(shard, b // block_size)] = stream[b : b + block_size]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.integers(min_value=1, max_value=6),
            st.lists(
                st.sampled_from(["spark", "stream", "join", "scan", "merge"]),
                min_size=1,
                max_size=5,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_search_index_random_op_sequence_matches_rebuild(spark, tmp_path_factory, ops):
    """Any upsert/delete sequence against the versioned index serves
    BM25 identical to a from-scratch build over the equivalent final
    corpus (stats deltas included)."""
    from ariadne_dbt_spark.operators.search import bm25
    from ariadne_dbt_spark.operators.search_index import (
        build_search_index,
        delete_from_search_index,
        read_search_index,
        upsert_search_index,
    )

    tmp = tmp_path_factory.mktemp("sidx")
    base = {i: f"base doc{i} spark join" for i in range(1, 5)}
    idx = str(tmp / "idx")
    build_search_index(
        spark.createDataFrame(list(base.items()), "doc_id bigint, text string"),
        "doc_id", {"text": "text"}, idx,
    )
    state = dict(base)
    for op, did, toks in ops:
        if op == "upsert":
            text = " ".join(toks)
            upsert_search_index(
                spark, idx,
                spark.createDataFrame([(did, text)], "doc_id bigint, text string"),
                "doc_id", {"text": "text"},
            )
            state[did] = text
        else:
            delete_from_search_index(spark, idx, [did])
            state.pop(did, None)

    ref = str(tmp / "ref")
    build_search_index(
        spark.createDataFrame(list(state.items()), "doc_id bigint, text string")
        if state
        else spark.createDataFrame([], "doc_id bigint, text string"),
        "doc_id", {"text": "text"}, ref,
    )

    def ranked(d):
        postings, docstats, n_docs, avgdl = read_search_index(spark, d)
        return [
            (r["unique_id"], round(r["bm25_score"], 9))
            for r in bm25(
                postings, docstats, n_docs, "spark join",
                field_weights={"text": 1.0}, avgdl_by_field=avgdl,
            ).collect()
        ], n_docs

    got, n_got = ranked(idx)
    want, n_want = ranked(ref)
    assert got == want and n_got == n_want == len(state)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=30
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_excision_matches_python_oracle(spark, texts, L):
    """ExactSubstr excision over a 5-symbol alphabet (duplicated windows
    are dense by construction) must match a from-first-principles Python
    oracle on every random corpus — both the exact-string and the
    hash_grams shuffle key produce identical output."""
    from ariadne_dbt_spark.operators.dedup import excise_duplicate_spans

    rows = [(i, t) for i, t in enumerate(texts)]

    def oracle():
        toks = {i: t.split() if t.strip() else [""] for i, t in rows}
        counts = {}
        for t in toks.values():
            for s in range(len(t) - L + 1):
                g = tuple(t[s : s + L])
                counts[g] = counts.get(g, 0) + 1
        out = {}
        for i, t in toks.items():
            cov = set()
            for s in range(len(t) - L + 1):
                if counts[tuple(t[s : s + L])] >= 2:
                    cov.update(range(s, s + L))
            kept = [tok for p, tok in enumerate(t) if p not in cov]
            out[i] = (len(t), len(t) - len(kept), " ".join(kept))
        return out

    df = spark.createDataFrame(rows, "doc_id long, text string")
    expected = oracle()
    for hashed in (False, True):
        got = {
            r["id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
            for r in excise_duplicate_spans(
                df, "doc_id", "text", L=L, hash_grams=hashed
            ).collect()
        }
        assert got == expected, f"hash_grams={hashed}"


_ids = st.integers(min_value=0, max_value=25)
_vals = st.integers(min_value=-5, max_value=5)
_kv = st.dictionaries(_ids, _vals, max_size=12)


@settings(max_examples=5, deadline=None)
@given(
    target=_kv,
    source=st.dictionaries(_ids, _vals, min_size=1, max_size=8),
    wm=st.sampled_from(["update", "delete", None]),
    wnm=st.sampled_from(["insert", None]),
    wnbs=st.sampled_from([None, "delete"]),
    cond=st.booleans(),
)
def test_merge_table_matches_python_oracle(spark, target, source, wm, wnm, wnbs, cond):
    """merge_table semantics == a direct python replay, across random
    tables, sources, clause combos, and the guarded-update condition
    (s.v > t.v). Small key domain forces key collisions; unionByName /
    prune / condition handling all sit under this one property."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ariadne_dbt_spark.operators.table_store import merge_table, read_table, write_table

    if wm is None and wnm is None and wnbs is None:
        wnm = "insert"  # the no-op combo raises by contract; not under test

    def oracle():
        out = {}
        for k, tv in target.items():
            if k in source:
                sv = source[k]
                won = (not cond) or (sv > tv)
                if wm == "update":
                    out[k] = sv if won else tv
                elif wm == "delete":
                    if not won:
                        out[k] = tv
                else:
                    out[k] = tv
            elif wnbs is None:
                out[k] = tv
            # else: not matched by source -> reaped
        if wnm == "insert":
            for k, sv in source.items():
                if k not in target:
                    out[k] = sv
        return out

    work = tempfile.mkdtemp(prefix="merge_prop_")
    try:
        tdir = f"{work}/t"
        write_table(
            spark,
            spark.createDataFrame(
                [(k, v) for k, v in target.items()] or [(None, None)], "k int, v int"
            ).where(F.col("k").isNotNull()),
            tdir,
        )
        src = spark.createDataFrame([(k, v) for k, v in source.items()], "k int, v int")
        merge_table(
            spark,
            tdir,
            src,
            ["k"],
            when_matched=wm,
            when_not_matched=wnm,
            when_not_matched_by_source=wnbs,
            when_matched_condition="s.v > t.v" if cond else None,
        )
        got = {r["k"]: r["v"] for r in read_table(spark, tdir).collect()}
        assert got == oracle()
    finally:
        shutil.rmtree(work, ignore_errors=True)
