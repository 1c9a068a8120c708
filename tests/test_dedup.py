"""Dedup invariants for the engine-hash ops the SQL oracle can't check:
MinHash estimate accuracy, LSH candidate recall vs exact Jaccard,
SimHash hamming locality, exact-dedup survivor determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_jaccard_estimate,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_sets,
)
from ariadne_dbt_spark.operators.text import hamming64, with_simhash


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base),                                  # exact dup of 1
        (3, base.replace("quick", "speedy")),       # near dup of 1
        (4, "completely different text about database engines and query plans"),
        (5, "yet another unrelated document mentioning spark shuffles and joins"),
        (6, base + " extra trailing words appended here"),  # near dup, longer
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(corpus):
    groups = exact_duplicates(corpus, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 2
    assert groups[0].keep_id == 1


def test_dedup_exact_survivor(corpus):
    kept = {r.doc_id for r in dedup_exact(corpus, "doc_id", "text").collect()}
    assert kept == {1, 3, 4, 5, 6}  # min-id survivor of the dup group


def test_shingles(corpus):
    sh = shingle_sets(corpus.where(F.col("doc_id") == 1), "doc_id", "text", n=3)
    shingles = {r.shingle for r in sh.collect()}
    assert "the quick brown" in shingles
    assert len(shingles) == 12  # 14 tokens → 12 distinct 3-grams

def test_ngram_jaccard_detects_near_dups(corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # one word changed → shares most shingles
    assert (2, 3) in pairs
    assert not any({4, 5} & set(k) for k in pairs)


def test_minhash_estimate_tracks_exact(spark, corpus):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_jaccard_estimate(corpus, "doc_id", "text", n=3, num_perm=128).collect()
    }
    assert est[(1, 2)] == 1.0  # identical docs → identical signatures
    for pair, j in exact.items():
        if j >= 0.5:
            assert abs(est[pair] - j) < 0.25, (pair, j, est[pair])


def test_lsh_candidates_recall(corpus):
    """Every pair with exact Jaccard ≥ 0.7 must appear in the LSH
    candidate set (16 bands × 4 rows → s-curve threshold ≈ 0.5)."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(corpus, "doc_id", "text", n=3, num_perm=64, bands=16).collect()
    }
    assert exact <= cand, f"missed: {exact - cand}"


def test_signatures_deterministic(spark, corpus):
    s1 = {r.id: list(r.sig) for r in minhash_signatures(corpus, "doc_id", "text").collect()}
    s2 = {r.id: list(r.sig) for r in minhash_signatures(corpus, "doc_id", "text").collect()}
    assert s1 == s2
    assert all(len(v) == 64 for v in s1.values())


def test_simhash_locality(corpus):
    sh = {r.doc_id: r.simhash for r in with_simhash(corpus, "text").collect()}
    df = corpus.sparkSession.createDataFrame(
        [(sh[1], sh[2]), (sh[1], sh[3]), (sh[1], sh[4])], "a long, b long"
    )
    d12, d13, d14 = [
        r.d for r in df.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    ]
    assert d12 == 0          # identical text → identical fingerprint
    assert d13 < d14         # near dup closer than unrelated
    assert d13 <= 16


def test_jaccard_strategies_agree(corpus):
    a = sorted(
        tuple(r) for r in ngram_jaccard_pairs(
            corpus, "doc_id", "text", n=3, threshold=0.5, strategy="count"
        ).collect()
    )
    b = sorted(
        tuple(r) for r in ngram_jaccard_pairs(
            corpus, "doc_id", "text", n=3, threshold=0.5, strategy="prefix"
        ).collect()
    )
    assert a == b and a


def test_short_and_empty_docs_yield_no_shingles(spark):
    """Docs with fewer than n tokens must not crash (ANSI slice guard)
    and must contribute zero shingles — matching the SQL oracle, which
    generates no n-grams for them."""
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "one two three four")],
        "doc_id long, text string",
    )
    sh = shingle_sets(df, "doc_id", "text", n=3)
    got = {r.id for r in sh.collect()}
    assert got == {4}  # only the 4-token doc makes 3-gram shingles
    # the full pipelines survive the same corpus
    assert ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).count() == 0
    sims = with_simhash(df, "text", shingle=2).collect()
    assert len(sims) == 4  # empty/1-token docs get the all-zero-vote fingerprint


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find: node -> min id of its component."""
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
    return {x: find(x) for x in parent}


def test_dedup_clusters_matches_union_find(spark):
    """Min-label propagation == union-find on an adversarial mix of
    chains, a star, a triangle, and an isolated pair — including a chain
    whose min id sits at the END (max propagation distance)."""
    from ariadne_dbt_spark.operators.dedup import dedup_clusters

    edges = [
        (10, 11), (11, 12), (12, 13), (13, 14),   # chain, min at head
        (24, 23), (23, 22), (22, 21), (21, 20),   # chain, min at tail
        (30, 31), (30, 32), (30, 33),             # star
        (40, 41), (41, 42), (42, 40),             # triangle
        (50, 51),                                  # isolated pair
        (12, 22),                                  # bridge: merges both chains
    ]
    expect = _union_find_components(edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == expect


def test_pii_redaction_and_repetition(spark):
    """redact_pii replaces emails/urls with typed tags; repetition stats
    are exact integer millionths."""
    from ariadne_dbt_spark.operators.text import count_pii, redact_pii, repetition_stats
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "write to bob@x.io or see https://x.io/page now"),
            (2, "a a a b"),
            (3, "unique words only here"),
        ],
        "id long, text string",
    )
    n_emails, n_urls = count_pii("text")
    red = df.select("id", n_emails.alias("e"), n_urls.alias("u"),
                    redact_pii("text").alias("r")).orderBy("id").collect()
    assert (red[0].e, red[0].u) == (1, 1)
    assert "<EMAIL>" in red[0].r and "<URL>" in red[0].r and "bob@x.io" not in red[0].r
    assert (red[1].e, red[1].u) == (0, 0)

    rep = {r.id: r for r in repetition_stats(df, "id", "text").collect()}
    # doc 2: 4 tokens, 2 distinct -> dup = 1e6*2/4 = 500000; top = 1e6*3/4
    assert rep[2].dup_tok_millionths == 500_000
    assert rep[2].top_tok_millionths == 750_000
    assert rep[3].dup_tok_millionths == 0


def test_chunk_documents_overlap_and_reconstruction(spark):
    from ariadne_dbt_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "id long, text string")
    rows = sorted(
        chunk_documents(df, "id", "text", chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0,3,6,9 -> 4 chunks; last is short
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert rows[3].chunk_text == "w9" and rows[3].n_tokens == 1
    # every token is covered by at least one chunk
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"w{i}" for i in range(10)}


def test_decontamination_flags_planted_overlap(spark):
    from ariadne_dbt_spark.operators.dedup import decontamination_flags

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),      # shares 3-gram shingles
            (2, "completely unrelated words entirely"),  # clean
            (3, "ab"),                                   # < n tokens -> clean
        ],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in decontamination_flags(
        train, bench, "doc_id", "text", n=3, min_hits=1
    ).collect()}
    assert rows[1].contaminated and rows[1].n_hits >= 3
    assert not rows[2].contaminated and rows[2].n_hits == 0
    assert not rows[3].contaminated and rows[3].n_hits == 0
    assert set(rows) == {1, 2, 3}  # every training doc gets a row


def test_ngram_jaccard_cache_lifecycle(spark, corpus):
    """The shingle/dfreq caches must not outlive the call (a long-lived
    serving session would otherwise accumulate MEMORY_AND_DISK blocks per
    dedup invocation). Contract: on return, only the materialized result
    checkpoint holds storage; out.unpersist() releases even that."""
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    out = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
    assert out.count() > 0
    after = jsc.getPersistentRDDs().size()
    # sh (+ dfreq on the auto path) are gone; only the result checkpoint remains
    assert after <= base + 1, f"cache leak: {after - base} persistent RDDs added"
    out.unpersist()
    assert jsc.getPersistentRDDs().size() <= base


def test_incremental_near_dup_flags(spark):
    from ariadne_dbt_spark.operators.dedup import incremental_near_dup_flags

    existing = spark.createDataFrame(
        [(2, "the quick brown fox jumps over the lazy dog today"),
         (4, "completely different text about database engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, "quick brown fox jumps over the lazy dog today"),   # near-dup of 2
         (3, "an entirely novel document about spark shuffles"),  # clean
         (5, "xy")],                                              # < n tokens -> clean
        "doc_id long, text string",
    )
    rows = {r.id: r for r in incremental_near_dup_flags(
        existing, batch, "doc_id", "text", n=3, threshold=0.5
    ).collect()}
    assert set(rows) == {1, 3, 5}          # one row per batch doc, never existing
    assert rows[1].is_dup and rows[1].n_dups == 1 and rows[1].max_jaccard > 0.5
    assert not rows[3].is_dup and rows[3].n_dups == 0 and rows[3].max_jaccard is None
    assert not rows[5].is_dup


def test_incremental_flags_agree_with_full_pairs(spark):
    """Cross-validation: flagging a batch against an existing corpus must
    agree exactly with running the FULL pairwise near-dup computation on
    existing ∪ batch and keeping only the cross (batch × existing) pairs
    — same threshold, same shingles, per-doc n_dups/max_jaccard equal."""
    from ariadne_dbt_spark.operators.dedup import (
        incremental_near_dup_flags,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    existing = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1).union(
        docs.where(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    flags = {
        r.id: r
        for r in incremental_near_dup_flags(
            existing, batch, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    full = ngram_jaccard_pairs(
        existing.union(batch), "doc_id", "text", n=3, threshold=0.8
    )
    existing_ids = {r.doc_id for r in existing.collect()}
    batch_ids = set(flags)
    cross: dict[int, list[float]] = {}
    for r in full.collect():
        for b, e in ((r.id_a, r.id_b), (r.id_b, r.id_a)):
            if b in batch_ids and e in existing_ids:
                cross.setdefault(b, []).append(r.jaccard)
    full.unpersist()
    assert any(v for v in cross.values())  # planted mutations produce hits
    for bid, row in flags.items():
        expected = cross.get(bid, [])
        assert row.n_dups == len(expected), bid
        if expected:
            assert row.max_jaccard == round(max(expected), 6)
        else:
            assert row.max_jaccard is None and not row.is_dup


def test_shingle_index_matches_recompute(spark, tmp_path):
    """The persisted-index path must be plan-only: identical flags to the
    on-the-fly path on the gate corpus split, and its executed plan must
    READ the index (pruned parquet scan) instead of re-shingling the
    existing corpus."""
    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        incremental_near_dup_flags,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    existing = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    index_dir = str(tmp_path / "shidx")
    meta = build_shingle_index(existing, index_dir, "doc_id", "text", n=3)
    assert meta["n"] == 3

    recompute = incremental_near_dup_flags(
        existing, batch, "doc_id", "text", n=3, threshold=0.8
    )
    indexed = incremental_near_dup_flags(
        None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=index_dir
    )
    a = sorted(map(tuple, recompute.collect()))
    b = sorted(map(tuple, indexed.collect()))
    assert a == b and len(a) > 0

    # formatted explain keeps full scan Locations (toString abbreviates)
    plan = indexed._sc._jvm.PythonSQLUtils.explainString(
        indexed._jdf.queryExecution(), "formatted"
    )
    # existing side comes from the index files...
    assert "shidx" in plan and "postings" in plan
    # ...with partition-level pruning on the bucket directories
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]
    # ...and the existing corpus is never re-scanned (hence never
    # re-shingled): the only documents.parquet scans carry the batch's
    # %2=1 filter; an existing-side recompute would scan with %2=0
    assert "% 2) = 1" in plan, plan
    assert "% 2) = 0" not in plan, plan


def test_shingle_index_arg_validation(spark, tmp_path):
    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        incremental_near_dup_flags,
    )

    df = spark.createDataFrame(
        [(1, "one two three four five")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="exactly one"):
        incremental_near_dup_flags(df, df, "doc_id", "text", index_dir="/nope")
    with pytest.raises(ValueError, match="exactly one"):
        incremental_near_dup_flags(None, df, "doc_id", "text")
    index_dir = str(tmp_path / "idx")
    build_shingle_index(df, index_dir, "doc_id", "text", n=3)
    with pytest.raises(ValueError, match="n=3"):
        incremental_near_dup_flags(
            None, df, "doc_id", "text", n=4, index_dir=index_dir
        )


def test_ingest_batch_dedup_gated_cycle(spark, tmp_path):
    """Two-batch ingest cycle against the persisted index: batch 1's
    accepted docs are appended, so batch 2's clone OF A BATCH-1 DOC is
    flagged without any corpus rebuild; rejected dups never enter the
    index."""
    from ariadne_dbt_spark.operators.dedup import (
        build_shingle_index,
        incremental_near_dup_flags,
        ingest_batch_dedup_gated,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_shingle_index(corpus, idx, "doc_id", "text", n=3)

    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),    # dup of 1
         (11, "completely novel text about spark adaptive query execution")],
        "doc_id long, text string",
    )
    acc1 = ingest_batch_dedup_gated(b1, idx, "doc_id", "text", threshold=0.8)
    assert {r.doc_id for r in acc1.collect()} == {11}

    b2 = spark.createDataFrame(
        [(20, "completely novel text about spark adaptive query execution"),  # dup of 11
         (21, "alpha beta gamma delta epsilon zeta eta theta"),               # dup of 1
         (22, "fresh unrelated words nobody wrote before in any batch here")],
        "doc_id long, text string",
    )
    flags = {r.id: r for r in incremental_near_dup_flags(
        None, b2, "doc_id", "text", index_dir=idx, threshold=0.8
    ).collect()}
    assert flags[20].is_dup      # caught via batch-1's APPENDED postings
    assert flags[21].is_dup      # caught via the original build
    assert not flags[22].is_dup
    acc2 = ingest_batch_dedup_gated(b2, idx, "doc_id", "text", threshold=0.8)
    assert {r.doc_id for r in acc2.collect()} == {22}


def test_auto_minhash_params_laws():
    """MinHash auto (num_perm, bands): rows-per-band grows ~log2(n)/2,
    recall formula satisfied at the threshold when the cap doesn't
    bind, num_perm = bands * rows by construction."""
    import math

    from ariadne_dbt_spark.operators.dedup import auto_minhash_params

    rs = []
    for n in (1_000, 100_000, 10_000_000):
        num_perm, bands = auto_minhash_params(n, 0.8)
        r = num_perm // bands
        rs.append(r)
        assert num_perm == bands * r
        if bands < 64:
            assert 1.0 - (1.0 - 0.8**r) ** bands >= 0.95
    assert rs == sorted(rs) and rs[-1] > rs[0]  # r grows with n
    # jaccard 1.0 (exact clones) needs a single band
    assert auto_minhash_params(10**9, 1.0)[1] == 1


def test_minhash_auto_mode_recall(corpus):
    """Auto parameterization keeps the candidate-recall invariant on
    the fixture corpus: every exact-Jaccard>=0.7 pair still surfaces."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            corpus, "doc_id", "text", n=3, num_perm=None, bands=None,
            threshold=0.7, n_rows=6,
        ).collect()
    }
    assert exact <= cand, f"missed: {exact - cand}"


def test_remove_boilerplate_lines(spark):
    from ariadne_dbt_spark.operators.dedup import remove_boilerplate_lines

    rows = [
        (1, "unique first line\nSHARED FOOTER\n\nbody of doc one"),
        (2, "doc two opening\nSHARED FOOTER\nanother body line"),
        (3, "  SHARED FOOTER  \nlone content three"),   # whitespace-normalized match
        (4, "SHARED FOOTER"),                            # all-boilerplate doc survives empty
        (5, "totally clean document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in remove_boilerplate_lines(df, "doc_id", "text", min_df=3).collect()
    }
    assert got[1] == ("unique first line\n\nbody of doc one", 3, 1)
    assert got[2] == ("doc two opening\nanother body line", 2, 1)
    assert got[3] == ("lone content three", 1, 1)
    assert got[4] == ("", 0, 1)
    assert got[5] == ("totally clean document", 1, 0)
    # blank lines never count toward boilerplate df
    assert "\n\n" in got[1][0]


class TestSharedSpans:
    """Exact substring-span detection (Lee et al. 2022 analog)."""

    def _corpus(self, spark):
        span = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike november oscar papa"
        rows = [
            (1, f"one unique opening here {span} and a distinct tail one"),
            (2, f"two other starting words {span} closing differently two"),
            (3, "no overlap at all in this document whatsoever plain words only here"),
            (4, f"short shared bit alpha bravo charlie delta echo foxtrot golf hotel done"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_span_found_exactly(self, spark):
        from ariadne_dbt_spark.operators.dedup import shared_span_pairs

        out = shared_span_pairs(self._corpus(spark), "doc_id", "text", k=4, min_span=10)
        rows = {(r.id_a, r.id_b): (r.n_spans, r.max_span_tokens) for r in out.collect()}
        # the 16-token span is shared by docs 1 and 2 only
        assert (1, 2) in rows
        assert rows[(1, 2)] == (1, 16)
        # doc 4 shares only 8 tokens with 1/2 — below min_span=10
        assert not any(4 in p for p in rows)
        assert not any(3 in p for p in rows)

    def test_min_span_boundary(self, spark):
        from ariadne_dbt_spark.operators.dedup import shared_span_pairs

        out = shared_span_pairs(self._corpus(spark), "doc_id", "text", k=4, min_span=8)
        rows = {(r.id_a, r.id_b): r.max_span_tokens for r in out.collect()}
        # at min_span=8 doc 4's 8-token overlap with 1 and 2 appears
        assert rows[(1, 4)] == 8 and rows[(2, 4)] == 8

    def test_max_df_caps_hot_grams(self, spark):
        from ariadne_dbt_spark.operators.dedup import shared_span_pairs

        boiler = "this footer is in every single document of the corpus today"
        rows = [(i, f"doc {i} body words {boiler}") for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # without the cap: all 15 pairs; with max_df=2 the hot grams drop
        full = shared_span_pairs(df, "doc_id", "text", k=4, min_span=8)
        capped = shared_span_pairs(df, "doc_id", "text", k=4, min_span=8, max_df=2)
        assert full.count() == 15
        assert capped.count() == 0
