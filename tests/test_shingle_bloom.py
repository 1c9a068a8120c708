"""Bloom sidecar on the persisted shingle index: the membership
prefilter must be invisible in RESULTS (exact — a bloom has no false
negatives, and false positives are removed by the postings join) while
changing the PHYSICAL shape: batch shingles provably absent from the
index skip the join, and a fully-novel batch reads zero index buckets.

Degradation contract: any hole in the sidecar (legacy index, missing
committed-gen partial, size-mismatched fold after a crashed refold)
disables the prefilter — never the correctness of the flags.
"""

from __future__ import annotations

import glob
import json
import os

from ariadne_dbt_spark.operators.dedup import (
    _BLOOM_FOLD_FILE,
    append_to_shingle_index,
    build_shingle_index,
    compact_shingle_index,
    delete_from_shingle_index,
    incremental_near_dup_flags,
    load_shingle_bloom,
)

CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"),
    (3, "red green blue cyan magenta yellow"),
]
#: exact dup of 1, near dup of 2 (11/13 shingles shared = 0.846 > 0.8), novel
BATCH = [
    (101, "alpha beta gamma delta epsilon zeta"),
    (102, "one two three four five six seven eight nine ten eleven twelve thirteen espresso"),
    (103, "totally unrelated fresh document text here"),
]


def _meta(idx):
    with open(os.path.join(idx, "meta.json")) as f:
        return json.load(f)


def _flags_map(df):
    return {
        r["id"]: (r["is_dup"], r["n_dups"], r["max_jaccard"])
        for r in df.collect()
    }


def test_flags_parity_bloom_vs_dataframe_path(spark, tmp_path):
    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    assert load_shingle_bloom(idx, _meta(idx)) is not None

    batch = spark.createDataFrame(BATCH, "doc_id bigint, text string")
    via_index = _flags_map(
        incremental_near_dup_flags(
            None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        )
    )
    via_df = _flags_map(
        incremental_near_dup_flags(
            docs, batch, "doc_id", "text", n=3, threshold=0.8
        )
    )
    assert via_index == via_df
    assert via_index[101][0] and via_index[102][0] and not via_index[103][0]


def test_append_writes_partial_and_new_docs_match(spark, tmp_path):
    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    new = spark.createDataFrame(
        [(4, "lorem ipsum dolor sit amet consectetur")],
        "doc_id bigint, text string",
    )
    append_to_shingle_index(new, idx, "doc_id", "text")
    meta = _meta(idx)
    assert os.path.exists(os.path.join(idx, f"_bloom_gen{meta['gen']}.bin"))
    assert load_shingle_bloom(idx, meta) is not None
    probe = spark.createDataFrame(
        [(99, "lorem ipsum dolor sit amet consectetur")],
        "doc_id bigint, text string",
    )
    flags = _flags_map(
        incremental_near_dup_flags(
            None, probe, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        )
    )
    assert flags[99][0] is True


def test_missing_committed_partial_disables_prefilter_not_results(
    spark, tmp_path
):
    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    new = spark.createDataFrame(
        [(4, "lorem ipsum dolor sit amet consectetur")],
        "doc_id bigint, text string",
    )
    append_to_shingle_index(new, idx, "doc_id", "text")
    meta = _meta(idx)
    os.remove(os.path.join(idx, f"_bloom_gen{meta['gen']}.bin"))
    # a committed gen with no partial would mean possible false
    # negatives — the loader must refuse, and the flags fall back to
    # the full (still-correct) join
    assert load_shingle_bloom(idx, meta) is None
    probe = spark.createDataFrame(
        [(99, "lorem ipsum dolor sit amet consectetur")],
        "doc_id bigint, text string",
    )
    flags = _flags_map(
        incremental_near_dup_flags(
            None, probe, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        )
    )
    assert flags[99][0] is True


def test_size_mismatched_fold_disables_prefilter(spark, tmp_path):
    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    # crash window: fold file replaced for a resized refold, meta write
    # never happened → byte length disagrees with meta's m
    with open(os.path.join(idx, _BLOOM_FOLD_FILE), "wb") as f:
        f.write(b"\xff" * 3)
    assert load_shingle_bloom(idx, _meta(idx)) is None
    batch = spark.createDataFrame(BATCH, "doc_id bigint, text string")
    flags = _flags_map(
        incremental_near_dup_flags(
            None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        )
    )
    assert flags[101][0] and flags[102][0] and not flags[103][0]


def test_legacy_index_without_bloom_meta_still_flags(spark, tmp_path):
    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    meta = _meta(idx)
    meta.pop("bloom")
    with open(os.path.join(idx, "meta.json"), "w") as f:
        json.dump(meta, f)
    os.remove(os.path.join(idx, _BLOOM_FOLD_FILE))
    assert load_shingle_bloom(idx, _meta(idx)) is None
    batch = spark.createDataFrame(BATCH, "doc_id bigint, text string")
    flags = _flags_map(
        incremental_near_dup_flags(
            None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        )
    )
    assert flags[101][0] and flags[102][0] and not flags[103][0]


def test_compaction_refolds_resizes_and_retires_partials(spark, tmp_path):
    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    new = spark.createDataFrame(
        [(4, "lorem ipsum dolor sit amet consectetur")],
        "doc_id bigint, text string",
    )
    append_to_shingle_index(new, idx, "doc_id", "text")
    delete_from_shingle_index(spark, idx, [1])
    compact_shingle_index(spark, idx)

    meta = _meta(idx)
    assert meta["bloom"]["fold_gen"] == meta["gen"]
    assert glob.glob(os.path.join(idx, "_bloom_gen*.bin")) == []
    assert load_shingle_bloom(idx, meta) is not None

    # deleted doc's shingles left the fold (and the postings): its
    # clone no longer matches; the appended doc still does
    probes = spark.createDataFrame(
        [(90, CORPUS[0][1]), (91, "lorem ipsum dolor sit amet consectetur")],
        "doc_id bigint, text string",
    )
    flags = _flags_map(
        incremental_near_dup_flags(
            None, probes, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        )
    )
    assert flags[90][0] is False and flags[91][0] is True


def test_maintenance_report_bloom_health(spark, tmp_path):
    from ariadne_dbt_spark.operators.dedup import shingle_maintenance_report

    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    rep = shingle_maintenance_report(idx)
    assert rep["bloom"]["prefilter_active"] is True
    assert rep["bloom"]["fpp_estimate"] <= 0.04
    assert not any("bloom" in r for r in rep["reasons"])

    # a committed gen losing its partial degrades the prefilter — the
    # report must notice and ask for the refolding compaction
    new = spark.createDataFrame(
        [(4, "lorem ipsum dolor sit amet consectetur")],
        "doc_id bigint, text string",
    )
    append_to_shingle_index(new, idx, "doc_id", "text")
    os.remove(os.path.join(idx, f"_bloom_gen{_meta(idx)['gen']}.bin"))
    rep = shingle_maintenance_report(idx)
    assert rep["bloom"]["prefilter_active"] is False
    assert rep["should_compact"] is True
    compact_shingle_index(spark, idx)
    rep = shingle_maintenance_report(idx)
    assert rep["bloom"]["prefilter_active"] is True
    assert not any("bloom" in r for r in rep["reasons"])


def test_maintenance_report_fires_on_fpp_degradation(spark, tmp_path):
    from ariadne_dbt_spark.operators.dedup import shingle_maintenance_report

    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS[:1], "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    # the fold was sized for one doc's shingles; a 100x append saturates
    # it (appends share the fold's (m, k) by design — resizing happens
    # at compaction, which is exactly what the signal must demand)
    big = spark.createDataFrame(
        [(100 + i, f"novel w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(100)],
        "doc_id bigint, text string",
    )
    append_to_shingle_index(big, idx, "doc_id", "text")
    rep = shingle_maintenance_report(idx)
    assert rep["bloom"]["fpp_estimate"] > 0.04
    assert rep["should_compact"] is True
    assert any("outgrew" in r for r in rep["reasons"])
    compact_shingle_index(spark, idx)
    rep = shingle_maintenance_report(idx)
    # refolded at the grown corpus size: back inside the target regime
    assert rep["bloom"]["fpp_estimate"] <= 0.04
    assert rep["bloom"]["prefilter_active"] is True


def test_bitmap_cap_disables_sidecar_past_broadcast_regime(
    spark, tmp_path, monkeypatch
):
    """Corpora whose sized bitmap exceeds the broadcast cap get no
    sidecar at build, and a compaction retires an existing one when the
    corpus outgrows the cap — flags stay correct either way."""
    from ariadne_dbt_spark.operators import dedup as dedup_mod

    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")

    monkeypatch.setattr(dedup_mod, "SHINGLE_BLOOM_MAX_BYTES", 8)
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    assert "bloom" not in _meta(idx)
    assert not os.path.exists(os.path.join(idx, _BLOOM_FOLD_FILE))
    batch = spark.createDataFrame(BATCH, "doc_id bigint, text string")
    flags = _flags_map(
        incremental_near_dup_flags(
            None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
        )
    )
    assert flags[101][0] and flags[102][0] and not flags[103][0]
    monkeypatch.undo()

    # build under the normal cap, then lower it and compact: the refold
    # retires the now-over-cap sidecar instead of rebuilding it
    idx2 = str(tmp_path / "shidx2")
    build_shingle_index(docs, idx2, "doc_id", "text", n=3)
    assert "bloom" in _meta(idx2)
    monkeypatch.setattr(dedup_mod, "SHINGLE_BLOOM_MAX_BYTES", 8)
    compact_shingle_index(spark, idx2)
    assert "bloom" not in _meta(idx2)
    assert not os.path.exists(os.path.join(idx2, _BLOOM_FOLD_FILE))
    flags = _flags_map(
        incremental_near_dup_flags(
            None, batch, "doc_id", "text", n=3, threshold=0.8, index_dir=idx2
        )
    )
    assert flags[101][0] and flags[102][0] and not flags[103][0]


def test_fully_novel_batch_reads_zero_buckets(spark, tmp_path):
    """A batch with no shingle in the index must prune the bucket
    IN-list to empty — the plan's stored side collapses to
    ``WHERE false`` and the index is never read."""
    idx = str(tmp_path / "shidx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    build_shingle_index(docs, idx, "doc_id", "text", n=3)
    novel = spark.createDataFrame(
        [(103, "totally unrelated fresh document text here")],
        "doc_id bigint, text string",
    )
    out = incremental_near_dup_flags(
        None, novel, "doc_id", "text", n=3, threshold=0.8, index_dir=idx
    )
    assert _flags_map(out)[103][0] is False
    # the pruned-empty scan shows up as a LocalTableScan / empty
    # relation, not a parquet read of the postings dirs
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "postings" not in plan
