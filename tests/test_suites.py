"""Driver-window invariants: the WINDOW is exactly the driver's 50-entry
correctness budget, every §2 family keeps a covering entry, and the
suites' statically-declared member schemas match the live DataFrames
(the oracle SQL is generated from those declarations — drift would
surface as a confusing hash mismatch; fail loudly here instead)."""

from __future__ import annotations

import pytest

from ariadne_dbt_spark.workloads import REGISTRY, WINDOW, load_all
from ariadne_dbt_spark.workloads.suites import SUITES

SF_DIR = "/root/testdata/sf0.001"


def test_window_is_driver_sized_and_first():
    reg = load_all()
    assert len(WINDOW) == 50
    assert list(reg)[:50] == list(WINDOW)
    # every driver-visible entry must be oracle-checked (no rows-only)
    assert [n for n in WINDOW if reg[n].oracle is None] == []


def test_window_covers_every_survey_family():
    load_all()
    covered = set()
    for n in WINDOW:
        for tag in REGISTRY[n].survey.split(","):
            covered.add(tag.strip())
    # one representative per §2 family / LLM-pipeline component must be
    # inside the driver window (suites carry their members' survey tags)
    for family in [
        "S1", "S7", "J3", "C2", "T2", "T5", "G1", "G4", "A10", "P3", "P8",
        "dedup-exact", "dedup-minhash-lsh", "dedup-simhash", "dedup-ngram-jaccard",
        "similarity-bruteforce", "similarity-lsh", "dedup-embedding-cosine",
        "similarity-ivf", "dedup-clusters", "multimodal", "pii-redaction",
        "chunking", "sampling-stratified", "streaming-stateful", "antipatterns",
        "column_lineage", "rollup", "grouping-sets",
    ]:
        assert any(family in c for c in covered), f"{family} not covered in WINDOW"


def test_suite_member_schemas_match_declarations(spark):
    load_all()
    for suite, sections in SUITES.items():
        for tag, member, cols in sections:
            df = REGISTRY[member].fn(spark, SF_DIR)
            live = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            assert live == cols, f"{suite}/{tag} ({member}): {live} != declared {cols}"


@pytest.mark.parametrize("suite", sorted(SUITES))
def test_suite_runs_and_sections_nonempty(spark, suite):
    load_all()
    df = REGISTRY[suite].fn(spark, SF_DIR)
    got = {r["section"] for r in df.select("section").distinct().collect()}
    want = {tag for tag, _, _ in SUITES[suite]}
    assert got == want
