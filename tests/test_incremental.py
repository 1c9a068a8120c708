"""Incremental hash-delta reindex: ``AriadneIndex.refresh`` must equal a
from-scratch ``build()`` on the new manifest while re-tokenizing only the
models whose search-doc content actually changed (the reference's README
roadmap defers incremental indexing to v1.0; v0.1 is full replace —
reference: indexer.py:90-98)."""

from __future__ import annotations

import json

import pytest

from ariadne_dbt_spark.ingest.indexer import AriadneIndex

from conftest import MANIFEST


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _assert_same_index(a: AriadneIndex, b: AriadneIndex) -> None:
    assert _rows(a.postings, ["unique_id", "field", "term", "tf"]) == _rows(
        b.postings, ["unique_id", "field", "term", "tf"]
    )
    assert _rows(a.docstats, ["unique_id", "field", "dl"]) == _rows(
        b.docstats, ["unique_id", "field", "dl"]
    )
    mcols = ["unique_id", "name", "description", "upstream_count", "downstream_count", "centrality"]
    assert _rows(a.models, mcols) == _rows(b.models, mcols)
    ccols = ["model_id", "name", "is_primary_key", "is_foreign_key"]
    assert _rows(a.columns, ccols) == _rows(b.columns, ccols)
    assert _rows(a.edges, ["parent_id", "child_id"]) == _rows(b.edges, ["parent_id", "child_id"])


@pytest.fixture()
def manifest_dict():
    with open(MANIFEST) as f:
        return json.load(f)


def _write(tmp_path, man: dict) -> str:
    p = tmp_path / "manifest.json"
    p.write_text(json.dumps(man))
    return str(p)


def _model_key(man: dict, name: str) -> str:
    (key,) = [k for k, n in man["nodes"].items() if n.get("name") == name]
    return key


def test_refresh_noop_reuses_everything(spark, index):
    new = index.refresh(MANIFEST)
    assert new.last_refresh_stats == {"changed": 0, "reused": 5, "removed": 0}
    _assert_same_index(new, index)


def test_refresh_modified_description(spark, index, manifest_dict, tmp_path):
    man = manifest_dict
    man["nodes"][_model_key(man, "fct_orders")]["description"] = "order facts with NEW grain"
    path = _write(tmp_path, man)

    new = index.refresh(path)
    assert new.last_refresh_stats["changed"] == 1
    assert new.last_refresh_stats["reused"] == 4
    _assert_same_index(new, AriadneIndex.build(spark, path))
    # the new term is searchable through the refreshed index
    terms = {r["term"] for r in new.postings.where("unique_id like '%fct_orders'").collect()}
    assert "grain" in terms


def test_refresh_removed_model(spark, index, manifest_dict, tmp_path):
    man = manifest_dict
    key = _model_key(man, "dim_customers")
    del man["nodes"][key]
    man["parent_map"].pop(key, None)
    for k in list(man["parent_map"]):
        man["parent_map"][k] = [p for p in man["parent_map"][k] if p != key]
    path = _write(tmp_path, man)

    new = index.refresh(path)
    assert new.last_refresh_stats["removed"] == 1
    assert new.postings.where(f"unique_id = '{key}'").count() == 0
    _assert_same_index(new, AriadneIndex.build(spark, path))


def test_refresh_added_model(spark, index, manifest_dict, tmp_path):
    man = manifest_dict
    tmpl = man["nodes"][_model_key(man, "fct_orders")]
    added = dict(tmpl)
    added["name"] = "fct_refunds"
    added["unique_id"] = "model.jaffle_shop.fct_refunds"
    added["description"] = "refund facts"
    man["nodes"]["model.jaffle_shop.fct_refunds"] = added
    man["parent_map"]["model.jaffle_shop.fct_refunds"] = [_model_key(man, "stg_payments")]
    path = _write(tmp_path, man)

    new = index.refresh(path)
    assert new.last_refresh_stats["changed"] == 1  # the added model
    assert new.last_refresh_stats["removed"] == 0
    _assert_same_index(new, AriadneIndex.build(spark, path))


def test_refresh_after_save_load_roundtrip(spark, index, tmp_path):
    """A saved/loaded index must refresh as a no-op on the same manifest:
    parquet does not preserve column row order, so the doc signature has
    to be order-insensitive (postings are a bag of terms)."""
    out = str(tmp_path / "idx")
    index.save(out)
    loaded = AriadneIndex.load(spark, out)
    new = loaded.refresh(MANIFEST)
    assert new.last_refresh_stats == {"changed": 0, "reused": 5, "removed": 0}
    _assert_same_index(new, index)


def test_refresh_does_not_mutate_source_index(spark, index):
    before = _rows(index.postings, ["unique_id", "field", "term", "tf"])
    index.refresh(MANIFEST)
    assert _rows(index.postings, ["unique_id", "field", "term", "tf"]) == before


def test_refresh_distributed_path_parity(spark, manifest_dict, tmp_path):
    """Force the distributed branch (local_build_max_models=0) and check
    it produces the same index as the local branch."""
    from ariadne_dbt_spark.config import EngineConfig

    cfg = EngineConfig(local_build_max_models=0)
    base = AriadneIndex.build(spark, MANIFEST, config=cfg)

    man = manifest_dict
    man["nodes"][_model_key(man, "stg_orders")]["description"] = "staged orders v2"
    path = _write(tmp_path, man)

    new = base.refresh(path)
    assert new.last_refresh_stats["changed"] == 1
    _assert_same_index(new, AriadneIndex.build(spark, path))


def test_refresh_random_edit_sets_match_full_rebuild(spark, manifest_dict, tmp_path):
    """Property check over edit combinations: any subset of models
    edited (description and/or added column) must refresh to exactly the
    from-scratch index, with changed == |edited subset|."""
    import itertools

    base = AriadneIndex.build(spark, MANIFEST)
    names = sorted(
        n["name"] for n in manifest_dict["nodes"].values()
        if n.get("resource_type") == "model"
    )
    # all 1- and 2-model subsets plus the full set — 16 cases, local path
    cases = (
        [(n,) for n in names]
        + list(itertools.combinations(names, 2))
        + [tuple(names)]
    )
    for i, subset in enumerate(cases):
        man = json.loads(json.dumps(manifest_dict))
        for name in subset:
            node = man["nodes"][_model_key(man, name)]
            node["description"] = f"edited {i} {name}"
            node.setdefault("columns", {})[f"extra_{i}"] = {
                "name": f"extra_{i}", "description": "", "data_type": "int"
            }
        path = _write(tmp_path, man)
        new = base.refresh(path)
        assert new.last_refresh_stats["changed"] == len(subset), subset
        _assert_same_index(new, AriadneIndex.build(spark, path))


def test_manifest_delta_parse_only(spark, index, manifest_dict, tmp_path):
    man = manifest_dict
    man["nodes"][_model_key(man, "stg_orders")]["description"] = "delta probe"
    path = _write(tmp_path, man)
    delta = index.manifest_delta(path)
    assert delta == {
        "changed": ["model.webshop.stg_orders"], "added": [], "removed": [],
    }
    assert index.manifest_delta(MANIFEST) == {
        "changed": [], "added": [], "removed": [],
    }
