"""dbt manifest.json parsing → row dicts (SURVEY §2.1 S1, §3.1 step 2).

Schema-tolerant field access mirrors the reference's behavior
(reference: src/ariadne_dbt/indexer.py:178-321): every field read with
defaults, `raw_code` falling back to legacy `raw_sql`, refs accepted as
dict/list/str, the nodes *map* pivoted into rows. Layer classification
(indexer.py:22-36) and test classification (indexer.py:238-260) are
keyword heuristics over fqn/name/tags and test_metadata.

Parsing runs on the driver — a manifest is ONE json document (≤75 MB at
the reference's scale envelope), so `json.load` + list comprehension
beats a distributed read; the resulting row lists become DataFrames with
explicit schemas in indexer.py. For multi-project fleets (thousands of
manifests) the same functions are reusable inside mapInPandas over a
DataFrame of manifest paths.
"""

from __future__ import annotations

import json
from typing import Any

STAGING_KEYS = ("staging", "stg")
INTERMEDIATE_KEYS = ("intermediate", "int")
MART_KEYS = ("marts", "mart", "fct", "dim")

KNOWN_TEST_TYPES = ("not_null", "unique", "accepted_values", "relationships")


def classify_layer(name: str, fqn: list[str], tags: list[str]) -> str:
    """staging | intermediate | marts | other from fqn/name/tag keywords."""
    probes = [p.lower() for p in fqn[:-1]] + [t.lower() for t in tags]
    name_l = (name or "").lower()
    if name_l.startswith("stg_") or any(k in probes for k in STAGING_KEYS):
        return "staging"
    if name_l.startswith("int_") or any(k in probes for k in INTERMEDIATE_KEYS):
        return "intermediate"
    if (
        name_l.startswith(("fct_", "dim_", "fact_"))
        or any(k in probes for k in MART_KEYS)
    ):
        return "marts"
    return "other"


def classify_test(node: dict) -> str:
    meta = node.get("test_metadata") or {}
    tname = (meta.get("name") or "").lower()
    if tname in KNOWN_TEST_TYPES:
        return tname
    if not meta and (node.get("raw_code") or node.get("raw_sql")):
        return "singular"
    return "generic"


def _as_str_map(d: Any) -> dict[str, str]:
    if not isinstance(d, dict):
        return {}
    return {
        str(k): v if isinstance(v, str) else json.dumps(v, sort_keys=True)
        for k, v in d.items()
    }


def _refs_to_names(refs: Any) -> list[str]:
    out = []
    for r in refs or []:
        if isinstance(r, dict):
            n = r.get("name")
        elif isinstance(r, (list, tuple)):
            n = r[-1] if r else None
        else:
            n = r
        if n:
            out.append(str(n))
    return out


def load_manifest(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def parse_models(manifest: dict) -> list[dict]:
    rows = []
    for uid, n in (manifest.get("nodes") or {}).items():
        if n.get("resource_type") != "model":
            continue
        fqn = [str(x) for x in n.get("fqn") or []]
        tags = [str(t) for t in n.get("tags") or []]
        config = n.get("config") or {}
        rows.append({
            "unique_id": uid,
            "name": n.get("name") or "",
            "fqn": fqn,
            "package_name": n.get("package_name") or "",
            "database": n.get("database") or "",
            "db_schema": n.get("schema") or "",
            "alias": n.get("alias") or n.get("name") or "",
            "file_path": n.get("original_file_path") or n.get("path") or "",
            "raw_code": n.get("raw_code") or n.get("raw_sql") or "",
            "compiled_code": n.get("compiled_code") or n.get("compiled_sql") or "",
            "language": n.get("language") or "sql",
            "description": n.get("description") or "",
            "layer": classify_layer(n.get("name") or "", fqn, tags),
            "materialization": str(config.get("materialized") or "view"),
            "tags": tags,
            "meta": _as_str_map(n.get("meta")),
            "config": _as_str_map(config),
            "depends_on_nodes": [str(x) for x in (n.get("depends_on") or {}).get("nodes") or []],
            "refs": _refs_to_names(n.get("refs")),
            "sources": [".".join(map(str, s)) for s in n.get("sources") or []],
            "row_count": None,
            "bytes": None,
            "last_modified": None,
            "upstream_count": 0,
            "downstream_count": 0,
            "centrality": 0.0,
        })
    return rows


def parse_columns(manifest: dict) -> list[dict]:
    rows = []
    for uid, n in (manifest.get("nodes") or {}).items():
        if n.get("resource_type") != "model":
            continue
        for cname, c in (n.get("columns") or {}).items():
            rows.append({
                "model_id": uid,
                "name": c.get("name") or cname,
                "data_type": c.get("data_type") or "",
                "description": c.get("description") or "",
                "meta": _as_str_map(c.get("meta")),
                "tags": [str(t) for t in c.get("tags") or []],
                "is_primary_key": False,
                "is_foreign_key": False,
            })
    return rows


def parse_sources(manifest: dict) -> tuple[list[dict], list[dict]]:
    rows, col_rows = [], []
    for uid, s in (manifest.get("sources") or {}).items():
        fresh = s.get("freshness") or {}
        warn = fresh.get("warn_after") or {}
        err = fresh.get("error_after") or {}
        rows.append({
            "unique_id": uid,
            "name": s.get("name") or "",
            "source_name": s.get("source_name") or "",
            "schema_name": s.get("schema") or "",
            "database": s.get("database") or "",
            "identifier": s.get("identifier") or s.get("name") or "",
            "description": s.get("description") or "",
            "loader": s.get("loader") or "",
            "freshness_warn_count": warn.get("count"),
            "freshness_warn_period": warn.get("period"),
            "freshness_error_count": err.get("count"),
            "freshness_error_period": err.get("period"),
            "tags": [str(t) for t in s.get("tags") or []],
            "meta": _as_str_map(s.get("meta")),
        })
        for cname, c in (s.get("columns") or {}).items():
            col_rows.append({
                "source_id": uid,
                "name": c.get("name") or cname,
                "data_type": c.get("data_type") or "",
                "description": c.get("description") or "",
            })
    return rows, col_rows


def parse_tests(manifest: dict) -> list[dict]:
    rows = []
    for uid, n in (manifest.get("nodes") or {}).items():
        if n.get("resource_type") != "test":
            continue
        deps = [str(x) for x in (n.get("depends_on") or {}).get("nodes") or []]
        model_id = n.get("attached_node") or next(
            (d for d in deps if d.startswith("model.")), ""
        )
        meta = n.get("test_metadata") or {}
        kwargs = meta.get("kwargs") or {}
        rows.append({
            "unique_id": uid,
            "name": n.get("name") or "",
            "test_type": classify_test(n),
            "model_id": model_id,
            "column_name": n.get("column_name") or kwargs.get("column_name") or "",
            "depends_on": deps,
            "severity": str((n.get("config") or {}).get("severity") or "ERROR"),
            "test_kwargs": json.dumps(kwargs, sort_keys=True),
            "last_status": None,
            "last_execution_time": None,
            "last_failures": None,
        })
    return rows


def parse_macros(manifest: dict) -> list[dict]:
    rows = []
    for uid, m in (manifest.get("macros") or {}).items():
        rows.append({
            "unique_id": uid,
            "name": m.get("name") or "",
            "package_name": m.get("package_name") or "",
            "file_path": m.get("original_file_path") or m.get("path") or "",
            "description": m.get("description") or "",
            "arguments": [
                json.dumps(a, sort_keys=True) if isinstance(a, dict) else str(a)
                for a in m.get("arguments") or []
            ],
            "macro_sql": m.get("macro_sql") or "",
        })
    return rows


def parse_exposures(manifest: dict) -> list[dict]:
    rows = []
    for uid, e in (manifest.get("exposures") or {}).items():
        owner = e.get("owner") or {}
        rows.append({
            "unique_id": uid,
            "name": e.get("name") or "",
            "label": e.get("label") or "",
            "exposure_type": e.get("type") or "",
            "url": e.get("url") or "",
            "description": e.get("description") or "",
            "owner_name": owner.get("name") or "",
            "owner_email": owner.get("email") or "",
            "depends_on": [str(x) for x in (e.get("depends_on") or {}).get("nodes") or []],
            "tags": [str(t) for t in e.get("tags") or []],
        })
    return rows


def parse_edges(manifest: dict) -> list[dict]:
    """DAG edges from parent_map (reference: indexer.py:447-456): parents
    restricted to model./source., children to model./exposure. — tests
    hang off models via model_id, not the DAG."""
    rows = []
    seen = set()
    for child, parents in (manifest.get("parent_map") or {}).items():
        if not child.startswith(("model.", "exposure.")):
            continue
        for parent in parents or []:
            if not str(parent).startswith(("model.", "source.")):
                continue
            key = (str(parent), child)
            if key in seen:
                continue
            seen.add(key)
            rows.append({"parent_id": str(parent), "child_id": child})
    return rows


def parse_metadata(manifest: dict) -> list[dict]:
    md = manifest.get("metadata") or {}
    keep = ("project_name", "adapter_type", "dbt_version", "generated_at")
    return [{"key": k, "value": str(md.get(k) or "")} for k in keep]
