"""Synthetic N-model manifest generator for perf tests (the reference's
benchmark workload is a 500-model manifest — BASELINE.md).

Shape: S sources → S staging models → I intermediate → M marts, a
deterministic DAG with realistic fan-in, descriptions, columns, tags,
and tests sprinkled at fixed ratios. Seedless: everything derives from
the index, so two runs produce identical manifests.
"""

from __future__ import annotations

WORDS = (
    "revenue orders customers payments sessions events products churn margin"
    " retention invoices shipments returns inventory suppliers campaigns clicks"
).split()


def make_manifest(n_models: int = 500, project: str = "bigshop") -> dict:
    n_staging = max(n_models // 2, 1)
    n_inter = max(n_models // 4, 1)
    n_marts = n_models - n_staging - n_inter
    nodes, sources, parent_map = {}, {}, {}

    def word(i):
        return WORDS[i % len(WORDS)]

    for i in range(n_staging):
        suid = f"source.{project}.raw.tbl_{i}"
        sources[suid] = {
            "unique_id": suid, "resource_type": "source", "name": f"tbl_{i}",
            "source_name": "raw", "schema": "raw", "database": "dev",
            "identifier": f"tbl_{i}", "loader": "parquet",
            "description": f"raw {word(i)} table", "columns": {}, "meta": {},
            "tags": [], "fqn": [project, "raw", f"tbl_{i}"],
        }

    def model(name, layer_dir, deps, i, mat="view"):
        uid = f"model.{project}.{name}"
        cols = {
            c: {"name": c, "data_type": t, "description": f"{c} column"}
            for c, t in (
                (f"{word(i)}_id", "bigint"),
                (f"{word(i + 1)}_amount", "double"),
                ("updated_at", "timestamp"),
                ("status", "varchar"),
            )
        }
        nodes[uid] = {
            "unique_id": uid, "resource_type": "model", "name": name,
            "package_name": project, "database": "dev", "schema": "analytics",
            "alias": name, "path": f"{layer_dir}/{name}.sql",
            "original_file_path": f"models/{layer_dir}/{name}.sql",
            "fqn": [project, layer_dir, name],
            "raw_code": f"select {word(i)}_id, sum({word(i + 1)}_amount) as total_{word(i + 1)}"
                        f" from somewhere group by 1 -- {name}",
            "language": "sql",
            "description": f"{layer_dir} model for {word(i)} {word(i + 2)} analysis",
            "tags": [layer_dir, word(i)],
            "meta": {}, "config": {"materialized": mat, "tags": [layer_dir]},
            "depends_on": {"nodes": deps, "macros": []},
            "refs": [{"name": d.split(".")[-1]} for d in deps if d.startswith("model.")],
            "sources": [["raw", d.split(".")[-1]] for d in deps if d.startswith("source.")],
            "columns": cols,
        }
        parent_map[uid] = deps
        return uid

    stg = [
        model(f"stg_{word(i)}_{i}", "staging", [f"source.{project}.raw.tbl_{i}"], i)
        for i in range(n_staging)
    ]
    inter = [
        model(
            f"int_{word(i)}_{i}", "intermediate",
            [stg[(2 * i) % n_staging], stg[(2 * i + 1) % n_staging]], i,
        )
        for i in range(n_inter)
    ]
    marts = [
        model(
            f"fct_{word(i)}_{i}" if i % 2 else f"dim_{word(i)}_{i}", "marts",
            [inter[i % n_inter], inter[(i + 3) % n_inter], stg[i % n_staging]], i,
            mat="table",
        )
        for i in range(n_marts)
    ]

    # tests on every 3rd mart's id column
    for j, uid in enumerate(marts):
        if j % 3:
            continue
        mname = uid.split(".")[-1]
        for ttype in ("unique", "not_null"):
            tuid = f"test.{project}.{ttype}_{mname}_id"
            col = next(iter(nodes[uid]["columns"]))
            nodes[tuid] = {
                "unique_id": tuid, "resource_type": "test", "name": f"{ttype}_{mname}_id",
                "package_name": project, "path": f"{ttype}_{mname}.sql",
                "original_file_path": "models/schema.yml", "fqn": [project],
                "raw_code": "", "language": "sql", "description": "", "tags": [],
                "meta": {}, "config": {"severity": "ERROR"},
                "depends_on": {"nodes": [uid], "macros": []}, "refs": [], "sources": [],
                "columns": {}, "column_name": col, "attached_node": uid,
                "test_metadata": {"name": ttype, "kwargs": {"column_name": col}},
            }
            parent_map[tuid] = [uid]

    child_map: dict[str, list[str]] = {}
    for child, parents in parent_map.items():
        for p in parents:
            child_map.setdefault(p, []).append(child)
    return {
        "metadata": {
            "project_name": project, "adapter_type": "spark",
            "dbt_version": "1.8.0", "generated_at": "2026-01-01T00:00:00Z",
        },
        "nodes": nodes, "sources": sources, "macros": {}, "exposures": {},
        "parent_map": parent_map, "child_map": child_map,
    }


if __name__ == "__main__":
    import json
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/big_manifest.json"
    with open(out, "w") as f:
        json.dump(make_manifest(n), f)
    print(out)
