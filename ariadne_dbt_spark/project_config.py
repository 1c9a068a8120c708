"""Project/config discovery (SURVEY §2.1 S9).

Reference behavior (src/ariadne_dbt/config.py:88-159): walk up from the
working directory for the engine's own config file (`ariadne.toml` there;
`ariadne_spark.toml` here) and for the dbt project root marked by
`dbt_project.yml`; artifact paths default to `target/` under the root.
Driver-side, no Spark involvement.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field

CONFIG_FILENAME = "ariadne_spark.toml"
DBT_PROJECT_MARKER = "dbt_project.yml"


@dataclass
class ProjectConfig:
    project_root: str | None = None
    manifest_path: str | None = None
    catalog_path: str | None = None
    run_results_path: str | None = None
    index_dir: str | None = None
    token_budget: int = 10_000
    max_pivots: int = 3
    extra: dict = field(default_factory=dict)


def find_upwards(filename: str, start: str | None = None) -> str | None:
    """Walk up from `start` (cwd) looking for `filename`."""
    d = os.path.abspath(start or os.getcwd())
    while True:
        cand = os.path.join(d, filename)
        if os.path.exists(cand):
            return cand
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent


def discover(start: str | None = None) -> ProjectConfig:
    """Resolve config file + dbt project root, with sensible artifact
    defaults under `<root>/target/`."""
    cfg = ProjectConfig()
    toml_path = find_upwards(CONFIG_FILENAME, start)
    if toml_path:
        with open(toml_path, "rb") as f:
            data = tomllib.load(f)
        eng = data.get("engine", data)
        cfg.manifest_path = eng.get("manifest_path")
        cfg.catalog_path = eng.get("catalog_path")
        cfg.run_results_path = eng.get("run_results_path")
        cfg.index_dir = eng.get("index_dir")
        cfg.token_budget = int(eng.get("token_budget", cfg.token_budget))
        cfg.max_pivots = int(eng.get("max_pivots", cfg.max_pivots))
        cfg.extra = {k: v for k, v in eng.items() if k not in vars(cfg)}
        cfg.project_root = os.path.dirname(toml_path)

    marker = find_upwards(DBT_PROJECT_MARKER, start)
    if marker:
        root = os.path.dirname(marker)
        cfg.project_root = cfg.project_root or root
        target = os.path.join(root, "target")
        cfg.manifest_path = cfg.manifest_path or os.path.join(target, "manifest.json")
        cfg.catalog_path = cfg.catalog_path or _opt(os.path.join(target, "catalog.json"))
        cfg.run_results_path = cfg.run_results_path or _opt(
            os.path.join(target, "run_results.json")
        )
    return cfg


def _opt(path: str) -> str | None:
    return path if os.path.exists(path) else None
