"""Markdown doc generation (SURVEY §2.1 S7).

Reference behavior (src/ariadne_dbt/generator.py:38-133): Jinja-render
project docs (agent context file, DAG summary) from pattern-extraction
aggregates; an existing user memory file is never overwritten.

The Spark queries produce the aggregates; rendering is driver-side Jinja
over collect()ed KB-sized results — same shape as the reference.
"""

from __future__ import annotations

import os

from ariadne_dbt_spark.ingest.indexer import AriadneIndex
from ariadne_dbt_spark.operators.lineage import high_centrality_models

try:
    import jinja2

    _HAS_JINJA = True
except ImportError:  # pragma: no cover
    _HAS_JINJA = False

_PROJECT_TMPL = """# {{ project_name }} — dbt project context

Adapter: {{ adapter }} · Models: {{ stats.models }} · Sources: {{ stats.sources }} · \
Tests: {{ stats.tests }} · Exposures: {{ stats.exposures }}

## Layers
{% for layer, n in models_per_layer.items() | sort -%}
- **{{ layer }}**: {{ n }} models (materialized: {{ materializations.get(layer, 'view') }}, \
naming: `{{ naming.get(layer, '?') }}_*`, example: `{{ examples.get(layer, '-') }}`, \
column test coverage: {{ coverage.get(layer, 0) }}%)
{% endfor %}
## Key models (by DAG centrality)
{% for m in key_models -%}
- `{{ m.name }}` ({{ m.layer }}) — {{ m.upstream_count }} upstream / {{ m.downstream_count }} downstream
{% endfor %}
{% if top_tags -%}
## Common tags
{{ top_tags | map('first') | map('string') | join(', ') }}
{% endif -%}
"""

_DAG_TMPL = """# DAG summary — {{ project_name }}

{{ n_edges }} edges across {{ stats.models }} models, {{ stats.sources }} sources, \
{{ stats.exposures }} exposures.

{% for e in edges -%}
- `{{ e.parent_id }}` → `{{ e.child_id }}`
{% endfor -%}
"""

# agent-context file (reference file set: .claude/CLAUDE.md,
# generator.py:65-130 — content below is our own wording)
_CLAUDE_TMPL = """# Working in {{ project_name }} (dbt project)

This project has {{ stats.models }} models across layers \
{{ models_per_layer.keys() | sort | join(', ') }} ({{ stats.sources }} sources, \
{{ stats.tests }} tests, {{ stats.exposures }} exposures; adapter: {{ adapter }}).

## Conventions
{% for layer, n in models_per_layer.items() | sort -%}
- {{ layer }}: {{ n }} models, prefix `{{ naming.get(layer, '?') }}_`, \
materialized as {{ materializations.get(layer, 'view') }}
{% endfor %}
## Start here
{% for m in key_models -%}
- `{{ m.name }}` ({{ m.layer }}): {{ m.downstream_count }} downstream dependents
{% endfor %}
Use the engine's search/lineage/capsule tools before reading raw SQL files.
"""

_SKILL_NEW_MODEL_TMPL = """# Skill: add a new model to {{ project_name }}

1. Pick the layer ({{ models_per_layer.keys() | sort | join(' / ') }}) and follow \
its naming prefix.
2. Mirror an existing example model{% if example %}: `{{ example }}`{% endif %}.
3. Declare sources/refs so lineage stays connected.
4. Add schema tests — project convention is \
{{ coverage_overall }}% column test coverage.
"""

_SKILL_DEBUG_TEST_TMPL = """# Skill: debug a failing dbt test in {{ project_name }}

1. Identify the test type (not_null / unique / accepted_values / relationships).
2. Trace the model's upstream lineage before editing SQL.
3. Re-run the single test, then its model's full test set \
({{ stats.tests }} tests exist project-wide).
"""

_RULES_TMPL = """# {{ project_name }} assistant rules

- {{ stats.models }} models; follow layer naming \
({% for layer, p in naming.items() | sort %}{{ layer }}: `{{ p }}_*` {% endfor %}).
- Query the metadata engine for search/lineage instead of scanning files.
- Keep schema tests green; coverage target {{ coverage_overall }}%.
"""


class DocsGenerator:
    def __init__(self, index: AriadneIndex):
        if not _HAS_JINJA:
            raise RuntimeError("jinja2 required for doc generation")
        self.index = index
        self.env = jinja2.Environment()
        self._key_models = None

    def _patterns(self) -> dict:
        # index.patterns() memoizes extract_patterns per build — the
        # generator renders several files from the same bundle, and a
        # fresh extraction per render multiplied the whole pattern-query
        # fan-out by the number of templates
        return self.index.patterns()

    def _keys(self):
        if self._key_models is None:
            self._key_models = high_centrality_models(self.index, limit=5).collect()
        return self._key_models

    def _meta(self) -> dict:
        return {r.key: r.value for r in self.index.index_metadata.collect()}

    def render_project_summary(self) -> str:
        pat = self._patterns()
        meta = self._meta()
        key_models = self._keys()
        return self.env.from_string(_PROJECT_TMPL).render(
            project_name=meta.get("project_name", "project"),
            adapter=meta.get("adapter_type", "spark"),
            stats=pat["stats"],
            models_per_layer=pat["models_per_layer"],
            materializations=pat["materializations"],
            naming=pat["naming"],
            examples=pat["examples"],
            coverage=pat["coverage"],
            key_models=key_models,
            top_tags=pat["top_tags"],
        )

    def render_dag_summary(self, *, max_edges: int = 200) -> str:
        meta = self._meta()
        pat = self._patterns()
        edges = (
            self.index.edges.orderBy("parent_id", "child_id").limit(max_edges).collect()
        )
        return self.env.from_string(_DAG_TMPL).render(
            project_name=meta.get("project_name", "project"),
            stats=pat["stats"],
            n_edges=self.index.edges.count(),
            edges=edges,
        )

    def _full_ctx(self) -> dict:
        pat = self._patterns()
        meta = self._meta()
        key_models = self._keys()
        cov = pat["coverage"]
        overall = round(sum(cov.values()) / len(cov), 1) if cov else 0.0
        return {
            "project_name": meta.get("project_name", "project"),
            "adapter": meta.get("adapter_type", "spark"),
            "stats": pat["stats"],
            "models_per_layer": pat["models_per_layer"],
            "materializations": pat["materializations"],
            "naming": pat["naming"],
            "examples": pat["examples"],
            "coverage": cov,
            "coverage_overall": overall,
            "key_models": key_models,
            "example": pat["examples"].get("staging") or pat["examples"].get("marts"),
        }

    def generate_all(
        self, project_root: str, targets: list[str] | None = None
    ) -> list[str]:
        """Write the reference's full generated-file set (reference:
        generator.py:38-130): .claude/{CLAUDE.md, memory.md,
        skills/new_model.md, skills/debug_test.md, context/dag_summary.md},
        .cursor/rules/ariadne.mdc, .windsurf/rules/ariadne.md. memory.md
        is never overwritten."""
        targets = targets or ["claude_code"]
        ctx = self._full_ctx()
        written: list[str] = []

        def emit(relpath: str, content: str, *, skip_existing: bool = False):
            path = os.path.join(project_root, relpath)
            if skip_existing and os.path.exists(path):
                return
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                f.write(content)
            written.append(path)

        if "claude_code" in targets:
            emit(".claude/CLAUDE.md", self.env.from_string(_CLAUDE_TMPL).render(**ctx))
            emit(
                ".claude/memory.md",
                f"# Project memory — {ctx['project_name']}\n\n"
                "(notes preserved across reindex)\n",
                skip_existing=True,
            )
            emit(
                ".claude/skills/new_model.md",
                self.env.from_string(_SKILL_NEW_MODEL_TMPL).render(**ctx),
            )
            emit(
                ".claude/skills/debug_test.md",
                self.env.from_string(_SKILL_DEBUG_TEST_TMPL).render(**ctx),
            )
            emit(".claude/context/dag_summary.md", self.render_dag_summary())
        if "cursor" in targets:
            emit(".cursor/rules/ariadne.mdc", self.env.from_string(_RULES_TMPL).render(**ctx))
        if "windsurf" in targets:
            emit(".windsurf/rules/ariadne.md", self.env.from_string(_RULES_TMPL).render(**ctx))
        return written

    def write_docs(self, out_dir: str, *, memory_filename: str = "memory.md") -> list[str]:
        """Write project docs; an existing memory file is preserved
        (reference: tests/test_generator.py memory-not-overwritten)."""
        os.makedirs(out_dir, exist_ok=True)
        written = []
        for fname, content in (
            ("project_context.md", self.render_project_summary()),
            ("dag_summary.md", self.render_dag_summary()),
        ):
            path = os.path.join(out_dir, fname)
            with open(path, "w") as f:
                f.write(content)
            written.append(path)
        mem = os.path.join(out_dir, memory_filename)
        if not os.path.exists(mem):
            with open(mem, "w") as f:
                f.write("# Project memory\n\n(notes preserved across reindex)\n")
            written.append(mem)
        return written
