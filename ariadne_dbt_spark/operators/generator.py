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
from ariadne_dbt_spark.operators.patterns import extract_patterns

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


class DocsGenerator:
    def __init__(self, index: AriadneIndex):
        if not _HAS_JINJA:
            raise RuntimeError("jinja2 required for doc generation")
        self.index = index
        self.env = jinja2.Environment()

    def _meta(self) -> dict:
        return {r.key: r.value for r in self.index.index_metadata.collect()}

    def render_project_summary(self) -> str:
        pat = extract_patterns(self.index)
        meta = self._meta()
        key_models = high_centrality_models(self.index, limit=5).collect()
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
        pat = extract_patterns(self.index)
        edges = (
            self.index.edges.orderBy("parent_id", "child_id").limit(max_edges).collect()
        )
        return self.env.from_string(_DAG_TMPL).render(
            project_name=meta.get("project_name", "project"),
            stats=pat["stats"],
            n_edges=self.index.edges.count(),
            edges=edges,
        )

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
