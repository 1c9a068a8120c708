"""Driver-local snapshot of the index for latency-critical serving.

The index tables are metadata-scale (≤10k models — reference scale
envelope, README.md:13); the reference serves them from an in-process
SQLite. A Spark job per lookup costs 50-300ms of scheduling alone, so
interactive tools (search → capsule → lineage) run against this
collected snapshot instead — pure-Python scoring reproduces the
DataFrame pipeline's semantics exactly (pinned by tests), and the
DataFrame path remains the source of truth for batch/scale use.

Build cost: one collect per table, done once per index build.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ariadne_dbt_spark.config import HYBRID_WEIGHTS, LAYER_BOOSTS
from ariadne_dbt_spark.functions.text import tokenize_query
from ariadne_dbt_spark.operators.search import B, DEFAULT_FIELD_WEIGHTS, K1


@dataclass
class LocalIndexCache:
    models: dict[str, dict] = field(default_factory=dict)
    columns: dict[str, list[dict]] = field(default_factory=dict)  # model_id → rows
    tests: dict[str, list[dict]] = field(default_factory=dict)  # model_id → rows
    macros: list[dict] = field(default_factory=list)
    sources: dict[str, dict] = field(default_factory=dict)
    children: dict[str, list[str]] = field(default_factory=dict)
    parents: dict[str, list[str]] = field(default_factory=dict)
    # postings[field][term] → {unique_id: tf}; docstats[field][unique_id] → dl
    postings: dict[str, dict[str, dict[str, int]]] = field(default_factory=dict)
    docstats: dict[str, dict[str, int]] = field(default_factory=dict)

    @classmethod
    def from_index(cls, index) -> "LocalIndexCache":
        c = cls()
        c.models = {r["unique_id"]: r.asDict() for r in index.models.collect()}
        for r in index.columns.collect():
            c.columns.setdefault(r["model_id"], []).append(r.asDict())
        for cols in c.columns.values():
            cols.sort(key=lambda x: x["name"])
        for r in index.tests.collect():
            c.tests.setdefault(r["model_id"], []).append(r.asDict())
        c.macros = [r.asDict() for r in index.macros.collect()]
        c.sources = {r["unique_id"]: r.asDict() for r in index.sources.collect()}
        for r in index.edges.collect():
            c.children.setdefault(r.parent_id, []).append(r.child_id)
            c.parents.setdefault(r.child_id, []).append(r.parent_id)
        for r in index.postings.collect():
            c.postings.setdefault(r["field"], {}).setdefault(r["term"], {})[
                r["unique_id"]
            ] = r["tf"]
        for r in index.docstats.collect():
            c.docstats.setdefault(r["field"], {})[r["unique_id"]] = r["dl"]
        return c

    # -- graph (pure-python BFS; same semantics as operators.graph.bfs) ------
    def bfs(self, starts: list[str], direction: str, max_depth: int,
            exclude_start: bool = True) -> list[tuple[str, int]]:
        adj = self.children if direction == "downstream" else self.parents
        max_depth = max(0, min(int(max_depth), 10))
        dist = {s: 0 for s in starts}
        frontier = list(dict.fromkeys(starts))
        for depth in range(1, max_depth + 1):
            nxt = []
            for node in frontier:
                for nb in adj.get(node, ()):
                    if nb not in dist:
                        dist[nb] = depth
                        nxt.append(nb)
            if not nxt:
                break
            frontier = nxt
        start_set = set(starts)
        return sorted(
            ((u, d) for u, d in dist.items() if not (exclude_start and u in start_set)),
            key=lambda t: (t[1], t[0]),
        )

    # -- search (same math as operators.search.bm25 + hybrid_rerank) ---------
    def bm25(self, query: str, *, field_weights: dict[str, float] | None = None) -> dict[str, float]:
        terms = set(tokenize_query(query))
        if not terms:
            return {}
        weights = field_weights or DEFAULT_FIELD_WEIGHTS
        n_docs = len(self.models)
        scores: dict[str, float] = {}
        for fld, term_map in self.postings.items():
            w = weights.get(fld, 1.0)
            stats = self.docstats.get(fld, {})
            avgdl = (sum(stats.values()) / len(stats)) if stats else 1.0
            for t in terms:
                docs = term_map.get(t)
                if not docs:
                    continue
                df = len(docs)
                idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                for uid, tf in docs.items():
                    dl = stats.get(uid, 0)
                    tf_norm = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
                    scores[uid] = scores.get(uid, 0.0) + idf * tf_norm * w
        return scores

    def search(
        self,
        query: str,
        *,
        intent: str = "explore",
        limit: int = 10,
        exclude_ids: list[str] | None = None,
        layer: str | None = None,
    ) -> list[dict]:
        limit = max(1, min(int(limit), 50))
        raw = self.bm25(query)
        candidates = sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))[: 4 * limit]
        if not candidates:  # T4: LIKE fallback, centrality-ranked
            q = query.lower().strip()
            fall = [
                (uid, 0.5)
                for uid, m in self.models.items()
                if q in (m["name"] or "").lower() or q in (m["description"] or "").lower()
            ]
            candidates = sorted(
                fall, key=lambda kv: (-(self.models[kv[0]]["centrality"] or 0), kv[0])
            )[: 4 * limit]
        exclude = set(exclude_ids or ())
        candidates = [(u, s) for u, s in candidates if u not in exclude]
        if not candidates:
            return []
        vals = [s for _, s in candidates]
        mn, mx = min(vals), max(vals)
        boosts = LAYER_BOOSTS.get(intent, LAYER_BOOSTS["explore"])
        q = query.lower().strip()
        out = []
        for uid, s in candidates:
            m = self.models[uid]
            norm = 1.0 if mx == mn else (s - mn) / (mx - mn)
            # bonus VALUE 0.15, scaled again by the 0.15 weight (net
            # 0.0225) — pinned to operators.search.hybrid_rerank and the
            # reference (search.py:82-90)
            name_bonus = 0.15 if q and q in (m["name"] or "").lower() else 0.0
            score = (
                norm * HYBRID_WEIGHTS["bm25"]
                + (m["centrality"] or 0.0) * HYBRID_WEIGHTS["centrality"]
                + boosts.get(m["layer"], 0.0) * HYBRID_WEIGHTS["layer"]
                + name_bonus * HYBRID_WEIGHTS["name"]
            )
            out.append(
                {
                    "unique_id": uid,
                    "name": m["name"],
                    "layer": m["layer"],
                    "description": (m["description"] or "")[:200],
                    "centrality": m["centrality"],
                    "bm25_score": s,
                    "score": score,
                }
            )
        out.sort(key=lambda r: (-r["score"], r["unique_id"]))
        if layer:
            out = [r for r in out if r["layer"] == layer]
        return out[:limit]

    # -- lookups ---------------------------------------------------------------
    def by_name(self, name: str) -> dict | None:
        low = name.lower()
        for m in self.models.values():
            if (m["name"] or "").lower() == low:
                return m
        return None

    def resolve_paths(self, paths: list[str]) -> list[str]:
        out, seen = [], set()
        for p in paths:
            if p.endswith((".yml", ".yaml")):
                continue
            stem = p.rsplit("/", 1)[-1]
            stem = (stem[:-4] if stem.endswith(".sql") else stem).lower()
            for uid, m in sorted(self.models.items()):
                if m["file_path"] == p or (m["name"] or "").lower() == stem:
                    if uid not in seen:
                        seen.add(uid)
                        out.append(uid)
        return out

    def columns_with_tests(self, model_id: str) -> list[dict]:
        tests_by_col: dict[str, set] = {}
        for t in self.tests.get(model_id, ()):
            if t["column_name"]:
                tests_by_col.setdefault(t["column_name"], set()).add(t["test_type"])
        return [
            {**c, "test_types": sorted(tests_by_col.get(c["name"], ()))}
            for c in self.columns.get(model_id, ())
        ]

    def macros_used(self, model_id: str) -> list[dict]:
        m = self.models.get(model_id)
        if not m:
            return []
        sql = m["compiled_code"] or m["raw_code"] or ""
        return [
            {"macro_id": mac["unique_id"], "macro_name": mac["name"]}
            for mac in self.macros
            if mac["name"] and mac["name"] in sql
        ]

    def direct_sources(self, model_id: str) -> list[dict]:
        out = []
        for pid in self.parents.get(model_id, ()):
            s = self.sources.get(pid)
            if s:
                out.append(
                    {
                        "unique_id": s["unique_id"],
                        "name": s["name"],
                        "source_name": s["source_name"],
                        "schema_name": s["schema_name"],
                        "description": s["description"],
                    }
                )
        return sorted(out, key=lambda r: r["unique_id"])
