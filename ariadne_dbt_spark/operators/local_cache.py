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
    exposures: dict[str, dict] = field(default_factory=dict)
    children: dict[str, list[str]] = field(default_factory=dict)
    parents: dict[str, list[str]] = field(default_factory=dict)
    # postings[field][term] → {unique_id: tf}; docstats[field][unique_id] → dl
    postings: dict[str, dict[str, dict[str, int]]] = field(default_factory=dict)
    docstats: dict[str, dict[str, int]] = field(default_factory=dict)
    #: queries must stem iff the snapshotted postings were stemmed
    stem: bool = False

    @classmethod
    def from_index(cls, index) -> "LocalIndexCache":
        c = cls()
        c.stem = bool(getattr(index.config, "stem_tokens", False))
        c.models = {r["unique_id"]: r.asDict() for r in index.models.collect()}
        for r in index.columns.collect():
            c.columns.setdefault(r["model_id"], []).append(r.asDict())
        for cols in c.columns.values():
            cols.sort(key=lambda x: x["name"])
        for r in index.tests.collect():
            c.tests.setdefault(r["model_id"], []).append(r.asDict())
        c.macros = [r.asDict() for r in index.macros.collect()]
        c.sources = {r["unique_id"]: r.asDict() for r in index.sources.collect()}
        c.exposures = {r["unique_id"]: r.asDict() for r in index.exposures.collect()}
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
        terms = set(tokenize_query(query, stem=self.stem))
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
        # reference layer sequence (server.py:363-371): search with an
        # effective 2×limit, cut the ranked list there, THEN layer-filter
        limit = max(1, min(int(limit), 50))
        eff_limit = 2 * limit if layer else limit
        raw = self.bm25(query)
        candidates = sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))[: 4 * eff_limit]
        if not candidates:  # T4: LIKE fallback, centrality-ranked
            q = query.lower().strip()
            fall = [
                (uid, 0.5)
                for uid, m in self.models.items()
                if q in (m["name"] or "").lower() or q in (m["description"] or "").lower()
            ]
            candidates = sorted(
                fall, key=lambda kv: (-(self.models[kv[0]]["centrality"] or 0), kv[0])
            )[: 4 * eff_limit]
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
            out = [r for r in out[:eff_limit] if r["layer"] == layer]
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

    # -- serving surfaces (latency path; semantics pinned to the
    # DataFrame operators by tests/test_local_serving.py) -------------------
    def lineage(self, model_id: str, *, depth: int = 3, direction: str = "both") -> list[dict]:
        """Enriched lineage rows — local twin of lineage.get_lineage."""
        out = []
        dirs = ("upstream", "downstream") if direction == "both" else (direction,)
        for rel in dirs:
            for uid, dist in self.bfs([model_id], rel, depth):
                m = self.models.get(uid)
                s = self.sources.get(uid)
                out.append({
                    "unique_id": uid,
                    "distance": dist,
                    "relationship": rel,
                    "name": (m or s or {}).get("name"),
                    "layer": m["layer"] if m else ("source" if s else None),
                    "kind": uid.split(".", 1)[0],
                })
        out.sort(key=lambda r: (r["relationship"], r["distance"], r["unique_id"]))
        return out

    def patterns(self) -> dict:
        """Pattern bundle — local twin of operators.patterns.extract_patterns."""
        from collections import Counter, defaultdict

        models = list(self.models.values())
        per_layer = Counter(m["layer"] for m in models)
        mats = defaultdict(Counter)
        for m in models:
            mats[m["layer"]][m["materialization"]] += 1
        materializations = {
            layer: min(c.most_common(), key=lambda kv: (-kv[1], kv[0]))[0]
            for layer, c in mats.items()
        }
        prefixes = defaultdict(Counter)
        for m in models:
            name = m["name"] or ""
            if "_" in name:
                prefixes[m["layer"]][name.split("_", 1)[0]] += 1
        naming = {
            layer: min(c.most_common(), key=lambda kv: (-kv[1], kv[0]))[0]
            for layer, c in prefixes.items() if c
        }
        # example per layer: argmax (column count, description length, name)
        examples = {}
        best: dict[str, tuple] = {}
        for m in models:
            key = (
                len(self.columns.get(m["unique_id"], ())),
                len(m["description"] or ""),
            )
            cur = best.get(m["layer"])
            # deterministic: higher key wins, ties break on LOWER name
            if cur is None or (key, _neg_name(m["name"])) > (cur[0], _neg_name(cur[1])):
                best[m["layer"]] = (key, m["name"])
        examples = {layer: name for layer, (_k, name) in best.items()}
        coverage = {}
        per_layer_cols: dict[str, int] = Counter()
        per_layer_tested: dict[str, int] = Counter()
        for m in models:
            uid, layer = m["unique_id"], m["layer"]
            cols = self.columns.get(uid, ())
            per_layer_cols[layer] += len(cols)
            tested = {t["column_name"] for t in self.tests.get(uid, ()) if t["column_name"]}
            per_layer_tested[layer] += len({c["name"] for c in cols} & tested)
        for layer, total in per_layer_cols.items():
            coverage[layer] = round(100.0 * per_layer_tested[layer] / total, 1) if total else 0.0
        tags = Counter()
        for m in models:
            for t in m["tags"] or ():
                tags[t] += 1
        top_tags = [
            (t, n)
            for t, n in sorted(tags.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        ]
        n_tests = sum(len(v) for v in self.tests.values())
        best_tested = None
        cand = [
            (-len({t["test_type"] for t in ts}), -len(ts), mid)
            for mid, ts in self.tests.items() if ts
        ]
        if cand:
            nt, n, mid = min(cand)
            best_tested = {"model_id": mid, "test_types": -nt, "tests": -n}
        return {
            "best_tested": best_tested,
            "stats": {
                "models": len(models),
                "sources": len(self.sources),
                "tests": n_tests,
                "macros": len(self.macros),
                "exposures": len(self.exposures),
                "columns": sum(len(v) for v in self.columns.values()),
            },
            "models_per_layer": dict(per_layer),
            "materializations": materializations,
            "examples": examples,
            "naming": naming,
            "coverage": coverage,
            "top_tags": top_tags,
        }

    def capsule(
        self,
        task: str,
        *,
        focus_model: str | None = None,
        entry_models: list[str] | None = None,
        entry_paths: list[str] | None = None,
        token_budget: int = 10_000,
        max_pivots: int = 3,
    ) -> dict:
        """Token-budgeted capsule — local twin of CapsuleBuilder.build
        (same tier templates, budget fractions, break-vs-skip fill)."""
        from ariadne_dbt_spark.config import BUDGET_FRACTIONS, INTENT_DEPTHS
        from ariadne_dbt_spark.operators.capsule import (
            CapsuleBuilder,
            detect_intent,
            estimate_tokens,
            full_context,
            minimal_context,
            skeleton_context,
        )

        intent = detect_intent(task)
        up_depth, down_depth = INTENT_DEPTHS.get(intent, (1, 1))

        pivots: list[str] = []
        explicit = False
        for name in ([focus_model] if focus_model else []) + list(entry_models or []):
            m = self.by_name(name)
            if m and m["unique_id"] not in pivots and len(pivots) < max_pivots:
                pivots.append(m["unique_id"])
                explicit = True
        for uid in self.resolve_paths(entry_paths or []):
            if uid not in pivots and len(pivots) < max_pivots:
                pivots.append(uid)
                explicit = True
        scores: list[float] = []
        if len(pivots) < max_pivots:
            hits = self.search(
                task, intent=intent, limit=max_pivots - len(pivots) + 2,
                exclude_ids=pivots,
            )
            scores = [h["score"] for h in hits]
            for h in hits[: max_pivots - len(pivots)]:
                if h["unique_id"] not in pivots:
                    pivots.append(h["unique_id"])
        confidence = CapsuleBuilder._confidence(explicit, scores)

        cap = {
            "task": task, "intent": intent, "confidence": confidence,
            "pivots": [], "upstream": [], "downstream": [], "tests": [],
            "macros": [], "sources": [], "similar_models": [], "patterns": {},
            "session_context": {},
            "token_estimate": 0, "token_budget": token_budget,
        }
        if not pivots:
            cap["patterns"] = self.patterns()
            cap["token_estimate"] = estimate_tokens(cap)
            return cap

        up_ids = self.bfs(pivots, "upstream", up_depth) if up_depth else []
        up_ids = [(u, d) for u, d in up_ids if u.startswith("model.")]
        down_ids = self.bfs(pivots, "downstream", down_depth) if down_depth else []
        down_ids = [(u, d) for u, d in down_ids if u.startswith("model.")]

        alloc = {k: int(token_budget * v) for k, v in BUDGET_FRACTIONS.items()}
        fill = CapsuleBuilder._greedy_fill

        pivot_items = [
            full_context(self.models[p], self.columns_with_tests(p))
            for p in pivots if p in self.models
        ]
        cap["pivots"] = fill(pivot_items, alloc["pivot"], break_on_overflow=False)
        up_items = [
            skeleton_context(self.models[u], self.columns_with_tests(u), d)
            for u, d in sorted(up_ids, key=lambda x: (x[1], x[0])) if u in self.models
        ]
        cap["upstream"] = fill(up_items, alloc["upstream"], break_on_overflow=True)
        down_items = [
            minimal_context(self.models[u], self.columns_with_tests(u), d)
            for u, d in sorted(down_ids, key=lambda x: (x[1], x[0])) if u in self.models
        ]
        cap["downstream"] = fill(down_items, alloc["downstream"], break_on_overflow=True)

        test_items, macro_items, source_items = [], [], []
        for p in pivots:
            test_items += [
                {"unique_id": t["unique_id"], "name": t["name"],
                 "test_type": t["test_type"], "column_name": t["column_name"]}
                for t in self.tests.get(p, ())
            ]
            macro_items += self.macros_used(p)
            source_items += self.direct_sources(p)
        half = alloc["tests_macros"] // 2
        cap["tests"] = fill(test_items, half, break_on_overflow=False)
        cap["macros"] = fill(macro_items, alloc["tests_macros"] - half, break_on_overflow=False)
        seen: set[str] = set()
        cap["sources"] = [
            s for s in source_items
            if not (s["unique_id"] in seen or seen.add(s["unique_id"]))
        ]
        wanted = set(pivots) | {u for u, _ in up_ids} | {u for u, _ in down_ids}
        sim = self.search(task, intent=intent, limit=5, exclude_ids=list(wanted))
        cap["similar_models"] = [r["name"] for r in sim]
        pat = self.patterns()
        cap["patterns"] = pat if estimate_tokens(pat) <= alloc["patterns"] else {"stats": pat["stats"]}
        cap["token_estimate"] = estimate_tokens(cap)
        return cap

    def discover(
        self,
        task: str,
        *,
        focus_model: str | None = None,
        entry_models: list[str] | None = None,
        entry_paths: list[str] | None = None,
        limit: int = 40,
    ) -> list[dict]:
        """Names-only orientation list — local twin of
        CapsuleBuilder.discover (same pivot seeding, depth-4 DAG labels,
        search fill labeled ``search``; reference: capsule.py:432-501)."""
        from ariadne_dbt_spark.config import EngineConfig
        from ariadne_dbt_spark.operators.capsule import detect_intent

        limit = max(1, min(int(limit), EngineConfig().discover_limit))
        intent = detect_intent(task)

        pivots: list[str] = []
        for name in ([focus_model] if focus_model else []) + list(entry_models or []):
            m = self.by_name(name)
            if m and m["unique_id"] not in pivots and len(pivots) < 5:
                pivots.append(m["unique_id"])
        for uid in self.resolve_paths(entry_paths or []):
            if uid not in pivots and len(pivots) < 5:
                pivots.append(uid)
        if len(pivots) < 5:
            for h in self.search(task, intent=intent, limit=5 - len(pivots), exclude_ids=pivots):
                if h["unique_id"] not in pivots:
                    pivots.append(h["unique_id"])

        out: list[dict] = []
        seen: set[str] = set()

        def add(uid: str, rel: str, dist: int):
            m = self.models.get(uid)
            if uid in seen or len(out) >= limit or m is None:
                return
            seen.add(uid)
            out.append(
                {
                    "unique_id": uid,
                    "name": m["name"],
                    "layer": m.get("layer") or "other",
                    "file_path": m.get("file_path") or "",
                    "relationship": rel,
                    "distance": dist,
                }
            )

        for p in pivots:
            add(p, "pivot", 0)
        for direction, rel in (("upstream", "upstream"), ("downstream", "downstream")):
            if len(out) >= limit:
                break
            hits = sorted(self.bfs(pivots, direction, 4), key=lambda x: (x[1], x[0]))
            for uid, dist in hits:
                if uid.startswith("model."):
                    add(uid, rel, dist)
        if len(out) < limit:
            for h in self.search(task, intent=intent, limit=limit - len(out), exclude_ids=list(seen)):
                add(h["unique_id"], "search", -1)
        return out


def _neg_name(name: str | None):
    """Sort helper: makes LOWER names win ties under max-comparison."""
    return tuple(-ord(ch) for ch in (name or ""))
