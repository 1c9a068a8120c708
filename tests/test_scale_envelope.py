"""Scale-envelope check (reference README.md:13 claims 200-10,000+
models, manifest up to 75 MB): build a 5,000-model synthetic manifest
(~9 MB) and hold the BASELINE.md interactive targets on it — the same
latency bars the 500-model bench enforces, at 10× the model count."""

from __future__ import annotations

import importlib.util
import json
import os
import time

import pytest

N_MODELS = 5000

#: wall-clock assertions are load-sensitive (a contended CI host can blow
#: a 5 ms bar without any regression). Default pytest runs get a generous
#: multiplier; the dedicated bench (bench.py interactive_latency) keeps
#: the strict BASELINE.md bars. Set STRICT_LATENCY=1 to enforce them here.
_STRICT = os.environ.get("STRICT_LATENCY") == "1"
_SLACK = 1.0 if _STRICT else 10.0


@pytest.fixture(scope="module")
def big_cache(spark, tmp_path_factory):
    spec = importlib.util.spec_from_file_location(
        "make_big_manifest",
        os.path.join(os.path.dirname(__file__), "fixtures", "make_big_manifest.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    path = tmp_path_factory.mktemp("envelope") / "manifest_5k.json"
    with open(path, "w") as f:
        json.dump(mod.make_manifest(N_MODELS), f)

    from ariadne_dbt_spark.ingest.indexer import AriadneIndex

    t0 = time.perf_counter()
    idx = AriadneIndex.build(spark, str(path))
    build_sec = time.perf_counter() - t0
    cache = idx.local()
    return cache, build_sec


def test_envelope_build_time(big_cache):
    cache, build_sec = big_cache
    assert len(cache.models) == N_MODELS
    # 500-model target is 5 s (BASELINE.md); at 10× models allow 10× —
    # measured ~4 s on an idle local[32], so this is a loose regression bar
    assert build_sec < 50.0 * _SLACK, f"5k-model build took {build_sec:.1f}s"


def test_envelope_interactive_latency(big_cache):
    cache, _ = big_cache
    central = max(
        cache.models.values(), key=lambda m: (m["centrality"] or 0.0, m["unique_id"])
    )["unique_id"]
    ops = {
        "search": (lambda: cache.search("revenue customer order", limit=10), 0.100),
        "capsule": (
            lambda: cache.capsule("debug failing test on revenue model", token_budget=8000),
            0.500,
        ),
        "lineage": (lambda: cache.lineage(central, depth=3), 0.050),
        "patterns": (lambda: cache.patterns(), 0.200),
    }
    for name, (fn, target) in ops.items():
        fn()  # warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        best = min(times)
        assert best <= target * _SLACK, (
            f"{name}: best {best*1000:.1f}ms > {target*1000*_SLACK:.0f}ms at 5k models"
        )


def test_envelope_search_quality(big_cache):
    cache, _ = big_cache
    hits = cache.search("revenue customer order", limit=10)
    assert len(hits) == 10
    assert all(h["score"] >= hits[-1]["score"] for h in hits)
