"""Generator + usage log + streaming + multimodal surfaces."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.generator import DocsGenerator
from ariadne_dbt_spark.operators.multimodal import (
    extract_features,
    metadata_stats,
    sample_frames,
    synthetic_assets,
)
from ariadne_dbt_spark.operators.usage import UsageLog


def test_project_summary_renders(index):
    gen = DocsGenerator(index)
    md = gen.render_project_summary()
    assert "webshop" in md
    assert "staging" in md and "marts" in md
    assert "fct_orders" in md  # key model by centrality


def test_dag_summary_renders(index):
    md = DocsGenerator(index).render_dag_summary()
    assert "`source.webshop.raw.orders` → `model.webshop.stg_orders`" in md


def test_write_docs_preserves_memory(index, tmp_path):
    gen = DocsGenerator(index)
    out = str(tmp_path / "docs")
    gen.write_docs(out)
    mem = tmp_path / "docs" / "memory.md"
    mem.write_text("user notes — do not clobber")
    gen.write_docs(out)
    assert mem.read_text() == "user notes — do not clobber"


def test_usage_log_roundtrip(spark, tmp_path):
    log = UsageLog(spark, str(tmp_path / "usage"))
    log.record("search_models", task_text="find revenue", intent="explore",
               token_estimate=120, duration_ms=45, ts=datetime(2026, 1, 5, 10, 0))
    log.record("get_context_capsule", task_text="debug fct", intent="debug",
               focus_model="fct_orders", token_estimate=900, duration_ms=200,
               ts=datetime(2026, 1, 5, 11, 0))
    log.record("search_models", intent="explore", token_estimate=80,
               ts=datetime(2026, 1, 6, 9, 0))
    s = log.stats(days=100000)
    assert s["total_calls"] == 3
    assert s["by_tool"]["search_models"] == 2
    assert s["by_intent"] == {"explore": 2, "debug": 1}
    assert s["top_focus_models"] == [("fct_orders", 1)]
    recent = log.recent(limit=2)
    assert len(recent) == 2
    assert recent[0]["id"] >= recent[1]["id"]


def test_usage_stream_daily(spark, tmp_path):
    from ariadne_dbt_spark.streaming.usage_stream import run_usage_stream_once

    log = UsageLog(spark, str(tmp_path / "usage"))
    for d, h in ((5, 9), (5, 15), (6, 9)):
        log.record("search_models", ts=datetime(2026, 1, d, h, 0))
    out = run_usage_stream_once(spark, str(tmp_path / "usage"))
    rows = {str(r.day_start.date()): r.n_calls for r in out.collect()}
    assert rows == {"2026-01-05": 2, "2026-01-06": 1}


def test_manifest_watcher(spark, tmp_path):
    import json
    import time

    from ariadne_dbt_spark.streaming.usage_stream import watch_manifests

    drop = tmp_path / "drop"
    drop.mkdir()
    seen: list[str] = []
    q = watch_manifests(spark, str(drop), seen.append)
    try:
        (drop / "manifest.json").write_text(json.dumps({"nodes": {}}))
        deadline = time.time() + 30
        while not seen and time.time() < deadline:
            q.processAllAvailable()
            time.sleep(0.2)
    finally:
        q.stop()
    assert seen and seen[0].endswith("manifest.json")


def test_multimodal_features(spark):
    assets = synthetic_assets(spark, n=12)
    feats = extract_features(assets, fake=True)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r.features) == 16 for r in rows)
    # deterministic: same payload → same features
    again = {r.asset_id: r.features for r in extract_features(assets, fake=True).collect()}
    assert all(again[r.asset_id] == r.features for r in rows)


def test_multimodal_real_decode_rejects_garbage(spark):
    # synthetic_assets payloads are hash bytes, not valid PNG/WAV: the
    # real-decode path must fail LOUDLY (ValueError from the codec, or
    # NotImplementedError for video), never silently fake features.
    # Real decodes of valid payloads: tests/test_multimodal_decode.py.
    import pytest

    assets = synthetic_assets(spark, n=3)
    with pytest.raises(Exception) as ei:
        extract_features(assets, fake=False).collect()
    assert any(
        name in str(ei.value)
        for name in ("NotImplementedError", "ValueError", "not a PNG")
    )


def test_frame_sampling_plan(spark):
    assets = synthetic_assets(spark, n=9)
    frames = sample_frames(assets, every_ms=1000)
    per_asset = frames.groupBy("asset_id").count().collect()
    assert per_asset  # videos only (every 3rd asset)
    assert all(r["count"] >= 6 for r in per_asset)  # ≥5s / 1s grid


def test_metadata_only_scan_prunes_payload(spark, tmp_path):
    assets = synthetic_assets(spark, n=9)
    p = str(tmp_path / "assets")
    assets.write.parquet(p)
    stats = metadata_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruning kept bytes out of the scan
    assert {r.kind for r in stats.collect()} == {"image", "audio", "video"}
