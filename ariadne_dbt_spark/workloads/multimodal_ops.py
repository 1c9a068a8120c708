"""Multimodal-pipeline workload: the real Arrow plumbing
(operators/multimodal.py) driven end-to-end over a deterministic asset
table derived from `documents`, with a DuckDB oracle that re-computes
every output value independently.

This gate workload runs the deterministic `fake=True` decode
(feature[i] = byte_i(sha256(payload)) / 255 — engine-independent), so
the oracle can reproduce the features exactly via DuckDB's sha256()
(REAL PNG/WAV decodes run in tests/test_multimodal_decode.py through
the same mapInPandas stage with `fake=False`):
payload is the UTF-8 text bytes on both sides. What this verifies is
the part that matters at 100 TB — the mapInPandas schema/batching, the
payload-metadata split, and the frame-sampling plan that derives work
units without touching video bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.multimodal import extract_features, sample_frames
from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query

#: frame-sampling stride for the video assets (ms)
_EVERY_MS = 1000


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic asset table from `documents`: kind cycles by doc_id,
    payload = UTF-8 text bytes, duration = 10 ms per char for a/v."""
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    duration = F.when(
        F.col("doc_id") % 3 == 0, F.lit(None).cast("int")
    ).otherwise((F.length("text") * 10).cast("int"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            duration.alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


@query(
    "multimodal_pipeline",
    oracle=f"""
    WITH assets AS (
        SELECT doc_id AS asset_id,
               CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               text,
               CASE WHEN doc_id % 3 = 0 THEN NULL
                    ELSE length(text) * 10 END AS duration_ms
        FROM documents)
    SELECT asset_id, kind,
           CAST(concat('0x', substr(sha256(text), 1, 2)) AS INTEGER) AS f0,
           CAST(concat('0x', substr(sha256(text), 3, 2)) AS INTEGER) AS f1,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
           CAST(CASE WHEN kind = 'video' THEN duration_ms // {_EVERY_MS} + 1
                     ELSE 0 END AS BIGINT) AS n_frames
    FROM assets
    """,
    survey="multimodal",
    doc="Asset table from documents → Arrow mapInPandas feature "
    "extraction (deterministic fake decode for oracle parity; real "
    "PNG/WAV decode pytest-pinned) + metadata-only frame "
    "sampling; per-asset features/frame counts re-derived by the oracle.",
)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir)
    feats = extract_features(assets, fake=True).select(
        "asset_id",
        "kind",
        # features are byte/255 doubles; ×255 + round restores the exact
        # byte value, so the projection is integer-exact for the oracle
        F.round(F.element_at("features", 1) * 255).cast("int").alias("f0"),
        F.round(F.element_at("features", 2) * 255).cast("int").alias("f1"),
    )
    frames = (
        sample_frames(assets, every_ms=_EVERY_MS)
        .groupBy("asset_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    lens = assets.select(
        "asset_id", F.length("payload").cast("bigint").alias("payload_len")
    )
    return (
        feats.join(lens, "asset_id")
        .join(frames, "asset_id", "left")
        .select(
            "asset_id",
            "kind",
            "f0",
            "f1",
            "payload_len",
            F.coalesce("n_frames", F.lit(0)).cast("bigint").alias("n_frames"),
        )
    )
