"""Multimodal column plumbing (north-star scale extension).

Image/audio/video payloads ride as opaque `binary` columns with a typed
metadata struct; all Spark-side mechanics are real — schema, Arrow-batched
mapInPandas, deterministic partitioning, frame-sample plan — while the
codec calls are stubbed (the decode libraries are not in this container):
`decode_image`/`decode_audio` raise NotImplementedError unless
``fake=True``, which substitutes a deterministic hash-derived feature
vector so pipelines are testable end-to-end.

At 100 TB: binary payloads dominate row size, so asset tables are stored
payload-last, scanned with column pruning (metadata-only queries never
touch bytes), and repartitioned by asset_id before the pandas stage so
each Arrow batch holds whole assets.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]), True),
])

FEATURE_DIM = 16


def synthetic_assets(spark, n: int = 32) -> DataFrame:
    """Deterministic fake asset table for tests/demos."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4  # 128 bytes
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 640 if kind != "audio" else None,
            "height": 480 if kind != "audio" else None,
            "duration_ms": None if kind == "image" else 5000 + i,
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic hash-derived feature vector (the decode stub)."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    With ``fake=False`` this is where PIL/torchaudio/ffmpeg decode would
    run; the container has none of them, so it raises (clearly marked
    stub). The Spark plumbing (schema, batching, partition shape) is the
    production path either way.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode requires PIL/torchaudio/ffmpeg — not in this image"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": [ _fake_features(p) for p in pdf["payload"] ],
                }
            )

    # whole-asset batches: repartition by id so a payload never splits
    return df.repartition("asset_id").mapInPandas(fn, out_schema)


def sample_frames(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (asset, frame_ts).

    Pure column ops — the timestamp grid comes from the metadata, not the
    payload, so this stage never deserializes video bytes; the downstream
    decode stage (stubbed) receives (asset_id, frame_ts) work units.
    """
    vids = df.where(F.col("kind") == "video")
    grid = F.sequence(
        F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return vids.select(
        "asset_id",
        F.explode(grid).alias("frame_ts_ms"),
    )


def metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — must never read payload bytes (column
    pruning keeps the scan narrow; verified in tests via the plan)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.avg("meta.duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
