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


# Perceptual image dedup: REAL PNG decode -> dHash -> banded Hamming
# pairing, planted so the oracle knows the answer arithmetically. Every
# 7th doc becomes a deterministic 32x32 noise image (md5-expanded from
# doc_id); its clone (id + 1000000) is the SAME pixels re-encoded at a
# different zlib level — different BYTES, so exact/md5 dedup misses it,
# but dHash pairs it at Hamming 0. Unrelated noise images sit ~32 bits
# apart, far outside the <=3 threshold, so the planted pairs are the
# exact expected output.
@query(
    "image_phash_pairs",
    oracle="""
    SELECT doc_id AS id_a,
           doc_id + 1000000 AS id_b,
           0 AS hamming
    FROM documents
    WHERE doc_id % 7 = 0
    ORDER BY id_a
    """,
    survey="multimodal,perceptual-hash,§8.4",
    doc="Perceptual (dHash) image near-dup pairs through the real PNG "
    "decode path: re-encoded clones pair at Hamming 0 via the banded "
    "16-bit pigeonhole join; byte-identical dedup cannot catch them.",
)
def image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.multimodal import (
        dhash_near_dups,
        encode_png,
        with_dhash,
    )

    docs = (
        spark.read.parquet(table_path(sf_dir, "documents"))
        .where(F.col("doc_id") % 7 == 0)
        .select("doc_id")
    )

    def build(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                px = list(
                    b"".join(hashlib.md5(f"img:{d}:{i}".encode()).digest() for i in range(64))
                )
                ids.append(d)
                payloads.append(encode_png(32, 32, 1, px))
                ids.append(d + 1000000)
                payloads.append(encode_png(32, 32, 1, px, level=1))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = docs.mapInPandas(build, "asset_id long, payload binary")
    return (
        dhash_near_dups(with_dhash(assets))
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("hamming").cast("int").alias("hamming"),
        )
        .orderBy("id_a")
    )


# Perceptual AUDIO dedup: every 11th doc becomes a deterministic PCM16
# WAV (md5-expanded samples); its clone (id + 2000000) is the SAME
# signal remastered at half volume — different bytes, identical
# energy-gradient fingerprint. The banded Hamming join then returns
# exactly the planted pairs, which the oracle knows arithmetically.
@query(
    "audio_fp_pairs",
    oracle="""
    SELECT doc_id AS id_a,
           doc_id + 2000000 AS id_b
    FROM documents
    WHERE doc_id % 11 = 0
    ORDER BY id_a
    """,
    survey="multimodal,perceptual-hash,§8.4",
    doc="Energy-gradient audio fingerprint near-dup pairs through the "
    "real PCM16 WAV decode: half-volume remasters pair at Hamming<=3 "
    "via the banded pigeonhole join; byte dedup cannot catch them.",
)
def audio_fp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct as _struct

    from ariadne_dbt_spark.operators.multimodal import (
        dhash_near_dups,
        with_audio_fingerprint,
    )

    docs = (
        spark.read.parquet(table_path(sf_dir, "documents"))
        .where(F.col("doc_id") % 11 == 0)
        .select("doc_id")
    )

    def build(batches):
        import hashlib
        import io
        import wave

        import pandas as pd

        def wav(samples):
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(_struct.pack(f"<{len(samples)}h", *samples))
            return buf.getvalue()

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                raw = b"".join(
                    hashlib.md5(f"aud:{d}:{i}".encode()).digest() for i in range(260)
                )
                samples = list(_struct.unpack(f"<{len(raw) // 2}h", raw))
                ids.append(d)
                payloads.append(wav(samples))
                ids.append(d + 2000000)
                payloads.append(wav([x // 2 for x in samples]))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = docs.mapInPandas(build, "asset_id long, payload binary")
    return (
        dhash_near_dups(with_audio_fingerprint(assets), hash_col="afp")
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        )
        .orderBy("id_a")
    )


# Perceptual VIDEO dedup (closes SURVEY §8.4's decode partial): every
# 13th doc becomes a deterministic 10-frame AVI-MPNG video (md5-noise
# PNG frames seeded by doc_id); its clone (id + 3000000) is the SAME
# pixels re-encoded at a different zlib level — different container
# bytes, identical frame dHashes. The uniform 8-frame sample grid
# aligns clone-for-clone, so every planted pair matches on all 8
# sampled frames (n_matched=8, frac=1.0) while unrelated noise videos
# share ~no 16-bit hash band. The oracle knows this arithmetically.
@query(
    "video_neardup_pairs",
    oracle="""
    SELECT doc_id AS id_a,
           doc_id + 3000000 AS id_b,
           CAST(8 AS BIGINT) AS n_matched,
           CAST(1.0 AS DOUBLE) AS frac_matched
    FROM documents
    WHERE doc_id % 13 = 0
    ORDER BY id_a
    """,
    survey="multimodal,perceptual-hash,§8.4",
    doc="Perceptual video near-dup pairs through the REAL frame decode "
    "path: originals are AVI-MPNG; every other clone is the SAME "
    "pixels re-boxed as MP4 (stsz/stsc/stco sample-table walk) — so "
    "the oracle-hard row covers container parse (RIFF AND ISO-BMFF), "
    "frame split, stdlib PNG pixel decode, per-frame dHash, banded "
    "Hamming frame join, per-pair coverage. Re-encoded cross-container "
    "clones pair at full frame coverage; byte-level dedup cannot catch "
    "them.",
)
def video_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.video import (
        encode_avi,
        video_frame_hashes,
        video_near_dups,
    )

    docs = (
        spark.read.parquet(table_path(sf_dir, "documents"))
        .where(F.col("doc_id") % 13 == 0)
        .select("doc_id")
    )

    def build(batches):
        import hashlib

        import pandas as pd

        from ariadne_dbt_spark.operators.multimodal import (
            encode_mp4_mjpeg,
            encode_png,
        )

        def frames(d: int) -> list[list[int]]:
            out = []
            for f in range(10):
                raw = b"".join(
                    hashlib.md5(f"vid:{d}:{f}:{i}".encode()).digest()
                    for i in range(64)
                )
                out.append(list(raw))
            return out

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                px = frames(d)
                ids.append(d)
                payloads.append(
                    encode_avi(
                        [encode_png(32, 32, 1, p) for p in px],
                        width=32,
                        height=32,
                        fps=10,
                    )
                )
                ids.append(d + 3000000)
                clone_frames = [encode_png(32, 32, 1, p, level=1) for p in px]
                if (d // 13) % 2 == 0:
                    # every other clone re-boxed as MP4-PNG: the pair
                    # only matches if the ISO-BMFF sample-table walk
                    # extracts the same frames the RIFF path does
                    payloads.append(
                        encode_mp4_mjpeg(
                            clone_frames, width=32, height=32, fps=10,
                            fourcc=b"png ",
                        )
                    )
                else:
                    payloads.append(
                        encode_avi(clone_frames, width=32, height=32, fps=10)
                    )
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = docs.mapInPandas(build, "asset_id long, payload binary")
    return (
        video_near_dups(video_frame_hashes(assets))
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("n_matched").cast("long").alias("n_matched"),
            F.col("frac_matched").cast("double").alias("frac_matched"),
        )
        .orderBy("id_a")
    )


# Decode-coverage report (round 8): the user-visible face of the codec
# tier matrix — ONE probe+decode pass over a planted six-way asset mix
# answering "what fraction of my corpus decodes, per kind/tier, and why
# not". The mix is derived arithmetically from doc_id, so the oracle
# knows every (kind, tier, status, n) cell exactly: PNG images, WAV
# audio, AVI-MPNG video and MP4-PNG video DECODE; MP4-avc1 (entropy
# codec, the one disclosed stub) reports STUB; truncated garbage
# QUARANTINES — one pass, no NULL-counting after an expensive run.
@query(
    "decode_coverage_report",
    oracle="""
    WITH mix AS (
        SELECT CASE CAST(doc_id % 6 AS INT)
                 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               END AS kind,
               CASE CAST(doc_id % 6 AS INT)
                 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                 WHEN 2 THEN 'avi-mpng' WHEN 3 THEN 'mp4-png'
                 WHEN 4 THEN 'mp4-avc1' ELSE 'unknown'
               END AS tier,
               CASE CAST(doc_id % 6 AS INT)
                 WHEN 4 THEN 'stub' WHEN 5 THEN 'quarantined'
                 ELSE 'decoded'
               END AS status
        FROM documents)
    SELECT kind, tier, status, CAST(COUNT(*) AS BIGINT) AS n_assets
    FROM mix GROUP BY 1, 2, 3 ORDER BY kind, tier, status
    """,
    survey="multimodal,quality-scoring,§8.4",
    doc="Decode-coverage report: one Arrow probe+decode pass over a "
    "planted 6-way asset mix (PNG/WAV/AVI-MPNG/MP4-PNG decode; "
    "MP4-avc1 is the disclosed stub tier; garbage quarantines) — "
    "per-(kind, tier, status) counts the oracle re-derives from the "
    "doc_id mix arithmetically.",
)
def decode_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.multimodal import decode_coverage_stats

    docs = spark.read.parquet(table_path(sf_dir, "documents")).select("doc_id")

    def build(batches):
        import hashlib
        import io
        import struct as _struct
        import wave

        import pandas as pd

        from ariadne_dbt_spark.operators.multimodal import (
            encode_mp4_mjpeg,
            encode_png,
        )
        from ariadne_dbt_spark.operators.video import encode_avi

        def noise(seed: str, n_bytes: int) -> bytes:
            return b"".join(
                hashlib.md5(f"{seed}:{i}".encode()).digest()
                for i in range(n_bytes // 16 + 1)
            )[:n_bytes]

        def wav_bytes(d: int) -> bytes:
            raw = noise(f"cov-aud:{d}", 128)
            samples = list(_struct.unpack(f"<{len(raw) // 2}h", raw))
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(_struct.pack(f"<{len(samples)}h", *samples))
            return buf.getvalue()

        def png_frames(d: int, n: int) -> list[bytes]:
            return [
                encode_png(8, 8, 1, list(noise(f"cov-vid:{d}:{f}", 64)))
                for f in range(n)
            ]

        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = d % 6
                if m == 0:
                    kind = "image"
                    payload = encode_png(8, 8, 1, list(noise(f"cov-img:{d}", 64)))
                elif m == 1:
                    kind = "audio"
                    payload = wav_bytes(d)
                elif m == 2:
                    kind = "video"
                    payload = encode_avi(png_frames(d, 3), width=8, height=8, fps=10)
                elif m == 3:
                    kind = "video"
                    payload = encode_mp4_mjpeg(
                        png_frames(d, 3), width=8, height=8, fps=10, fourcc=b"png "
                    )
                elif m == 4:
                    kind = "video"  # entropy-coded: samples exist, no codec
                    payload = encode_mp4_mjpeg(
                        [noise(f"cov-h264:{d}", 48)],
                        width=8, height=8, fps=10, fourcc=b"avc1",
                    )
                else:
                    kind = "video"  # unrecognized container → quarantine
                    payload = noise(f"cov-bad:{d}", 32)
                ids.append(d)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads}
            )

    assets = docs.mapInPandas(build, "asset_id long, kind string, payload binary")
    return decode_coverage_stats(assets)
