"""REAL multimodal decode through the production Spark path: a PNG and a
WAV built in-test are decoded (stdlib codecs when PIL/soundfile are
absent — import-guarded preference for the real libraries) inside
extract_features(fake=False), and the features are checked against the
known signal content."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from ariadne_dbt_spark.operators.multimodal import (
    ASSET_SCHEMA,
    decode_png,
    encode_png,
    extract_features,
)


def _wav_bytes(rate=8000, freq_frac=0.25, n=64):
    """PCM16 mono square-ish wave: +16384 / -16384 alternating every
    1/(2*freq_frac) samples → known RMS = 0.5, mean = 0, peak = 0.5."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [16384 if (i // 2) % 2 == 0 else -16384 for i in range(n)]
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def test_png_roundtrip_all_channels():
    for channels in (1, 2, 3, 4):
        pixels = list(range(2 * 2 * channels))  # distinct values per byte
        data = encode_png(2, 2, channels, pixels)
        w, h, c, got = decode_png(data)
        assert (w, h, c) == (2, 2, channels)
        assert got == pixels


def test_png_decode_sub_and_up_filters():
    """Hand-built IDAT with filter 1 (Sub) then 2 (Up) rows — the
    decoder must undo both predictions exactly."""
    import zlib

    # 2x2 gray: want rows [10, 30] and [15, 40]
    row0 = bytes([1, 10, 20])            # Sub: 10, 10+20=30
    row1 = bytes([2, 5, 10])             # Up:  10+5=15, 30+10=40
    raw = row0 + row1

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (2, 2, 1, [10, 30, 15, 40])


def test_real_decode_through_spark(spark):
    """One real PNG + one real WAV decoded inside the Arrow-batched
    mapInPandas stage — the actual production plumbing, fake=False."""
    png = encode_png(2, 2, 3, [255, 0, 0, 255, 0, 0, 255, 0, 0, 255, 0, 0])  # solid red
    wav = _wav_bytes()
    rows = [
        (1, "image", bytearray(png),
         {"mime": "image/png", "width": 2, "height": 2, "duration_ms": None, "sample_rate": None}),
        (2, "audio", bytearray(wav),
         {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 8, "sample_rate": 8000}),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    feats = {r.asset_id: list(r.features) for r in extract_features(df, fake=False).collect()}

    img = feats[1]  # [w, h, ch, mean_r, mean_g, mean_b, mean, std, ...]
    assert img[0:3] == [2.0, 2.0, 3.0]
    assert img[3] == pytest.approx(1.0)      # red channel saturated
    assert img[4] == img[5] == 0.0           # green/blue empty
    assert img[6] == pytest.approx(1 / 3, abs=1e-3)  # overall mean 255/3/255

    aud = feats[2]  # [rate, n_samples, n_ch, mean, rms, peak, ...]
    assert aud[0:3] == [8000.0, 64.0, 1.0]
    assert aud[3] == pytest.approx(0.0, abs=1e-6)    # symmetric square wave
    assert aud[4] == pytest.approx(0.5, abs=1e-4)    # RMS of +-16384/32768
    assert aud[5] == pytest.approx(0.5, abs=1e-4)


def test_video_garbage_payload_quarantines(spark):
    """An unrecognized video payload hits the documented quarantine
    contract (ValueError), NOT NotImplementedError — video decode is
    real for the AVI(MPNG/MJPG)/bare-MJPEG tiers (operators/video.py)."""
    df = spark.createDataFrame(
        [(3, "video", bytearray(b"\x00" * 16),
          {"mime": "video/mp4", "width": 1, "height": 1, "duration_ms": 1000, "sample_rate": None})],
        ASSET_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        extract_features(df, fake=False).collect()
    msg = str(ei.value)
    assert "ValueError" in msg or "unrecognized video payload" in msg
    assert "NotImplementedError" not in msg


def test_video_mp4_sample_decode_still_stubbed(spark):
    """MP4 *sample* decode is the one disclosed stub tier: a real
    ISO-BMFF payload (encode_minimal_mp4) raises NotImplementedError
    from extract_video_frames — there is no stdlib H.264 codec."""
    from ariadne_dbt_spark.operators.multimodal import encode_minimal_mp4

    mp4 = encode_minimal_mp4(width=640, height=480, duration_ms=2000)
    df = spark.createDataFrame(
        [(4, "video", bytearray(mp4),
          {"mime": "video/mp4", "width": 640, "height": 480, "duration_ms": 2000, "sample_rate": None})],
        ASSET_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        extract_features(df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_mp4_metadata_roundtrip():
    from ariadne_dbt_spark.operators.multimodal import (
        encode_minimal_mp4,
        parse_mp4_metadata,
    )

    m = parse_mp4_metadata(
        encode_minimal_mp4(width=1920, height=1080, duration_ms=123456,
                           timescale=90000, with_audio=True)
    )
    assert m["duration_ms"] == 123456
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["n_tracks"] == 2
    assert (m["n_video_tracks"], m["n_audio_tracks"]) == (1, 1)
    assert m["major_brand"] == "isom"
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_metadata(b"\x00" * 32)


def test_video_metadata_and_probed_meta_through_spark(spark):
    """Real MP4 fixture payloads through the Spark plumbing: box-parsed
    duration/resolution land in video_metadata, a corrupt payload
    yields NULLs (quarantine row, not a dead job), and metadata_stats /
    sample_frames run off the PROBED meta struct."""
    from pyspark.sql import functions as F

    from ariadne_dbt_spark.operators.multimodal import (
        encode_minimal_mp4,
        metadata_stats,
        sample_frames,
        video_metadata,
        with_probed_meta,
    )

    good = encode_minimal_mp4(width=640, height=360, duration_ms=3000)
    rows = [
        (1, "video", bytearray(good),
         {"mime": "video/mp4", "width": None, "height": None,
          "duration_ms": None, "sample_rate": None}),
        (2, "video", bytearray(b"garbage-not-a-real-mp4-payload!!"),
         {"mime": "video/mp4", "width": None, "height": None,
          "duration_ms": None, "sample_rate": None}),
        (3, "image", bytearray(b"\x00" * 8),
         {"mime": "image/png", "width": 4, "height": 4,
          "duration_ms": None, "sample_rate": None}),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)

    meta = {r.asset_id: r for r in video_metadata(df).collect()}
    assert set(meta) == {1, 2}  # image rows never reach the parser
    assert (meta[1].duration_ms, meta[1].width, meta[1].height) == (3000, 640, 360)
    assert meta[1].n_video_tracks == 1
    assert meta[2].duration_ms is None and meta[2].width is None

    probed = with_probed_meta(df)
    stats = {r.kind: r for r in metadata_stats(probed).collect()}
    assert stats["video"].n_assets == 2
    assert stats["video"].avg_duration_ms == 3000.0  # NULL row excluded
    assert stats["image"].n_assets == 1

    frames = sample_frames(probed, every_ms=1000).collect()
    by_asset: dict[int, list[int]] = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r.frame_ts_ms)
    assert sorted(by_asset[1]) == [0, 1000, 2000, 3000]
    assert sorted(by_asset[2]) == [0]  # unprobed duration coalesces to 0


# --- perceptual hashing (dHash) --------------------------------------------


def _ramp_png(width=32, height=32, shift=0):
    from ariadne_dbt_spark.operators.multimodal import encode_png

    # NORMALIZED diagonal ramp (function of x/width, y/height) so the
    # same pattern rendered at any resolution downscales identically
    px = [
        min(255, (x * 160) // width + (y * 80) // height + shift)
        for y in range(height)
        for x in range(width)
    ]
    return encode_png(width, height, 1, px)


def test_dhash_invariances():
    """Re-encode-stability, brightness invariance, resolution
    normalization — the three properties byte-fingerprints lack."""
    import zlib

    from ariadne_dbt_spark.operators.multimodal import dhash_image

    base = _ramp_png()
    assert dhash_image(base) == dhash_image(base)
    # brightness +5 leaves every gradient sign unchanged
    assert dhash_image(_ramp_png(shift=5)) == dhash_image(_ramp_png())
    # same pattern at 2x resolution downscales to the same grid
    big = _ramp_png(width=64, height=64)
    small = _ramp_png(width=32, height=32)
    h_big, h_small = dhash_image(big), dhash_image(small)
    assert bin(h_big ^ h_small).count("1") <= 2


def test_dhash_separates_different_images():
    import hashlib

    from ariadne_dbt_spark.operators.multimodal import dhash_image, encode_png

    def noise_png(seed):
        raw = b"".join(
            hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range(64)
        )  # 1024 bytes
        return encode_png(32, 32, 1, list(raw))

    h1, h2 = dhash_image(noise_png(1)), dhash_image(noise_png(2))
    assert bin(h1 ^ h2).count("1") >= 10


def test_dhash_near_dups_through_spark(spark):
    """Planted pair: the same pixels re-encoded with a different zlib
    level (different BYTES — md5 dedup misses it) pairs up; unrelated
    noise images do not. Undecodable payloads quarantine to NULL."""
    import hashlib
    import struct
    import zlib

    from ariadne_dbt_spark.operators.multimodal import (
        _PNG_MAGIC,
        dhash_near_dups,
        encode_png,
        with_dhash,
    )

    def noise_px(seed):
        return list(b"".join(hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range(64)))

    def reencode(png_bytes, level):
        # decode chunks and recompress IDAT at a different level
        from ariadne_dbt_spark.operators.multimodal import decode_png

        w, h, c, px = decode_png(png_bytes)
        stride = w * c
        raw = b"".join(bytes([0]) + bytes(px[y * stride : (y + 1) * stride]) for y in range(h))

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        return (
            _PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, level))
            + chunk(b"IEND", b"")
        )

    a = encode_png(32, 32, 1, noise_px(1))
    a2 = reencode(a, level=1)
    assert a != a2  # different bytes...
    b = encode_png(32, 32, 1, noise_px(2))
    rows = [(1, bytearray(a)), (2, bytearray(a2)), (3, bytearray(b)), (4, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    hashed = with_dhash(df)
    got = {r["asset_id"]: r["dhash"] for r in hashed.collect()}
    assert got[1] == got[2] and got[4] is None  # ...same perceptual hash
    pairs = dhash_near_dups(hashed).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] == 0


# --- audio fingerprinting ---------------------------------------------------


def _pcm16_wav(samples, rate=8000, nch=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _noise_samples(seed, n=2080):
    import hashlib

    raw = b"".join(hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range(n // 8))
    return list(struct.unpack(f"<{n}h", raw[: n * 2]))


def test_audio_fingerprint_gain_invariance():
    """Half-volume remaster: different bytes, identical fingerprint —
    the property exact/md5 dedup lacks. Unrelated noise is far."""
    from ariadne_dbt_spark.operators.multimodal import audio_fingerprint

    s = _noise_samples(1)
    full = _pcm16_wav(s)
    half = _pcm16_wav([x // 2 for x in s])
    assert full != half
    h_full, h_half = audio_fingerprint(full), audio_fingerprint(half)
    assert bin(h_full ^ h_half).count("1") <= 2
    other = audio_fingerprint(_pcm16_wav(_noise_samples(2)))
    assert bin(h_full ^ other).count("1") >= 10


def test_audio_fingerprint_stereo_mix_and_errors():
    from ariadne_dbt_spark.operators.multimodal import audio_fingerprint

    s = _noise_samples(3)
    mono = _pcm16_wav(s)
    stereo = _pcm16_wav([x for x in s for _ in (0, 1)], nch=2)  # L=R duplicate
    assert audio_fingerprint(mono) == audio_fingerprint(stereo)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        audio_fingerprint(_pcm16_wav(list(range(16))))  # too few samples


def test_audio_near_dups_through_spark(spark):
    from ariadne_dbt_spark.operators.multimodal import (
        dhash_near_dups,
        with_audio_fingerprint,
    )

    s1, s2 = _noise_samples(10), _noise_samples(11)
    rows = [
        (1, bytearray(_pcm16_wav(s1))),
        (2, bytearray(_pcm16_wav([x // 2 for x in s1]))),  # remaster of 1
        (3, bytearray(_pcm16_wav(s2))),
        (4, bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    fp = with_audio_fingerprint(df)
    got = {r["asset_id"]: r["afp"] for r in fp.collect()}
    assert got[4] is None
    pairs = dhash_near_dups(fp, hash_col="afp").collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_decode_tier_labels():
    """Round 8: header-only tier probe covers every documented tier."""
    from ariadne_dbt_spark.operators.multimodal import (
        decode_tier,
        encode_minimal_mp4,
        encode_mp4_mjpeg,
        encode_png,
    )
    from ariadne_dbt_spark.operators.video import encode_avi

    png = encode_png(4, 4, 1, list(range(16)))
    assert decode_tier("image", png) == "png"
    assert decode_tier("image", b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert decode_tier("image", b"GIF89a" + b"\x00" * 10) == "gif"
    assert decode_tier("image", b"???") == "unknown"
    assert decode_tier("audio", _wav_bytes()) == "wav"
    assert decode_tier("audio", b"???") == "unknown"
    avi = encode_avi([png], width=4, height=4, fps=10)
    assert decode_tier("video", avi) == "avi-mpng"
    mp4png = encode_mp4_mjpeg([png], width=4, height=4, fourcc=b"png ")
    assert decode_tier("video", mp4png) == "mp4-png"
    h264 = encode_mp4_mjpeg([b"\x00\x01entropy"], width=4, height=4, fourcc=b"avc1")
    assert decode_tier("video", h264) == "mp4-avc1"
    assert decode_tier("video", encode_minimal_mp4()) == "mp4-metadata"
    assert decode_tier("video", b"\x00" * 32) == "unknown"


def test_decode_coverage_statuses_through_spark(spark):
    """Mixed corpus through the real coverage pass: every status lands
    on the right row and one bad asset never fails the task."""
    from ariadne_dbt_spark.operators.multimodal import (
        decode_coverage,
        encode_mp4_mjpeg,
        encode_png,
    )

    png = encode_png(4, 4, 1, list(range(16)))
    h264 = encode_mp4_mjpeg([b"\x00entropy"], width=4, height=4, fourcc=b"avc1")
    rows = [
        (1, "image", bytearray(png)),
        (2, "audio", bytearray(_wav_bytes())),
        (3, "video", bytearray(h264)),
        (4, "video", bytearray(b"\x00" * 16)),
    ]
    df = spark.createDataFrame(rows, "asset_id long, kind string, payload binary")
    got = {r.asset_id: (r.tier, r.status) for r in decode_coverage(df).collect()}
    assert got[1] == ("png", "decoded")
    assert got[2] == ("wav", "decoded")
    assert got[3] == ("mp4-avc1", "stub")
    assert got[4] == ("unknown", "quarantined")
