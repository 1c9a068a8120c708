"""Video frame extraction + perceptual video near-dup
(operators/video.py): AVI round-trip, MJPEG split, frame-hash
invariances (re-encode, brightness), banded pair aggregation,
MP4/garbage quarantine. Closes SURVEY §8.4's video-decode partial."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.multimodal import encode_minimal_mp4, encode_png
from ariadne_dbt_spark.operators.video import (
    decode_frame_pixels,
    encode_avi,
    extract_video_frames,
    parse_avi_metadata,
    sample_frame_indices,
    split_mjpeg_stream,
    video_frame_hashes,
    video_near_dups,
)


def _noise_pixels(seed: str, n: int = 1024, lo: int = 0, hi: int = 200) -> list[int]:
    raw = b"".join(hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range(n // 16))
    return [lo + (b % (hi - lo)) for b in raw[:n]]


def _video(seed: str, n_frames: int = 10, *, level: int = 6, shift: int = 0) -> bytes:
    frames = []
    for i in range(n_frames):
        px = [min(p + shift, 255) for p in _noise_pixels(f"{seed}:frame{i}")]
        frames.append(encode_png(32, 32, 1, px, level=level))
    return encode_avi(frames, width=32, height=32, fps=10)


def test_avi_roundtrip_and_metadata():
    v = _video("a", 7)
    m = parse_avi_metadata(v)
    assert (m["width"], m["height"], m["n_frames"], m["fourcc"]) == (32, 32, 7, "MPNG")
    assert m["fps"] == 10.0 and m["duration_ms"] == 700
    frames = extract_video_frames(v)
    assert len(frames) == 7
    w, h, c, px = decode_frame_pixels(frames[3])
    assert (w, h, c) == (32, 32, 1) and len(px) == 1024


def test_mjpeg_stream_split():
    import struct

    def jpeg(wd):
        return (
            b"\xff\xd8\xff\xc0"
            + struct.pack(">HBHHB", 11, 8, 8, wd, 1)
            + b"\x00" * 4
            + b"\xff\xd9"
        )

    frames = split_mjpeg_stream(jpeg(8) + jpeg(16) + jpeg(24))
    assert len(frames) == 3
    assert extract_video_frames(jpeg(8) + jpeg(16)) == frames[:2]
    with pytest.raises(ValueError):
        split_mjpeg_stream(b"\x00notajpegstream")


def test_mp4_frames_not_implemented_and_garbage_value_error():
    with pytest.raises(NotImplementedError):
        extract_video_frames(encode_minimal_mp4())
    with pytest.raises(ValueError):
        extract_video_frames(b"definitely not video")


def test_sample_frame_indices_deterministic():
    assert sample_frame_indices(12, 8) == [0, 1, 3, 4, 6, 7, 9, 10]
    assert sample_frame_indices(3, 8) == [0, 1, 2]
    assert sample_frame_indices(0, 8) == []


def test_frame_hashes_invariant_to_reencode_and_brightness(spark):
    rows = [
        (1, bytearray(_video("x"))),
        (2, bytearray(_video("x", level=1))),  # re-encode: new bytes, same pixels
        (3, bytearray(_video("x", shift=20))),  # brightness: gradient signs keep
        (4, bytearray(_video("y"))),  # different content
    ]
    assert rows[0][1] != rows[1][1]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    fh = video_frame_hashes(df).collect()
    by_vid = {}
    for r in fh:
        by_vid.setdefault(r["asset_id"], {})[r["frame_idx"]] = r["dhash"]
    assert by_vid[1] == by_vid[2] == by_vid[3]
    assert by_vid[1] != by_vid[4]


def test_video_near_dups_pairs_clones_not_strangers(spark):
    rows = [
        (1, bytearray(_video("x"))),
        (2, bytearray(_video("x", level=1))),
        (3, bytearray(_video("y"))),
        (4, bytearray(_video("z"))),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = video_near_dups(video_frame_hashes(df)).collect()
    assert [(r["id_a"], r["id_b"], r["frac_matched"]) for r in pairs] == [(1, 2, 1.0)]


def test_video_near_dups_trimmed_copy_pairs(spark):
    """A trimmed copy (first 6 of 10 frames, re-encoded) still pairs:
    coverage is measured against the smaller side's sampled frames."""
    full_frames = [
        encode_png(32, 32, 1, _noise_pixels(f"t:frame{i}")) for i in range(10)
    ]
    full = encode_avi(full_frames, width=32, height=32, fps=10)
    trimmed = encode_avi(
        [f for f in full_frames[:6]], width=32, height=32, fps=10
    )
    df = spark.createDataFrame(
        [(1, bytearray(full)), (2, bytearray(trimmed))],
        "asset_id long, payload binary",
    )
    pairs = video_near_dups(video_frame_hashes(df)).collect()
    assert len(pairs) == 1 and pairs[0]["id_a"] == 1 and pairs[0]["id_b"] == 2
    # trimmed side samples all 6 frames; 5 of them (0,1,2,3,5) land on
    # the full side's uniform 8-of-10 grid → coverage 5/6
    assert pairs[0]["frac_matched"] == round(5 / 6, 6)


def test_undecodable_video_quarantined_not_crashing(spark):
    rows = [
        (1, bytearray(_video("x"))),
        (2, bytearray(encode_minimal_mp4())),  # parses as MP4, no sample codec
        (3, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    fh = video_frame_hashes(df)
    got = {r["asset_id"]: r for r in fh.where(F.col("dhash").isNull()).collect()}
    assert set(got) == {2, 3}
    assert fh.where(F.col("dhash").isNotNull()).count() == 8
    # quarantine rows don't poison the pair stage
    assert video_near_dups(fh).count() == 0


def test_real_features_video_tier(spark):
    """extract_features(fake=False) no longer raises for the AVI tier."""
    from ariadne_dbt_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, "video", bytearray(_video("x", 5)), None)],
        "asset_id long, kind string, payload binary, meta struct<mime:string>",
    ).drop("meta")
    out = extract_features(df, fake=False).collect()
    assert len(out) == 1
    feats = out[0]["features"]
    assert feats[0] == 32.0 and feats[1] == 32.0 and feats[2] == 5.0


# -- MJPEG/PNG-in-MP4 sample extraction (round 7: stsz/stsc/stco walk) --------


def _mp4_png_video(seed: str, n_frames: int = 6, *, shift: int = 0) -> bytes:
    from ariadne_dbt_spark.operators.multimodal import encode_mp4_mjpeg

    frames = []
    for i in range(n_frames):
        px = [min(p + shift, 255) for p in _noise_pixels(f"{seed}:frame{i}")]
        frames.append(encode_png(32, 32, 1, px))
    return encode_mp4_mjpeg(frames, width=32, height=32, fourcc=b"png ")


def test_mp4_sample_table_roundtrip():
    from ariadne_dbt_spark.operators.multimodal import (
        encode_mp4_mjpeg,
        extract_mp4_samples,
        parse_mp4_metadata,
    )

    frames = [
        encode_png(32, 32, 1, _noise_pixels(f"s:{i}")) for i in range(5)
    ]
    mp4 = encode_mp4_mjpeg(frames, width=32, height=32, fps=10, fourcc=b"png ")
    fourcc, samples = extract_mp4_samples(mp4)
    assert fourcc == b"png " and samples == frames
    # the box structure stays parseable by the metadata tier too
    m = parse_mp4_metadata(mp4)
    assert (m["width"], m["height"], m["n_video_tracks"]) == (32, 32, 1)
    with pytest.raises(ValueError):
        extract_mp4_samples(b"\x00" * 64)
    # metadata-only MP4s (no stbl) stay the disclosed stub tier
    with pytest.raises(NotImplementedError):
        extract_mp4_samples(encode_minimal_mp4())


def test_mp4_png_samples_decode_end_to_end():
    v = _mp4_png_video("mp4src")
    frames = extract_video_frames(v)
    assert len(frames) == 6
    w, h, c, px = decode_frame_pixels(frames[0])
    assert (w, h, c) == (32, 32, 1)


def test_mp4_h264_fourcc_still_not_implemented():
    from ariadne_dbt_spark.operators.multimodal import encode_mp4_mjpeg

    fake_h264 = encode_mp4_mjpeg(
        [b"\x00\x00\x00\x01\x67entropy"], width=16, height=16, fourcc=b"avc1"
    )
    with pytest.raises(NotImplementedError, match="avc1"):
        extract_video_frames(fake_h264)


def test_mp4_video_near_dup_pairs_through_spark(spark):
    """An MP4 clone (same frames, re-boxed) pairs with its AVI original:
    the near-dup recipe is container-agnostic once frames extract."""
    avi_frames = [
        encode_png(32, 32, 1, _noise_pixels(f"xc:{i}")) for i in range(6)
    ]
    avi = encode_avi(avi_frames, width=32, height=32, fps=10)
    from ariadne_dbt_spark.operators.multimodal import encode_mp4_mjpeg

    mp4 = encode_mp4_mjpeg(avi_frames, width=32, height=32, fourcc=b"png ")
    stranger = _mp4_png_video("unrelated")
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(mp4)), (3, bytearray(stranger))],
        "asset_id bigint, payload binary",
    )
    hashes = video_frame_hashes(df, frames_per_video=6)
    pairs = {
        (r.id_a, r.id_b)
        for r in video_near_dups(hashes, min_match_frac=0.8).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_mp4_hostile_sample_tables_quarantine_not_crash():
    """Round 8 (ADVICE): truncated/hostile stsz/stsc/stco count fields
    must raise ValueError (the quarantine contract), never struct.error
    or a giant allocation."""
    import struct as _s

    from ariadne_dbt_spark.operators.multimodal import (
        encode_mp4_mjpeg,
        extract_mp4_samples,
    )

    frames = [encode_png(16, 16, 1, _noise_pixels(f"h:{i}")) for i in range(3)]
    good = encode_mp4_mjpeg(frames, width=16, height=16, fourcc=b"png ")

    def corrupt_count(payload: bytes, box: bytes, count_off: int, value: int) -> bytes:
        i = payload.find(box)
        assert i > 0
        at = i + 4 + count_off  # box type + offset to count field
        return payload[:at] + _s.pack(">I", value) + payload[at + 4 :]

    # stsz non-uniform: claim 1M entries the box can't hold
    bad_stsz = corrupt_count(good, b"stsz", 8, 1_000_000)
    with pytest.raises(ValueError, match="stsz"):
        extract_mp4_samples(bad_stsz)

    # stco: claim more chunk offsets than the box holds
    bad_stco = corrupt_count(good, b"stco", 4, 1_000_000)
    with pytest.raises(ValueError, match="stco"):
        extract_mp4_samples(bad_stco)

    # stsc: entry count past the box end
    bad_stsc = corrupt_count(good, b"stsc", 4, 1_000_000)
    with pytest.raises(ValueError, match="stsc"):
        extract_mp4_samples(bad_stsc)

    # uniform stsz whose total exceeds the file: 2^31 samples of 64 bytes
    i = good.find(b"stsz")
    at = i + 4 + 4  # uniform field
    huge_uniform = (
        good[:at] + _s.pack(">II", 64, 2**31 - 1) + good[at + 8 :]
    )
    with pytest.raises(ValueError, match="uniform"):
        extract_mp4_samples(huge_uniform)

    # the good file still round-trips after all that slicing logic
    fourcc, samples = extract_mp4_samples(good)
    assert fourcc == b"png " and samples == frames


def test_mp4_hostile_table_raises_valueerror_through_spark(spark):
    """extract_features(fake=False) is the STRICT path — its documented
    quarantine signal is ValueError. A hostile stsz count must surface
    as ValueError through the Spark task, never struct.error (which
    per-row quarantine layers don't catch as a decode failure)."""
    import struct as _s

    import pytest

    from ariadne_dbt_spark.operators.multimodal import (
        encode_mp4_mjpeg,
        extract_features,
    )

    frames = [encode_png(16, 16, 1, _noise_pixels(f"q:{i}")) for i in range(3)]
    good = encode_mp4_mjpeg(frames, width=16, height=16, fourcc=b"png ")
    i = good.find(b"stsz")
    bad = good[: i + 12] + _s.pack(">I", 1_000_000) + good[i + 16 :]
    df = spark.createDataFrame(
        [(2, "video", bad)], "asset_id long, kind string, payload binary"
    )
    with pytest.raises(Exception) as ei:
        extract_features(df, fake=False).collect()
    msg = str(ei.value)
    assert "ValueError" in msg and "malformed MP4" in msg
    assert "MemoryError" not in msg
