"""JPEG/GIF/PNG header probes (operators/multimodal.py): pure-stdlib
metadata extraction + the distributed image_metadata stage."""

from __future__ import annotations

import struct

import pytest

from ariadne_dbt_spark.operators.multimodal import (
    encode_png,
    image_metadata,
    parse_gif_metadata,
    parse_jpeg_metadata,
    probe_image_metadata,
)


def make_jpeg(width: int, height: int, *, progressive: bool = False) -> bytes:
    """Structurally-valid JPEG header stream: SOI, APP0/JFIF, SOF, EOI.
    (No entropy data — the probe only reads segment headers.)"""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(3))
    sof = sof_marker + struct.pack(">HBHHB", 8 + 9, 8, height, width, 3) + comps
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def make_gif(width: int, height: int, *, gct_bits: int = 3) -> bytes:
    packed = 0x80 | (gct_bits - 1)
    return b"GIF89a" + struct.pack("<HH", width, height) + bytes([packed, 0, 0])


def test_jpeg_probe_baseline_and_progressive():
    m = parse_jpeg_metadata(make_jpeg(640, 480))
    assert (m["width"], m["height"], m["n_components"]) == (640, 480, 3)
    assert m["precision"] == 8 and not m["progressive"]
    assert parse_jpeg_metadata(make_jpeg(31, 17, progressive=True))["progressive"]


def test_jpeg_probe_rejects_non_jpeg():
    with pytest.raises(ValueError):
        parse_jpeg_metadata(b"GIF89a" + b"\x00" * 20)
    with pytest.raises(ValueError):
        parse_jpeg_metadata(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_gif_probe():
    m = parse_gif_metadata(make_gif(320, 200, gct_bits=3))
    assert (m["width"], m["height"]) == (320, 200)
    assert m["gct_colors"] == 8 and m["version"] == "89a"
    with pytest.raises(ValueError):
        parse_gif_metadata(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_probe_dispatch_all_three_formats():
    png = encode_png(4, 3, 2, bytes(range(24)))
    assert probe_image_metadata(png) == {
        "format": "png", "width": 4, "height": 3, "n_channels": 2,
    }
    assert probe_image_metadata(make_jpeg(100, 50))["format"] == "jpeg"
    assert probe_image_metadata(make_gif(10, 20))["format"] == "gif"
    with pytest.raises(ValueError):
        probe_image_metadata(b"\x00\x01\x02\x03garbage")


def test_image_metadata_stage_mixed_formats_and_quarantine(spark):
    rows = [
        (1, "image", bytearray(encode_png(8, 8, 3, bytes(192)))),
        (2, "image", bytearray(make_jpeg(640, 480))),
        (3, "image", bytearray(make_gif(320, 200))),
        (4, "image", bytearray(b"not an image at all")),
        (5, "video", bytearray(b"excluded by kind")),
    ]
    df = spark.createDataFrame(rows, "asset_id bigint, kind string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in image_metadata(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["format"], got[1]["width"], got[1]["n_channels"]) == ("png", 8, 3)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 640, 480)
    assert (got[3]["format"], got[3]["n_channels"]) == ("gif", 3)
    assert got[4]["format"] is None and got[4]["width"] is None


def test_truncated_payloads_raise_value_error_not_struct_error():
    """A payload carrying a valid magic but truncated before the fixed
    header offsets must raise ValueError (the quarantine contract) —
    never struct.error/IndexError, which would crash the Spark task."""
    from ariadne_dbt_spark.operators.multimodal import parse_jpeg_metadata

    png_magic = b"\x89PNG\r\n\x1a\n"
    for bad in (
        png_magic,  # magic only
        png_magic + b"\x00" * 10,  # ends inside width/height
        png_magic + b"\x00" * 17,  # payload[25] out of range
    ):
        with pytest.raises(ValueError):
            probe_image_metadata(bad)
    # JPEG SOF declaring seglen < 8, and SOF at the very end of payload
    sof_short = b"\xff\xd8" + b"\xff\xc0" + b"\x00\x04" + b"\x08\x00"
    with pytest.raises(ValueError):
        parse_jpeg_metadata(sof_short)
    sof_trunc = b"\xff\xd8" + b"\xff\xc0" + b"\x00\x11" + b"\x08\x00"
    with pytest.raises(ValueError):
        parse_jpeg_metadata(sof_trunc)


def test_image_metadata_quarantines_truncated_png(spark):
    """End-to-end: a corrupt asset yields the NULL row instead of
    failing the whole job."""
    png_magic = b"\x89PNG\r\n\x1a\n"
    rows = [
        (1, "image", bytearray(encode_png(4, 4, 3, bytes(48)))),
        (2, "image", bytearray(png_magic + b"\x00" * 10)),
    ]
    df = spark.createDataFrame(rows, "asset_id bigint, kind string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in image_metadata(df).collect()}
    assert got[1]["format"] == "png"
    assert got[2]["format"] is None and got[2]["width"] is None
