"""Multimodal plumbing + REAL stdlib image decode (PNG full pixel decode,
JPEG/GIF header dims)."""

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from ai_data_matching_spark.functions.png import (
    decode_png,
    encode_png,
    gif_dimensions,
    jpeg_dimensions,
    png_dimensions,
)
from ai_data_matching_spark.operators.multimodal import (
    decode_image_dims,
    extract_image_stats,
    extract_media_metadata,
    frame_sample_plan,
    sniff_media_type,
)


def _pixels(w, h, nch, seed=0):
    return bytes((seed + y * 131 + x * 17 + c * 59) % 256
                 for y in range(h) for x in range(w) for c in range(nch))


def _jpeg_bytes(w, h):
    # minimal structurally-valid JPEG prefix: SOI + APP0 + SOF0 header
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _gif_bytes(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 20


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, encode_png(6, 5, _pixels(6, 5, 3), 3)),
        (2, _jpeg_bytes(640, 480)),
        (3, b"RIFF" + b"\x00" * 64000),
        (4, b"\x1aE\xdf\xa3" + b"\x00" * 320000),
        (5, None),
        (6, b"plain text bytes"),
        (7, b"\x89PNG\r\n\x1a\n" + b"\x00" * 100),  # PNG magic, corrupt body
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


# -- codec round trips ------------------------------------------------------

@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_png_roundtrip_all_channels(nch):
    w, h = 7, 11  # ≥5 rows → default filter cycle hits all five types
    px = _pixels(w, h, nch, seed=nch * 37)
    data = encode_png(w, h, px, nch)
    gw, gh, gn, got = decode_png(data)
    assert (gw, gh, gn) == (w, h, nch)
    assert got == px


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(ft):
    w, h = 9, 4
    px = _pixels(w, h, 3, seed=ft)
    data = encode_png(w, h, px, 3, filter_per_row=lambda y: ft)
    assert decode_png(data)[3] == px


def test_png_header_dims_match_full_decode():
    data = encode_png(13, 3, _pixels(13, 3, 3), 3)
    assert png_dimensions(data) == (13, 3)


def test_png_rejects_corrupt():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 50)
    good = encode_png(4, 4, _pixels(4, 4, 3), 3)
    # flip a byte inside the IDAT zlib stream → inflate/unfilter must fail
    bad = bytearray(good)
    bad[45] ^= 0xFF
    with pytest.raises((ValueError, zlib.error)):
        decode_png(bytes(bad))


def test_jpeg_gif_header_dims():
    assert jpeg_dimensions(_jpeg_bytes(640, 480)) == (640, 480)
    assert gif_dimensions(_gif_bytes(320, 200)) == (320, 200)
    assert decode_image_dims(_jpeg_bytes(8, 2)) == (8, 2)
    with pytest.raises(ValueError):
        decode_image_dims(b"not an image")


# -- Spark-side plumbing ----------------------------------------------------

def test_sniff():
    assert sniff_media_type(b"\x89PNGxxxx") == "image/png"
    assert sniff_media_type(b"\xff\xd8\xff\xdb") == "image/jpeg"
    assert sniff_media_type(None) == "unknown"
    assert sniff_media_type(b"whatever") == "application/octet-stream"


def test_metadata_schema_and_values(media):
    meta = extract_media_metadata(media)
    rows = {r["id"]: r for r in meta.collect()}
    assert set(meta.columns) == {
        "id", "media_type", "n_bytes", "magic",
        "width", "height", "duration_ms", "decode_error",
    }
    # REAL decoded dims, not fakes
    assert (rows[1]["width"], rows[1]["height"]) == (6, 5)
    assert (rows[2]["width"], rows[2]["height"]) == (640, 480)
    assert rows[3]["media_type"] == "audio/wav" and rows[3]["duration_ms"] > 0
    assert rows[4]["media_type"] == "video/webm"
    assert rows[5]["media_type"] == "unknown" and rows[5]["n_bytes"] == 0
    assert rows[6]["media_type"] == "application/octet-stream"
    # corrupt image → NULL dims + visible flag, not a crash or a fake
    assert rows[7]["width"] is None and rows[7]["decode_error"] is True
    assert rows[1]["decode_error"] is False


def test_image_stats_real_pixels(media):
    stats = {r["id"]: r for r in extract_image_stats(media).collect()}
    px = _pixels(6, 5, 3)
    assert stats[1]["pixel_sum"] == sum(px)
    assert stats[1]["pixel_mean"] == pytest.approx(sum(px) / len(px))
    assert stats[1]["n_channels"] == 3
    assert stats[7]["decode_error"] is True and stats[7]["pixel_sum"] is None


def test_frame_sample_plan(media):
    meta = extract_media_metadata(media)
    plan = frame_sample_plan(meta, every_ms=5000)
    frames = plan.filter(F.col("id") == 4).count()
    dur = {r["id"]: r["duration_ms"] for r in meta.collect()}[4]
    assert frames == dur // 5000 + 1
