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
from ai_data_matching_spark.functions.riff import (
    avi_duration_ms,
    encode_avi_header,
    encode_wav,
    wav_duration_ms,
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
        # 8 kHz mono 16-bit, 16000 PCM bytes → byte rate 16000 → exactly 1000 ms
        (3, encode_wav(8000, 1, 16, b"\x00" * 16000)),
        (4, b"\x1aE\xdf\xa3" + b"\x00" * 320000),  # webm: duration needs EBML walk
        (5, None),
        (6, b"plain text bytes"),
        (7, b"\x89PNG\r\n\x1a\n" + b"\x00" * 100),  # PNG magic, corrupt body
        # 40 ms/frame × 250 frames → exactly 10000 ms
        (8, encode_avi_header(40000, 250)),
        (9, b"RIFF" + b"\x00" * 64),  # RIFF magic, corrupt container
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
    # RIFF is a container: the form type decides the media type
    assert sniff_media_type(encode_wav(8000, 1, 16, b"\x00" * 16)) == "audio/wav"
    assert sniff_media_type(encode_avi_header(40000, 1)) == "video/avi"
    assert sniff_media_type(b"RIFF\x10\x00\x00\x00JUNK") == "application/riff"
    assert sniff_media_type(b"RIFF\x00\x00") == "application/octet-stream"


def test_wav_duration_exact():
    # 44.1 kHz stereo 16-bit → byte rate 176400; 88200 bytes → 500 ms
    assert wav_duration_ms(encode_wav(44100, 2, 16, b"\x00" * 88200)) == 500
    # odd-size data chunk is word-padded but duration uses the declared size
    assert wav_duration_ms(encode_wav(1000, 1, 8, b"\x00" * 333)) == 333
    with pytest.raises(ValueError):
        wav_duration_ms(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data chunks
    with pytest.raises(ValueError):
        wav_duration_ms(encode_avi_header(40000, 1))  # wrong form type
    # zero byte rate must refuse, not divide
    bad = bytearray(encode_wav(8000, 1, 16, b"\x00" * 16))
    bad[28:32] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        wav_duration_ms(bytes(bad))


def test_avi_duration_exact():
    assert avi_duration_ms(encode_avi_header(33333, 300)) == 33333 * 300 // 1000
    with pytest.raises(ValueError):
        avi_duration_ms(b"RIFF\x04\x00\x00\x00AVI ")  # no hdrl/avih
    with pytest.raises(ValueError):
        avi_duration_ms(encode_avi_header(0, 300))  # zero frame period


def test_mp3_duration_exact_cbr():
    from ai_data_matching_spark.functions.mpeg import encode_mp3_cbr, mp3_duration_ms

    # MPEG1 Layer III @44.1 kHz: 1152 samples/frame
    for n, br in [(1, 128), (38, 64), (100, 192), (7, 320)]:
        data = encode_mp3_cbr(n, bitrate_kbps=br)
        assert mp3_duration_ms(data) == n * 1152 * 1000 // 44100, (n, br)
    # 32 kHz variant
    data = encode_mp3_cbr(25, bitrate_kbps=96, sample_rate=32000)
    assert mp3_duration_ms(data) == 25 * 1152 * 1000 // 32000


def test_mp3_vbr_and_tag_handling():
    from ai_data_matching_spark.functions.mpeg import encode_mp3_cbr, mp3_duration_ms

    # explicit-bitrate VBR: concatenated frames at different bitrates walk
    # exactly (duration depends only on frame count × samples)
    vbr = encode_mp3_cbr(3, 64) + encode_mp3_cbr(2, 192) + encode_mp3_cbr(5, 128)
    assert mp3_duration_ms(vbr) == 10 * 1152 * 1000 // 44100
    # ID3v2 prefix (syncsafe size) and ID3v1 trailer are skipped
    body = encode_mp3_cbr(10, 128)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 5]) + b"\x00" * ((1 << 7) + 5)
    id3v1 = b"TAG" + b"\x00" * 125
    assert mp3_duration_ms(id3v2 + body + id3v1) == 10 * 1152 * 1000 // 44100


def test_mp3_refusals():
    import struct as _s

    from ai_data_matching_spark.functions.mpeg import (
        CodecWalkRequired,
        encode_mp3_cbr,
        mp3_duration_ms,
    )

    good = encode_mp3_cbr(4, 128)
    # truncated final frame → corrupt, not an estimate
    with pytest.raises(ValueError):
        mp3_duration_ms(good[:-10])
    # garbage between frames → lost sync
    with pytest.raises(ValueError):
        mp3_duration_ms(good + b"junk")
    # free-format bitrate (index 0) → codec walk required, distinct from corrupt
    hdr = int.from_bytes(good[:4], "big") & ~(0xF << 12)
    free = _s.pack(">I", hdr) + good[4:]
    with pytest.raises(CodecWalkRequired):
        mp3_duration_ms(free)
    with pytest.raises(ValueError):
        mp3_duration_ms(b"")


def test_mp3_metadata_extraction(spark):
    from ai_data_matching_spark.functions.mpeg import encode_mp3_cbr

    good = encode_mp3_cbr(20, 160)
    hdr = int.from_bytes(good[:4], "big") & ~(0xF << 12)  # free-format
    free = hdr.to_bytes(4, "big") + good[4:]
    df = spark.createDataFrame(
        [(1, good), (2, free), (3, good[:-5]), (4, b"ID3\x00\x00\x00" + b"\xff" * 8)],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in extract_media_metadata(df).collect()}
    assert rows[1]["media_type"] == "audio/mp3"
    assert rows[1]["duration_ms"] == 20 * 1152 * 1000 // 44100
    assert rows[1]["decode_error"] is False and rows[1]["codec_required"] is False
    # free-format → honest codec_required, NULL duration
    assert rows[2]["duration_ms"] is None and rows[2]["codec_required"] is True
    assert rows[2]["decode_error"] is False
    # truncated → decode_error
    assert rows[3]["duration_ms"] is None and rows[3]["decode_error"] is True
    # ID3 magic but unparseable body → decode_error, never a crash
    assert rows[4]["media_type"] == "audio/mp3"
    assert rows[4]["duration_ms"] is None and rows[4]["decode_error"] is True
    # bare frame-sync sniff (no ID3 prefix)
    assert sniff_media_type(good) == "audio/mp3"


def test_metadata_schema_and_values(media):
    meta = extract_media_metadata(media)
    rows = {r["id"]: r for r in meta.collect()}
    assert set(meta.columns) == {
        "id", "media_type", "n_bytes", "magic",
        "width", "height", "duration_ms", "decode_error", "codec_required",
    }
    # REAL decoded dims, not fakes
    assert (rows[1]["width"], rows[1]["height"]) == (6, 5)
    assert (rows[2]["width"], rows[2]["height"]) == (640, 480)
    # REAL parsed durations: exact values from the RIFF headers
    assert rows[3]["media_type"] == "audio/wav" and rows[3]["duration_ms"] == 1000
    assert rows[8]["media_type"] == "video/avi" and rows[8]["duration_ms"] == 10000
    # codec-needing formats: NULL + visible flag, never an estimate
    assert rows[4]["media_type"] == "video/webm"
    assert rows[4]["duration_ms"] is None and rows[4]["codec_required"] is True
    assert rows[4]["decode_error"] is False
    assert rows[5]["media_type"] == "unknown" and rows[5]["n_bytes"] == 0
    assert rows[6]["media_type"] == "application/octet-stream"
    # corrupt image → NULL dims + visible flag, not a crash or a fake
    assert rows[7]["width"] is None and rows[7]["decode_error"] is True
    assert rows[1]["decode_error"] is False
    assert rows[9]["media_type"] == "application/riff"
    assert rows[3]["codec_required"] is False and rows[3]["decode_error"] is False


def test_image_stats_real_pixels(media):
    stats = {r["id"]: r for r in extract_image_stats(media).collect()}
    px = _pixels(6, 5, 3)
    assert stats[1]["pixel_sum"] == sum(px)
    assert stats[1]["pixel_mean"] == pytest.approx(sum(px) / len(px))
    assert stats[1]["n_channels"] == 3
    assert stats[7]["decode_error"] is True and stats[7]["pixel_sum"] is None


def test_frame_sample_plan(media):
    meta = extract_media_metadata(media)
    plan = frame_sample_plan(meta, every_ms=5000).collect()
    by_id = {}
    for r in plan:
        by_id.setdefault(r["id"], []).append(r["frame_ts_ms"])
    # AVI with a REAL parsed 10000 ms duration → frames at 0/5000/10000
    assert sorted(by_id[8]) == [0, 5000, 10000]
    # webm duration is unparseable without a codec → excluded, not guessed
    assert 4 not in by_id


def test_metadata_null_id_flows_through(spark):
    """A NULL id row must emit a NULL-id metadata row, not crash the task
    (regression: int(NaN) raised inside mapInPandas)."""
    df = spark.createDataFrame(
        [(None, b"\x89PNG bogus"), (11, None)], "id long, payload binary"
    )
    rows = sorted(
        extract_media_metadata(df).collect(), key=lambda r: (r["id"] is None, r["id"] or 0)
    )
    assert rows[0]["id"] == 11 and rows[0]["media_type"] == "unknown"
    assert rows[1]["id"] is None and rows[1]["decode_error"] is True
    stats = extract_image_stats(df).collect()
    assert {r["id"] for r in stats} == {None, 11}
    assert all(r["decode_error"] for r in stats)
