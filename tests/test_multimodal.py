"""Multimodal plumbing: schema, batch shape, magic sniffing, stub contract."""

import pytest
from pyspark.sql import functions as F

from ai_data_matching_spark.operators.multimodal import (
    decode_image_stub,
    extract_media_metadata,
    frame_sample_plan,
    sniff_media_type,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"\x11" * 400),
        (3, b"RIFF" + b"\x00" * 64000),
        (4, b"\x1aE\xdf\xa3" + b"\x00" * 320000),
        (5, None),
        (6, b"plain text bytes"),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_sniff():
    assert sniff_media_type(b"\x89PNGxxxx") == "image/png"
    assert sniff_media_type(b"\xff\xd8\xff\xdb") == "image/jpeg"
    assert sniff_media_type(None) == "unknown"
    assert sniff_media_type(b"whatever") == "application/octet-stream"


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")


def test_metadata_schema_and_values(media):
    meta = extract_media_metadata(media)
    rows = {r["id"]: r for r in meta.collect()}
    assert set(meta.columns) == {
        "id", "media_type", "n_bytes", "magic", "width", "height", "duration_ms",
    }
    assert rows[1]["media_type"] == "image/png" and rows[1]["width"] > 0
    assert rows[2]["media_type"] == "image/jpeg" and rows[2]["height"] > 0
    assert rows[3]["media_type"] == "audio/wav" and rows[3]["duration_ms"] > 0
    assert rows[4]["media_type"] == "video/webm"
    assert rows[5]["media_type"] == "unknown" and rows[5]["n_bytes"] == 0
    assert rows[6]["media_type"] == "application/octet-stream"
    # deterministic fake decode
    again = {r["id"]: r for r in extract_media_metadata(media).collect()}
    assert again[1]["width"] == rows[1]["width"]


def test_frame_sample_plan(media):
    meta = extract_media_metadata(media)
    plan = frame_sample_plan(meta, every_ms=5000)
    frames = plan.filter(F.col("id") == 4).count()
    dur = {r["id"]: r["duration_ms"] for r in meta.collect()}[4]
    assert frames == dur // 5000 + 1
