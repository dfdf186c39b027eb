"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container — see ``decode_image_stub``); everything Spark-side is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` partitioning, and
the deterministic fake feature extractor used to exercise the plumbing.

Design for 100 TB: binary payloads never shuffle — metadata extraction is
a narrow projection; downstream joins/gathers operate on (id, metadata)
with payloads re-fetched by id from the source table (late
materialization).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id long, media_type string, n_bytes long, magic string, "
    "width int, height int, duration_ms long"
)

_MAGIC = {
    b"\x89PNG": ("image/png", True),
    b"\xff\xd8\xff": ("image/jpeg", True),
    b"GIF8": ("image/gif", True),
    b"RIFF": ("audio/wav", False),
    b"ID3": ("audio/mp3", False),
    b"\x1aE\xdf\xa3": ("video/webm", False),
}


def sniff_media_type(payload: bytes | None) -> str:
    if not payload:
        return "unknown"
    for magic, (mtype, _img) in _MAGIC.items():
        if payload.startswith(magic):
            return mtype
    return "application/octet-stream"


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: real image decode needs Pillow/libvips (absent here).

    Raises NotImplementedError by contract; the pipeline substitutes
    ``_fake_dims`` (deterministic from bytes) in tests so the Spark-side
    plumbing is fully exercised.
    """
    raise NotImplementedError("image decode requires an imaging library (not in this container)")


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dims derived from payload hash."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0xFFFFFFFF
    return 16 + h % 1024, 16 + (h >> 10) % 1024


def extract_media_metadata(
    media: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    use_fake_decode: bool = True,
) -> DataFrame:
    """mapInPandas metadata extractor over (id, payload:binary).

    Arrow batches stream per partition; output drops the payload (late
    materialization — re-join on id to fetch bytes when needed).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                mtype = sniff_media_type(data)
                width = height = None
                duration = None
                if mtype.startswith("image/"):
                    if use_fake_decode:
                        width, height = _fake_dims(data)
                    else:
                        width, height = decode_image_stub(data)
                elif mtype.startswith(("audio/", "video/")):
                    duration = len(data) * 8 // 128  # fake: bytes at 128 kbit/s
                out.append(
                    dict(
                        id=int(_id),
                        media_type=mtype,
                        n_bytes=len(data),
                        magic=data[:4].hex(),
                        width=width,
                        height=height,
                        duration_ms=duration,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "id", "media_type", "n_bytes", "magic", "width", "height", "duration_ms",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(op, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(media_meta: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Native planning op: expand each video row into frame-sample
    timestamps (the decode of each frame is the stubbed step). Shows the
    explode-side shape a real frame pipeline would use."""
    vids = media_meta.filter(F.col("media_type").startswith("video/"))
    return vids.select(
        "id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
