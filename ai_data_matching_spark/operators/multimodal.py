"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

Every emitted value is REAL or NULL — never an estimate: PNG is fully
decoded (zlib inflate + all five scanline unfilters — ``functions/png.py``),
JPEG/GIF dimensions come from their public header layouts, WAV and AVI
durations are parsed exactly from the RIFF fmt/data and avih headers
(``functions/riff.py``), and mp3 duration comes from an exact MPEG
frame-header walk (``functions/mpeg.py`` — CBR and explicit-bitrate VBR
alike). Formats whose duration genuinely needs a codec walk (webm EBML,
free-format mp3 bitrate) emit NULL duration plus a ``codec_required``
flag; a corrupt payload yields NULL fields plus ``decode_error`` —
never a crash, never a fake value.

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

from ..functions import mpeg as _mpeg
from ..functions import png as _png
from ..functions import riff as _riff


def _opt_id(v) -> int | None:
    """Nullable-long id from a pandas cell: a NULL id row must flow through
    as NULL, not crash the task — the module's corrupt-input discipline
    (pandas renders a nullable long batch column as float64 with NaN)."""
    return None if pd.isna(v) else int(v)


MEDIA_META_SCHEMA = (
    "id long, media_type string, n_bytes long, magic string, "
    "width int, height int, duration_ms long, "
    "decode_error boolean, codec_required boolean"
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"ID3": "audio/mp3",
    b"\x1aE\xdf\xa3": "video/webm",
}

_RIFF_FORMS = {"WAVE": "audio/wav", "AVI ": "video/avi"}


def sniff_media_type(payload: bytes | None) -> str:
    if not payload:
        return "unknown"
    if payload.startswith(b"RIFF"):
        # form-type aware: RIFF is a container, not a format
        try:
            return _RIFF_FORMS.get(_riff.riff_form_type(payload), "application/riff")
        except ValueError:
            return "application/octet-stream"
    for magic, mtype in _MAGIC.items():
        if payload.startswith(magic):
            return mtype
    # bare MPEG audio (no ID3 prefix): 11-bit frame sync + non-reserved
    # version/layer fields — the public mp3 header layout
    if (
        len(payload) >= 2
        and payload[0] == 0xFF
        and payload[1] & 0xE0 == 0xE0
        and payload[1] & 0x18 != 0x08  # version not reserved
        and payload[1] & 0x06 != 0x00  # layer not reserved
    ):
        return "audio/mp3"
    return "application/octet-stream"


def decode_image_dims(payload: bytes) -> tuple[int, int]:
    """Real image dimensions from the payload, stdlib only: PNG IHDR,
    JPEG SOF scan, GIF screen descriptor. Raises ValueError on anything
    corrupt or unsupported (callers surface that as NULL + flag)."""
    if payload.startswith(b"\x89PNG"):
        return _png.png_dimensions(payload)
    if payload.startswith(b"\xff\xd8\xff"):
        return _png.jpeg_dimensions(payload)
    if payload.startswith(b"GIF8"):
        return _png.gif_dimensions(payload)
    raise ValueError("unsupported image format")


def decode_image_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode — PNG only (the one stdlib-decodable format):
    (width, height, n_channels, raw pixel bytes)."""
    return _png.decode_png(payload)


def extract_media_metadata(
    media: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas metadata extractor over (id, payload:binary).

    Arrow batches stream per partition; output drops the payload (late
    materialization — re-join on id to fetch bytes when needed). Image
    dims come from real header parses; a failed parse leaves dims NULL
    and sets ``decode_error`` (visible, never silent, never fake).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                mtype = sniff_media_type(data)
                width = height = None
                duration = None
                err = False
                codec = False
                if mtype.startswith("image/"):
                    try:
                        width, height = decode_image_dims(data)
                    except ValueError:
                        err = True
                elif mtype == "audio/wav":
                    try:
                        duration = _riff.wav_duration_ms(data)
                    except ValueError:
                        err = True
                elif mtype == "video/avi":
                    try:
                        duration = _riff.avi_duration_ms(data)
                    except ValueError:
                        err = True
                elif mtype == "audio/mp3":
                    # exact duration from the MPEG frame-header walk
                    # (functions/mpeg.py) — CBR and explicit-bitrate VBR
                    # alike; only free-format bitrate genuinely needs a
                    # codec-level sync scan → codec_required, and a
                    # corrupt stream → decode_error. Never a guess.
                    try:
                        duration = _mpeg.mp3_duration_ms(data)
                    except _mpeg.CodecWalkRequired:
                        codec = True
                    except ValueError:
                        err = True
                elif mtype.startswith(("audio/", "video/")):
                    # webm duration needs an EBML/codec walk the container
                    # doesn't ship: NULL + flag, never a guess
                    codec = True
                out.append(
                    dict(
                        id=_opt_id(_id),
                        media_type=mtype,
                        n_bytes=len(data),
                        magic=data[:4].hex(),
                        width=width,
                        height=height,
                        duration_ms=duration,
                        decode_error=err,
                        codec_required=codec,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "id", "media_type", "n_bytes", "magic",
                    "width", "height", "duration_ms",
                    "decode_error", "codec_required",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(op, schema=MEDIA_META_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "id long, width int, height int, n_channels int, "
    "pixel_sum long, pixel_mean double, decode_error boolean"
)


def extract_image_stats(
    media: DataFrame, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Full-decode feature extraction: per-image pixel statistics from a
    REAL PNG decode (zlib inflate + unfilter) inside ``mapInPandas`` —
    the decoded-pixels analog of the metadata projection above. Rows
    whose payload fails to decode carry NULL stats + decode_error=true."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    w, h, nch, px = _png.decode_png(data)
                    s = sum(px)
                    out.append(dict(
                        id=_opt_id(_id), width=w, height=h, n_channels=nch,
                        pixel_sum=s, pixel_mean=s / len(px) if px else 0.0,
                        decode_error=False,
                    ))
                except ValueError:
                    out.append(dict(
                        id=_opt_id(_id), width=None, height=None, n_channels=None,
                        pixel_sum=None, pixel_mean=None, decode_error=True,
                    ))
            yield pd.DataFrame(
                out,
                columns=[
                    "id", "width", "height", "n_channels",
                    "pixel_sum", "pixel_mean", "decode_error",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(op, schema=IMAGE_STATS_SCHEMA)


def frame_sample_plan(media_meta: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Native planning op: expand each video row into frame-sample
    timestamps (the decode of each frame is the stubbed step). Shows the
    explode-side shape a real frame pipeline would use. Videos whose
    duration could not be parsed (codec_required / decode_error → NULL)
    are excluded rather than guessed at."""
    vids = media_meta.filter(
        F.col("media_type").startswith("video/") & F.col("duration_ms").isNotNull()
    )
    return vids.select(
        "id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
