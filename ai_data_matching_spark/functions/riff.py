"""Stdlib RIFF container parsing: exact WAV and AVI durations from the
public header layouts (no codec, no estimate).

WAV: duration follows exactly from the ``fmt `` chunk's byte-rate plus the
``data`` chunk's payload size (Microsoft/IBM RIFF WAVE spec). AVI: the
``avih`` main header carries dwMicroSecPerFrame and dwTotalFrames
(OpenDML / Video-for-Windows spec). Both are closed-form — the same
"parse it or refuse" discipline as ``functions/png.py``; formats whose
duration genuinely needs a codec walk (mp3 frames, webm EBML) are NOT
handled here and must surface NULL + a flag upstream, never a guess.

The reference repo has no media code at all (SURVEY.md §2 multimodal is a
training-data-pipeline extension); everything here derives from the
public RIFF/WAVE/AVI specifications.
"""

from __future__ import annotations

import struct


def _riff_chunks(data: bytes):
    """Yield (chunk_id, payload_offset, payload_size) for the top-level
    chunks of a RIFF file, honoring word alignment. Raises ValueError on
    a malformed container."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF container")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, csize
        pos += 8 + csize + (csize & 1)  # chunks are 2-byte aligned


def riff_form_type(data: bytes) -> str:
    """The RIFF form type fourcc ('WAVE', 'AVI ', ...) or ValueError."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF container")
    return data[8:12].decode("ascii", "replace")


def wav_duration_ms(data: bytes) -> int:
    """Exact WAV duration in milliseconds from the RIFF headers.

    duration = data-chunk byte size / fmt-chunk byte rate. Raises
    ValueError for anything that is not a well-formed PCM-style WAVE
    (missing chunks, zero byte rate, truncated fmt) — callers surface
    that as NULL + decode_error, never an estimate.
    """
    if riff_form_type(data) != "WAVE":
        raise ValueError("RIFF form is not WAVE")
    byte_rate = None
    data_size = None
    for cid, off, csize in _riff_chunks(data):
        if cid == b"fmt ":
            if csize < 16 or off + 16 > len(data):
                raise ValueError("truncated fmt chunk")
            _fmt, _nch, _rate, rate_bytes, _align, _bits = struct.unpack_from(
                "<HHIIHH", data, off
            )
            if rate_bytes == 0:
                raise ValueError("zero byte rate")
            byte_rate = rate_bytes
        elif cid == b"data":
            # the declared size governs even if the tail is truncated on
            # disk — duration is a property of the recorded stream
            data_size = csize
    if byte_rate is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    return data_size * 1000 // byte_rate


def avi_duration_ms(data: bytes) -> int:
    """Exact AVI duration in milliseconds from the ``avih`` main header:
    dwMicroSecPerFrame × dwTotalFrames. Raises ValueError when the header
    is absent or degenerate."""
    if riff_form_type(data) != "AVI ":
        raise ValueError("RIFF form is not AVI")
    for cid, off, csize in _riff_chunks(data):
        if cid != b"LIST" or data[off : off + 4] != b"hdrl":
            continue
        # walk the subchunks of the hdrl LIST for avih
        pos = off + 4
        end = off + csize
        while pos + 8 <= min(end, len(data)):
            sub = data[pos : pos + 4]
            (ssize,) = struct.unpack_from("<I", data, pos + 4)
            if sub == b"avih":
                if ssize < 32 or pos + 8 + 32 > len(data):
                    raise ValueError("truncated avih chunk")
                usec_per_frame, _, _, _, total_frames = struct.unpack_from(
                    "<IIIII", data, pos + 8
                )
                if usec_per_frame == 0:
                    raise ValueError("zero frame period")
                return usec_per_frame * total_frames // 1000
            pos += 8 + ssize + (ssize & 1)
    raise ValueError("missing avih header")


def encode_wav(
    sample_rate: int, n_channels: int, bits_per_sample: int, pcm: bytes
) -> bytes:
    """Minimal canonical WAVE writer (RIFF + fmt + data) — the test/oracle
    twin of ``wav_duration_ms``, mirroring how png.py pairs encode/decode."""
    byte_rate = sample_rate * n_channels * (bits_per_sample // 8)
    block_align = n_channels * (bits_per_sample // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bits_per_sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_header(usec_per_frame: int, total_frames: int) -> bytes:
    """Minimal structurally-valid AVI prefix (RIFF/AVI + hdrl/avih) with
    the two duration-bearing fields set — enough container for
    ``avi_duration_ms`` and for header-shape tests."""
    avih = struct.pack("<IIIII", usec_per_frame, 0, 0, 0, total_frames) + b"\x00" * 36
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", len(body)) + body
