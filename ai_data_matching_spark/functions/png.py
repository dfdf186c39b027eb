"""Pure-stdlib PNG codec (zlib + struct only — no imaging libraries).

Implements the subset of ISO/IEC 15948 (the public PNG spec) the engine
needs to make multimodal image decode REAL instead of stubbed:

* ``decode_png`` — signature check, chunk walk, IHDR parse, concatenated
  IDAT ``zlib.decompress``, and per-scanline unfiltering for all five
  filter types (None/Sub/Up/Average/Paeth). Supports the common
  non-interlaced 8-bit layouts (greyscale, RGB, RGBA, grey+alpha).
* ``encode_png`` — the matching minimal encoder (used by synth/test
  fixtures and the mm contract query to build deterministic images);
  the per-row filter type is selectable so round-trip tests exercise
  every unfilter branch.

The reference repo has no image path at all (its inputs are tabular
CSV/Excel); this exists for the multimodal-column requirement of the
large-scale training-data pipeline surface. Decode runs inside Arrow
batches (operators/multimodal.py) — per-image Python is fine there: the
cost is per *image byte*, not per row of a big shuffle.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type (8-bit depths only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a non-interlaced 8-bit PNG.

    Returns ``(width, height, n_channels, pixels)`` where ``pixels`` is
    the raw scanline bytes (row-major, ``width*n_channels`` per row).
    Raises ``ValueError`` on anything outside the supported subset —
    callers treat that as "corrupt/unsupported image", never a crash.
    """
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        # 4-byte CRC follows; presence is required, validation skipped
        # (zlib adler32 on the IDAT stream already guards pixel data)
        pos += 12 + length
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("bad IHDR length")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
    if width is None:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if bit_depth != 8 or color_type not in _CHANNELS:
        raise ValueError(f"unsupported depth/color (depth={bit_depth}, color={color_type})")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match dimensions")

    out = bytearray(stride * height)
    prev_start = None
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if fbyte == 0:  # None
            pass
        elif fbyte == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif fbyte == 2:  # Up
            if prev_start is not None:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif fbyte == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                up = out[prev_start + i] if prev_start is not None else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif fbyte == 4:  # Paeth
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                up = out[prev_start + i] if prev_start is not None else 0
                ul = out[prev_start + i - nch] if (prev_start is not None and i >= nch) else 0
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {fbyte}")
        start = y * stride
        out[start : start + stride] = line
        prev_start = start
    return width, height, nch, bytes(out)


def png_dimensions(data: bytes) -> tuple[int, int]:
    """Width/height from IHDR alone (no pixel decode) — the cheap path
    for metadata-only extraction over huge corpora."""
    if len(data) < 33 or data[:8] != _SIGNATURE or data[12:16] != b"IHDR":
        raise ValueError("not a PNG / IHDR not first chunk")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    n_channels: int = 3,
    filter_per_row=None,
) -> bytes:
    """Encode 8-bit pixels as a PNG. ``filter_per_row(y) -> 0..4`` picks
    each scanline's filter (default: y % 5, cycling through all five so
    every decoder branch is exercised by any image ≥ 5 rows tall)."""
    ctype_by_nch = {1: 0, 2: 4, 3: 2, 4: 6}
    if n_channels not in ctype_by_nch:
        raise ValueError(f"unsupported channel count {n_channels}")
    stride = width * n_channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    if filter_per_row is None:
        filter_per_row = lambda y: y % 5  # noqa: E731

    raw = bytearray()
    prev = None
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ft = filter_per_row(y)
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - n_channels] if i >= n_channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes(
                (line[i] - (prev[i] if prev is not None else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 3:  # Average
            raw += bytes(
                (
                    line[i]
                    - (
                        ((line[i - n_channels] if i >= n_channels else 0)
                         + (prev[i] if prev is not None else 0))
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        elif ft == 4:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - n_channels] if i >= n_channels else 0,
                        prev[i] if prev is not None else 0,
                        (prev[i - n_channels] if (prev is not None and i >= n_channels) else 0),
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"unknown filter type {ft}")
        prev = line

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype_by_nch[n_channels], 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# JPEG / GIF header-only dimension parsers (metadata path — no full decode)
# ---------------------------------------------------------------------------

def jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """Width/height from the first SOF0-SOF15 frame header (public JPEG
    marker layout; skips entropy-free segments)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(data):
                raise ValueError("truncated SOF")
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return w, h
        pos += 2 + seglen
    raise ValueError("no SOF marker found")


def gif_dimensions(data: bytes) -> tuple[int, int]:
    """Width/height from the GIF logical screen descriptor."""
    if len(data) < 10 or data[:4] != b"GIF8":
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    return w, h
