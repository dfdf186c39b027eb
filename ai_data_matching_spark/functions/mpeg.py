"""Stdlib MPEG audio (mp3) frame-header walk: exact duration from the
public frame-header layout (ISO/IEC 11172-3 / 13818-3), no codec library.

Same "parse it or refuse" discipline as ``functions/riff.py`` and
``functions/png.py``: the walker visits every frame header, derives each
frame's byte length from (version, layer, bitrate index, sample-rate
index, padding) and its sample count from (version, layer), and the
duration is the exact total-samples / sample-rate — correct for CBR and
for VBR streams with explicit per-frame bitrates alike. Anything the
header walk cannot decide is a refusal, never an estimate:

* free-format bitrate (index 0) — frame length requires codec-level
  sync scanning → :class:`CodecWalkRequired` (surfaced upstream as
  ``codec_required``, the same flag webm gets);
* reserved/invalid header fields, garbage between frames, or a frame
  extending past the payload → ``ValueError`` (surfaced as
  ``decode_error``).

An ID3v2 tag prefix (syncsafe size) and a trailing 128-byte ID3v1
``TAG`` block are skipped — they are metadata containers, not audio.

The reference repo has no media code (SURVEY.md §2 multimodal is a
training-data-pipeline extension); everything here derives from the
public MPEG audio header layout.
"""

from __future__ import annotations


class CodecWalkRequired(ValueError):
    """Duration genuinely needs codec-level work (free-format bitrate):
    callers surface codec_required=True, never a guess."""


# bitrate tables, kbps, indexed 1..14 (0 = free format, 15 = invalid).
# Keys: (version_group, layer) where version_group is 1 for MPEG1 and 2
# for MPEG2/2.5 (which share tables).
_BITRATES = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

# sample rates, Hz, indexed 0..2 (3 = reserved), per version
_SAMPLE_RATES = {
    "mpeg1": [44100, 48000, 32000],
    "mpeg2": [22050, 24000, 16000],
    "mpeg2.5": [11025, 12000, 8000],
}

# samples per frame: (version_group, layer)
_SAMPLES_PER_FRAME = {
    (1, 1): 384, (1, 2): 1152, (1, 3): 1152,
    (2, 1): 384, (2, 2): 1152, (2, 3): 576,
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). Syncsafe size
    per the ID3v2 spec; the 10-byte header is included in the skip."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("ID3v2 size bytes are not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    # footer flag doubles the trailer
    return 10 + size + (10 if data[5] & 0x10 else 0)


def _parse_frame_header(hdr: int) -> tuple[int, int, int]:
    """(frame_bytes, samples, sample_rate) from a 32-bit frame header.
    Raises ValueError on reserved fields, CodecWalkRequired on free
    bitrate."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        raise ValueError("lost frame sync")
    version_bits = (hdr >> 19) & 0x3
    layer_bits = (hdr >> 17) & 0x3
    bitrate_idx = (hdr >> 12) & 0xF
    rate_idx = (hdr >> 10) & 0x3
    padding = (hdr >> 9) & 0x1
    if version_bits == 1 or layer_bits == 0 or rate_idx == 3:
        raise ValueError("reserved version/layer/sample-rate field")
    if bitrate_idx == 15:
        raise ValueError("invalid bitrate index")
    if bitrate_idx == 0:
        raise CodecWalkRequired("free-format bitrate needs codec-level sync scan")
    version = {0: "mpeg2.5", 2: "mpeg2", 3: "mpeg1"}[version_bits]
    layer = 4 - layer_bits  # bits 11/10/01 -> layer 1/2/3
    vgroup = 1 if version == "mpeg1" else 2
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx - 1] * 1000
    sample_rate = _SAMPLE_RATES[version][rate_idx]
    samples = _SAMPLES_PER_FRAME[(vgroup, layer)]
    if layer == 1:
        frame_bytes = (12 * bitrate // sample_rate + padding) * 4
    else:
        # layer 2/3: samples/8 slots of 1 byte
        frame_bytes = samples // 8 * bitrate // sample_rate + padding
    return frame_bytes, samples, sample_rate


def mp3_duration_ms(data: bytes) -> int:
    """Exact mp3 duration in milliseconds by walking every frame header.

    Sums per-frame sample counts (so VBR with explicit bitrates is as
    exact as CBR) and divides once by the sample rate; a mid-stream
    sample-rate change (malformed in practice) is refused rather than
    averaged. Raises ValueError on corrupt/truncated streams and
    :class:`CodecWalkRequired` on free-format bitrate.
    """
    pos = _id3v2_size(data)
    end = len(data)
    # trailing ID3v1 tag is fixed 128 bytes
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128
    total_samples = 0
    sample_rate: int | None = None
    n_frames = 0
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated frame header")
        hdr = int.from_bytes(data[pos : pos + 4], "big")
        frame_bytes, samples, rate = _parse_frame_header(hdr)
        if sample_rate is None:
            sample_rate = rate
        elif rate != sample_rate:
            raise ValueError("mid-stream sample-rate change")
        if pos + frame_bytes > end:
            raise ValueError("frame extends past payload")
        total_samples += samples
        n_frames += 1
        pos += frame_bytes
    if n_frames == 0 or sample_rate is None:
        raise ValueError("no MPEG audio frames")
    return total_samples * 1000 // sample_rate


def encode_mp3_cbr(
    n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100
) -> bytes:
    """Minimal valid CBR MPEG1 Layer III stream (zeroed frame payloads) —
    the test/oracle twin of :func:`mp3_duration_ms`, mirroring how
    riff.py pairs encode/parse. No padding bits, so every frame is
    ``144 * bitrate / sample_rate`` bytes exactly."""
    br_table = _BITRATES[(1, 3)]
    if bitrate_kbps not in br_table:
        raise ValueError(f"bitrate {bitrate_kbps} not in the MPEG1-L3 table")
    rates = _SAMPLE_RATES["mpeg1"]
    if sample_rate not in rates:
        raise ValueError(f"sample rate {sample_rate} not MPEG1")
    bitrate_idx = br_table.index(bitrate_kbps) + 1
    rate_idx = rates.index(sample_rate)
    hdr = (
        (0x7FF << 21)
        | (3 << 19)            # MPEG1
        | (1 << 17)            # Layer III
        | (1 << 16)            # no CRC
        | (bitrate_idx << 12)
        | (rate_idx << 10)
        | (0 << 9)             # no padding
        | (3 << 6)             # mono channel mode (keeps frames small)
    )
    frame_bytes = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr.to_bytes(4, "big") + b"\x00" * (frame_bytes - 4)
    return frame * n_frames
