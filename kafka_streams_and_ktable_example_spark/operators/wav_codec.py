"""REAL WAV (RIFF/PCM) codec in pure stdlib — the audio analog of
``png_codec``: no audio library exists in the container, but the WAV
container needs none. ``encode_wav`` writes a spec-correct RIFF/WAVE file
(fmt + data chunks, PCM16LE); ``decode_wav`` is a genuine container
parser — it validates the RIFF magic, walks the chunk list honoring
declared sizes (skipping unknown chunks, as the spec requires), checks
the fmt contract (PCM, mono or stereo, 16-bit, consistent block
align/byte rate), and unpacks the frame-interleaved sample stream.
Malformed bytes raise ``ValueError`` so the Spark-side decode can
quarantine rather than mis-parse — the same corruption contract as the
Kafka ingress and the CSV scan.

Reference scope note: the reference engine has no media path at all
(SURVEY §2 Table B); this is training-pipeline extension surface.
"""

from __future__ import annotations

import struct


def encode_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """PCM16 WAV bytes for ``samples`` (ints in [-32768, 32767]). Stereo
    (``channels=2``) expects frame-interleaved samples L R L R …"""
    if channels not in (1, 2):
        raise ValueError("encoder supports 1 (mono) or 2 (stereo) channels")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", riff_size),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a RIFF/WAVE container; returns (sample_rate, channels,
    samples). Raises ValueError on any structural violation."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")
    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE form")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        # unknown chunks are legal; skip (word-aligned)
        pos += 8 + csize + (csize % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only PCM16 supported")
    if channels not in (1, 2):
        raise ValueError("only mono/stereo supported")
    if block_align != 2 * channels or byte_rate != rate * block_align:
        raise ValueError("fmt block_align/byte_rate inconsistent")
    if len(data) % block_align:
        raise ValueError("data chunk not frame-aligned")
    n = len(data) // 2
    return rate, channels, list(struct.unpack(f"<{n}h", data[: n * 2]))
