"""Minimal real AVI (Motion-JPEG) codec — pure stdlib, no ffmpeg.

Implements the public Microsoft RIFF/AVI container format (the 'AVI '
form: LIST hdrl with avih + strl/strh/strf, LIST movi with 00dc frame
chunks) carrying Motion-JPEG video — each frame is a genuine baseline
JPEG decoded by ``operators/jpeg_codec.py``. Together they make the
engine's video path REAL for an actual interchange format: container
parse (RIFF chunk walk, even-byte padding, header validation) plus
per-frame entropy decode — not a bespoke raw-frame container.

Scope (asserted, not assumed): single 'vids' stream, MJPG fourcc,
grayscale baseline JPEG frames, no idx1 requirement on read (written
anyway for player compatibility), no audio, no OpenDML extensions.

Reference parity: the reference engine has no media path (payloads are
opaque bytes end-to-end); this module is part of the LLM-data-pipeline
extension surface (SURVEY.md §2 Table B, multimodal).
"""

from __future__ import annotations

import struct

from .jpeg_codec import decode_gray8_jpeg, encode_gray8_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpg(
    frames: list[bytes], width: int, height: int, fps: int = 10, q: int = 16
) -> bytes:
    """Encode grayscale frames (each row-major, len == width*height) as a
    real AVI/MJPG: every frame JPEG-compressed (flat quant table ``q``),
    wrapped in 00dc chunks inside LIST movi, with a spec-shaped avih /
    strh / strf header pair and an idx1 index."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    jpegs = [encode_gray8_jpeg(f, width, height, q=q) for f in frames]
    max_bytes = max((len(j) for j in jpegs), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(jpegs),
        0,  # initial frames
        1,  # streams
        max_bytes,
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I",
            0,  # flags
            0,  # priority + language
            0,  # initial frames
            1,  # scale
            fps,  # rate (rate/scale = fps)
            0,  # start
            len(jpegs),  # length in frames
            max_bytes,
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (varies per frame)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40,  # biSize
        width,
        height,
        1,  # planes
        24,  # bit count (MJPG convention)
        0x47504A4D,  # 'MJPG' little-endian
        width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame — offset is from the start of 'movi' type
    idx_entries = []
    off = 4  # past the 'movi' list-type fourcc
    for j in jpegs:
        idx_entries.append(b"00dc" + struct.pack("<3I", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpg(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode an AVI/MJPG → (width, height, fps, frames-as-pixel-bytes).

    Real container parse: RIFF/AVI form check, chunk walk with even-byte
    padding, avih geometry/stream validation, MJPG fourcc check, 00dc
    frame extraction from LIST movi, then a REAL JPEG decode per frame.
    Raises ValueError outside the supported subset (audio streams,
    non-MJPG codecs, geometry mismatches)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 > len(payload):
        raise ValueError("truncated AVI (RIFF size exceeds payload)")

    width = height = None
    fps = 0
    n_frames_declared = None
    frames: list[bytes] = []

    def walk(data: bytes, in_movi: bool) -> None:
        nonlocal width, height, fps, n_frames_declared
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + size]
            if len(body) < size:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(body[4:], in_movi or body[:4] == b"movi")
            elif fourcc == b"avih":
                us_pf, _mbps, _pad, _flags, total = struct.unpack("<5I", body[:20])
                n_frames_declared = total
                fps = 1_000_000 // us_pf if us_pf else 0
                width, height = struct.unpack("<2I", body[32:40])
            elif fourcc == b"strh":
                if body[:4] == b"vids" and body[4:8] != b"MJPG":
                    raise ValueError("non-MJPG video stream unsupported")
                if body[:4] == b"auds":
                    raise ValueError("audio streams unsupported")
            elif fourcc == b"00dc" and in_movi:
                w, h, px = decode_gray8_jpeg(body)
                if (w, h) != (width, height):
                    raise ValueError("frame geometry != avih geometry")
                frames.append(px)
            pos += 8 + size + (size % 2)

    walk(payload[12:], False)
    if width is None:
        raise ValueError("missing avih header")
    if n_frames_declared is not None and n_frames_declared != len(frames):
        raise ValueError(
            f"avih declares {n_frames_declared} frames, movi has {len(frames)}"
        )
    return width, height, fps, frames
