"""Pure-Python IMA ADPCM (DVI4) audio codec — encode AND decode.

Replaces one of the three audio/video NotImplementedError stubs with a real
compressed-audio path (the PNG/WAV codecs covered lossless image/container;
this adds the lossy-compression stage an audio ingest pipeline actually
runs). The algorithm is the public IMA/DVI ADPCM spec (IMA Digital Audio
Focus and Technical Working Groups, 1992; the same tables RFC 3551 §4.5.1
ships for DVI4): 16-bit PCM compressed 4:1 into 4-bit nibbles through an
adaptive step-size quantizer with an 89-entry step table.

Everything is integer-exact and branch-deterministic, so the WHOLE
encode→pack→parse→decode round trip is value-checkable: the DuckDB oracle
replays the identical quantizer state machine with a recursive CTE
(plans/similarity_queries.py::multimodal_adpcm_roundtrip_real).

Container framing (this repo's, deliberately minimal):
  magic  b"ADP1"
  uint16 LE  n_samples
  int16  LE  initial predictor
  uint8      initial step index
  bytes      ceil(n_samples/2) packed nibbles, LOW nibble first

Reference scope note: the reference repo (kafka-streams-and-ktable-example)
has no media path at all — this file exists for the brief's multimodal
pipeline surface, not for reference parity.
"""

from __future__ import annotations

import struct

MAGIC = b"ADP1"

#: IMA ADPCM step-size table (89 entries, public spec)
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]

#: index adjustment per 4-bit code (sign bit ignored by symmetry)
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _clamp(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


def _step(nibble: int, step: int) -> int:
    """Quantized difference reconstructed from a nibble at a step size —
    the shared kernel of encode (for predictor tracking) and decode."""
    diffq = step >> 3
    if nibble & 4:
        diffq += step
    if nibble & 2:
        diffq += step >> 1
    if nibble & 1:
        diffq += step >> 2
    return -diffq if nibble & 8 else diffq


def encode(samples: list[int], predictor: int = 0, index: int = 0) -> bytes:
    """Compress 16-bit PCM samples into the ADP1 container (4 bits/sample).

    Validates its inputs against the container's limits up front (same
    clear-ValueError contract as :func:`decode`): uint16 sample count,
    int16 predictor, step index within the 89-entry table.
    """
    if len(samples) > 0xFFFF:
        raise ValueError(f"{len(samples)} samples exceed the uint16 container limit")
    if not -32768 <= predictor <= 32767:
        raise ValueError(f"initial predictor {predictor} out of int16 range")
    if not 0 <= index <= 88:
        raise ValueError(f"initial step index {index} out of range")
    if not all(-32768 <= s <= 32767 for s in samples):
        raise ValueError("sample out of int16 range")
    header = MAGIC + struct.pack("<Hhb", len(samples), predictor, index)
    nibbles: list[int] = []
    for s in samples:
        step = STEP_TABLE[index]
        diff = s - predictor
        nibble = 0
        if diff < 0:
            nibble = 8
            diff = -diff
        if diff >= step:
            nibble |= 4
            diff -= step
        if diff >= step >> 1:
            nibble |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nibble |= 1
        predictor = _clamp(predictor + _step(nibble, step), -32768, 32767)
        index = _clamp(index + INDEX_TABLE[nibble], 0, 88)
        nibbles.append(nibble)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )
    return header + packed


def decode(payload: bytes) -> list[int]:
    """Parse the ADP1 container and reconstruct the PCM samples.

    Malformed bytes RAISE (magic, header size, payload size checks) — the
    quarantine-not-misparse contract shared with wav_codec/png_codec.
    """
    if payload[:4] != MAGIC:
        raise ValueError("not an ADP1 payload (bad magic)")
    if len(payload) < 9:
        raise ValueError("truncated ADP1 header")
    n, predictor, index = struct.unpack("<Hhb", payload[4:9])
    if not 0 <= index <= 88:
        raise ValueError(f"initial step index {index} out of range")
    body = payload[9:]
    if len(body) != (n + 1) // 2:
        raise ValueError(
            f"payload holds {len(body)} bytes, need {(n + 1) // 2} for {n} samples"
        )
    out: list[int] = []
    for i in range(n):
        byte = body[i >> 1]
        nibble = (byte >> 4) if i & 1 else (byte & 0x0F)
        step = STEP_TABLE[index]
        predictor = _clamp(predictor + _step(nibble, step), -32768, 32767)
        index = _clamp(index + INDEX_TABLE[nibble], 0, 88)
        out.append(predictor)
    return out
