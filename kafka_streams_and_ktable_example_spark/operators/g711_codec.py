"""Pure-Python G.711 μ-law audio codec — encode AND decode.

The third real compressed-audio path (after WAV's PCM16 container and the
IMA ADPCM adaptive quantizer): ITU-T G.711 μ-law companding, the 2:1
logarithmic PCM compression every telephony stack ships. The algorithm is
the public ITU-T G.711 spec (also RFC 3551 §4.5.14 PCMU): each 16-bit
sample is biased (+0x84), clipped (32635), split into a 3-bit segment
(exponent = position of the top bit of the biased sample's high byte) and
a 4-bit mantissa, then ones-complemented into one byte.

Unlike ADPCM the transform is STATELESS per sample, so the DuckDB oracle
replays the exact encode→decode round trip with plain integer CASE
arithmetic — no recursive CTE needed
(plans/similarity_queries.py::multimodal_mulaw_roundtrip_real).

Container framing (this repo's, deliberately minimal):
  magic  b"ULW1"
  uint16 LE  n_samples
  bytes      n_samples μ-law bytes

Reference scope note: the reference repo (kafka-streams-and-ktable-example)
has no media path at all — this file exists for the brief's multimodal
pipeline surface, not for reference parity.
"""

from __future__ import annotations

import struct

MAGIC = b"ULW1"

_BIAS = 0x84
_CLIP = 32635


def encode_sample(s: int) -> int:
    """16-bit PCM sample → μ-law byte (ITU-T G.711)."""
    if not -32768 <= s <= 32767:
        raise ValueError("sample out of int16 range")
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    if s > _CLIP:
        s = _CLIP
    s += _BIAS
    exponent = 7
    mask = 0x4000
    while exponent > 0 and not s & mask:
        exponent -= 1
        mask >>= 1
    mantissa = (s >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def decode_sample(u: int) -> int:
    """μ-law byte → reconstructed 16-bit PCM sample."""
    if not 0 <= u <= 0xFF:
        raise ValueError("mu-law byte out of range")
    u = ~u & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    s = (((mantissa << 3) + _BIAS) << exponent) - _BIAS
    return -s if sign else s


def encode(samples: list[int]) -> bytes:
    """Compress 16-bit PCM samples into the ULW1 container (1 byte/sample)."""
    if len(samples) > 0xFFFF:
        raise ValueError(f"{len(samples)} samples exceed the uint16 container limit")
    body = bytes(encode_sample(s) for s in samples)
    return MAGIC + struct.pack("<H", len(samples)) + body


def decode(payload: bytes) -> list[int]:
    """Parse the ULW1 container and reconstruct the PCM samples.

    Malformed bytes RAISE (magic, header, size checks) — the
    quarantine-not-misparse contract shared with the other codecs."""
    if payload[:4] != MAGIC:
        raise ValueError("not a ULW1 payload (bad magic)")
    if len(payload) < 6:
        raise ValueError("truncated ULW1 header")
    (n,) = struct.unpack("<H", payload[4:6])
    body = payload[6:]
    if len(body) != n:
        raise ValueError(f"payload holds {len(body)} bytes, need {n}")
    return [decode_sample(b) for b in body]
