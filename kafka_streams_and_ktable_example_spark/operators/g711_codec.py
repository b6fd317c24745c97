"""Pure-Python G.711 audio codec — μ-law AND A-law, encode AND decode.

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


# -- A-law (PCMA) — the G.711 sibling companding law ---------------------------
#
# Same 2:1 logarithmic compression, European-telephony flavor (RFC 3551
# PCMA): fold the sign, shift 16-bit PCM to 13 bits, pick the segment by
# magnitude, keep a 4-bit mantissa, XOR with the alternating-bit mask
# (0x55 / 0xD5) the spec prescribes so the wire bytes avoid long zero
# runs. Stateless per sample, so the DuckDB oracle replays the exact
# encode->decode round trip with integer CASE arithmetic — verified
# exhaustively against this implementation for all 65536 int16 values
# (tests/test_advanced.py::test_g711_alaw_codec_contract).

ALAW_MAGIC = b"ALW1"

_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def alaw_encode_sample(s: int) -> int:
    """16-bit PCM sample → A-law byte (ITU-T G.711 PCMA)."""
    if not -32768 <= s <= 32767:
        raise ValueError("sample out of int16 range")
    pcm = s >> 3  # 13-bit domain (arithmetic shift, matches the spec)
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    if pcm > 0xFFF:
        pcm = 0xFFF
    seg = next(i for i, end in enumerate(_SEG_AEND) if pcm <= end)
    aval = seg << 4
    aval |= (pcm >> (1 if seg < 2 else seg)) & 0x0F
    return aval ^ mask


def alaw_decode_sample(b: int) -> int:
    """A-law byte → reconstructed 16-bit PCM sample."""
    if not 0 <= b <= 0xFF:
        raise ValueError("a-law byte out of range")
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def alaw_encode(samples: list[int]) -> bytes:
    """Compress 16-bit PCM samples into the ALW1 container (1 byte/sample)."""
    if len(samples) > 0xFFFF:
        raise ValueError(f"{len(samples)} samples exceed the uint16 container limit")
    body = bytes(alaw_encode_sample(s) for s in samples)
    return ALAW_MAGIC + struct.pack("<H", len(samples)) + body


def alaw_decode(payload: bytes) -> list[int]:
    """Parse the ALW1 container and reconstruct the PCM samples; malformed
    bytes RAISE (the quarantine-not-misparse contract)."""
    if payload[:4] != ALAW_MAGIC:
        raise ValueError("not an ALW1 payload (bad magic)")
    if len(payload) < 6:
        raise ValueError("truncated ALW1 header")
    (n,) = struct.unpack("<H", payload[4:6])
    body = payload[6:]
    if len(body) != n:
        raise ValueError(f"payload holds {len(body)} bytes, need {n}")
    return [alaw_decode_sample(x) for x in body]
