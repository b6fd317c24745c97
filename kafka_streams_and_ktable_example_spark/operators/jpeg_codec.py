"""Minimal real baseline JPEG codec — pure stdlib, no PIL required.

Implements the public JPEG standard (ITU-T T.81 baseline sequential DCT,
JFIF container) for 8-bit GRAYSCALE, one scan: marker parse (SOI/APP0/
DQT/SOF0/DHT/SOS/EOI), Annex-K-style huffman tables, byte-stuffed entropy
decoding, DC differential + AC run-length (EOB/ZRL), dequantization,
exact 2-D IDCT from a precomputed cosine table, level shift and clamp.
The encoder is the mirror image (FDCT, quantize, huffman encode), so
round trips exercise every decode path with zero fixture bytes checked
in.

Scope (asserted, not assumed): baseline (SOF0), single component
(grayscale), 8-bit, no restart markers, dimensions padded to whole 8x8
blocks by edge replication on encode. Color (YCbCr, subsampling) and
progressive (SOF2) raise ValueError — PIL takes over when importable
(operators/multimodal.py::decode_image_bytes).

Determinism note for oracles: JPEG is lossy, so hash-checked queries use
BLOCK-CONSTANT source images — every 8x8 block is a single value, the
DCT has only a DC coefficient, and the decoded block is the closed form
clamp(round(round(8*(v-128)/q00) * q00 / 8.0) + 128), which a SQL oracle
recomputes exactly. General images (nonzero ACs) are covered by
round-trip pytest bounds instead.

Reference parity: the reference engine has no media path (it treats
payloads as opaque bytes end-to-end); this module is part of the
LLM-data-pipeline extension surface (SURVEY.md §2 Table B, multimodal).
"""

from __future__ import annotations

import math
import struct

# -- tables -----------------------------------------------------------------

#: flat quantization table (all entries q) keeps the closed-form oracle
#: simple; any table works for the codec itself.
DEFAULT_Q = 16

# Annex K.3.1 luminance DC: BITS then HUFFVAL (category 0..11)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.3.2 luminance AC
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: cosine basis c[u][x] = C(u) * cos((2x+1) u pi / 16), C(0)=1/sqrt(2)
_COS = [
    [
        (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _build_codes(bits, vals):
    """(value -> (code, length)) per Annex C canonical code assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


def _build_decode(bits, vals):
    """((length, code) -> value) decode map."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


_DC_DECODE = _build_decode(_DC_BITS, _DC_VALS)
_AC_DECODE = _build_decode(_AC_BITS, _AC_VALS)


def _category(v: int) -> int:
    """Bit category of a DC diff / AC coefficient (T.81 F.1.2.1.1)."""
    a = abs(v)
    n = 0
    while a:
        a >>= 1
        n += 1
    return n


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside scan")
            self.pos += 1  # skip stuffed 0x00
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to a signed coefficient."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _fdct_quant(block, q: int):
    """Level-shifted 8x8 FDCT, quantized by the flat table (zigzag order)."""
    shifted = [p - 128 for p in block]
    coefs = []
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                cy = _COS[u][y]
                base = y * 8
                for x in range(8):
                    s += shifted[base + x] * cy * _COS[v][x]
            # snap to a 1/4096 grid: mathematically-integer coefficients
            # (e.g. the DC of a constant block) accumulate ~1e-10 float
            # error over 64 cosine terms, which flips round-half cases and
            # breaks the closed-form oracle; genuinely fractional
            # coefficients are unaffected at this resolution
            coefs.append(math.floor(s / 4.0 * 4096.0 + 0.5) / 4096.0)
    # round-half-away-from-zero: engine- and platform-stable
    quant = [
        int(math.floor(abs(c) / q + 0.5)) * (1 if c >= 0 else -1)
        for c in coefs
    ]
    return [quant[_ZIGZAG[i]] for i in range(64)]


def _idct(zz, q: int):
    """Dequantize (flat table) + exact 2-D IDCT -> 64 clamped pixels."""
    coefs = [0.0] * 64
    for i, v in enumerate(zz):
        coefs[_ZIGZAG[i]] = v * q
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = _COS[u][y]
                base = u * 8
                for v in range(8):
                    s += coefs[base + v] * cu * _COS[v][x]
            # same 1/4096 snap as the encoder (see _fdct_quant)
            snapped = math.floor(s / 4.0 * 4096.0 + 0.5) / 4096.0
            p = int(math.floor(snapped + 0.5)) + 128
            out.append(0 if p < 0 else 255 if p > 255 else p)
    return out


def encode_gray8_jpeg(
    pixels: bytes, width: int, height: int, q: int = DEFAULT_Q
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height) as a
    real baseline JFIF JPEG (single component, flat quant table ``q``,
    Annex-K huffman tables). Edges pad by replication to whole blocks."""
    if len(pixels) != width * height or width == 0 or height == 0:
        raise ValueError("pixels length != width*height (or empty image)")
    if not 1 <= q <= 255:
        raise ValueError("flat quant value must fit one byte")
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = [
                pixels[min(by + yy, height - 1) * width + min(bx + xx, width - 1)]
                for yy in range(8)
                for xx in range(8)
            ]
            zz = _fdct_quant(block, q)
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            t = _category(diff)
            code, ln = _DC_CODES[t]
            bw.put(code, ln)
            if t:
                bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run >= 16:
                    zc, zl = _AC_CODES[0xF0]  # ZRL
                    bw.put(zc, zl)
                    run -= 16
                t = _category(zz[i])
                code, ln = _AC_CODES[(run << 4) | t]
                bw.put(code, ln)
                bw.put(zz[i] if zz[i] >= 0 else zz[i] + (1 << t) - 1, t)
                run = 0
            if last_nz < 63:
                ec, el = _AC_CODES[0x00]  # EOB
                bw.put(ec, el)
    scan = bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qtab = bytes([0x00]) + bytes([q] * 64)  # id 0, 8-bit precision
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, qtab)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + scan
        + b"\xff\xd9"  # EOI
    )


def decode_gray8_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline single-component JPEG -> (width, height, pixels).

    Real decode: marker walk, DQT/DHT table loads, byte-unstuffed huffman
    scan (DC differential + AC run-length), dequantize, exact IDCT,
    level shift + clamp, un-pad to the declared geometry. Raises
    ValueError for anything outside the baseline-grayscale subset.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_dec = ac_dec = None
    width = height = None
    comp_q = 0
    scan_start = None
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG (marker walk ran off the end)")
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if pos + 2 + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(body[at + 1 : at + 65])
                at += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError(
                    "only 8-bit single-component (grayscale) baseline "
                    "JPEG is supported without PIL"
                )
            if body[7] != 0x11:
                raise ValueError("subsampled grayscale is malformed")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                n = sum(bits)
                vals = list(body[at + 17 : at + 17 + n])
                if th != 0:
                    raise ValueError("only table id 0 per class supported")
                if tc == 0:
                    dc_dec = _build_decode(bits, vals)
                else:
                    ac_dec = _build_decode(bits, vals)
                at += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan_start is None or dc_dec is None or ac_dec is None:
        raise ValueError("missing SOF/SOS/DHT")
    q = qtables.get(comp_q)
    if q is None:
        raise ValueError("missing quant table")
    if len(set(q)) != 1:
        raise ValueError("this decoder's exact closed form needs a flat table")
    qval = q[0]

    end = payload.rfind(b"\xff\xd9")
    br = _BitReader(payload[scan_start : end if end > 0 else len(payload)])
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    padded = bytearray(bw * 8 * bh * 8)
    prev_dc = 0
    for byi in range(bh):
        for bxi in range(bw):
            t = br.huff(dc_dec)
            diff = _extend(br.bits(t), t) if t else 0
            dc = prev_dc + diff
            prev_dc = dc
            zz = [0] * 64
            zz[0] = dc
            i = 1
            while i < 64:
                rs = br.huff(ac_dec)
                r, s = rs >> 4, rs & 0x0F
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                i += r
                if i > 63:
                    raise ValueError("AC index overrun")
                zz[i] = _extend(br.bits(s), s)
                i += 1
            block = _idct(zz, qval)
            for yy in range(8):
                row = (byi * 8 + yy) * bw * 8 + bxi * 8
                padded[row : row + 8] = bytes(block[yy * 8 : yy * 8 + 8])
    # un-pad to the declared geometry
    out = bytearray(width * height)
    for y in range(height):
        out[y * width : (y + 1) * width] = padded[y * bw * 8 : y * bw * 8 + width]
    return width, height, bytes(out)
