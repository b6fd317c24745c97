"""Minimal real baseline JPEG codec — pure stdlib, no PIL required.

Implements the public JPEG standard (ITU-T T.81 baseline sequential DCT,
JFIF container) for 8-bit GRAYSCALE, one scan: marker parse (SOI/APP0/
DQT/SOF0/DHT/SOS/EOI), Annex-K-style huffman tables, byte-stuffed entropy
decoding, DC differential + AC run-length (EOB/ZRL), dequantization,
exact 2-D IDCT from a precomputed cosine table, level shift and clamp.
The encoder is the mirror image (FDCT, quantize, huffman encode), so
round trips exercise every decode path with zero fixture bytes checked
in.

Scope (asserted, not assumed): baseline (SOF0), 8-bit, dimensions padded
to whole MCUs by edge replication on encode. GRAYSCALE
(decode_gray8_jpeg) and COLOR — 3-component YCbCr with 4:2:0 / 4:2:2 /
4:4:4 sampling via the generic interleaved-MCU plane decode
(decode_rgb_jpeg), chroma upsampled by replication, integer-exact
fixed-point YCbCr<->RGB (floor division, offsets keep numerators
non-negative so DuckDB's truncating // agrees — the color oracle's
closed form). Restart intervals (DRI/RSTm — what camera firmware emits
for error resilience) are supported on both encode and decode:
byte-aligned marker, DC predictor reset, modulo-8 sequence check.
Progressive (SOF2) and 16-bit tables raise ValueError — PIL takes over
when importable (operators/multimodal.py::decode_image_bytes).

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

    def restart(self, m: int) -> None:
        """Emit RSTm (T.81 E.1.4): 1-pad to a byte boundary, then the raw
        marker — markers are NOT byte-stuffed."""
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

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

    def sync_restart(self, m: int) -> None:
        """Consume an RSTm marker (T.81 E.2.4): discard the 1-padding to
        the byte boundary, then require the expected modulo-8 marker."""
        self.n = 0  # drop pad bits buffered past the last consumed code
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated scan at restart boundary")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (m & 7):
            raise ValueError(
                f"expected RST{m & 7} at restart boundary, got "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2


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


def _idct(zz, q):
    """Dequantize + exact 2-D IDCT -> 64 clamped pixels.

    ``q`` is the full 64-entry quantization table in zigzag order (as the
    DQT segment stores it), so arbitrary baseline JPEGs dequantize
    per-coefficient exactly as T.81 F.2.1.4 prescribes; the FLAT-table
    requirement lives only in the encoder/oracle closed form
    (:func:`_fdct_quant`), not here."""
    coefs = [0.0] * 64
    for i, v in enumerate(zz):
        coefs[_ZIGZAG[i]] = v * q[i]
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


# -- integer-exact color conversion ------------------------------------------
#
# Fixed-point BT.601/JFIF conversion with FLOOR division throughout. The
# +65536 offset keeps every numerator non-negative so Python's // (floor)
# and DuckDB's // (truncate toward zero) agree — the property the
# closed-form color oracle depends on. Weights are the classic x256
# fixed-point JFIF constants (77/150/29 sum to 256; each chroma row sums
# to 0), clamped to [0, 255] identically on both sides.


def _rgb_to_ycbcr_int(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = (77 * r + 150 * g + 29 * b + 128) // 256
    cb = (-43 * r - 85 * g + 128 * b + 128 + 65536) // 256 - 128
    cr = (128 * r - 107 * g - 21 * b + 128 + 65536) // 256 - 128
    clamp = lambda v: 0 if v < 0 else 255 if v > 255 else v  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _ycbcr_to_rgb_int(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = y + (359 * (cr - 128) + 128 + 65536) // 256 - 256
    g = y - ((88 * (cb - 128) + 183 * (cr - 128) + 128 + 65536) // 256 - 256)
    b = y + (454 * (cb - 128) + 128 + 65536) // 256 - 256
    clamp = lambda v: 0 if v < 0 else 255 if v > 255 else v  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def _encode_block_zz(bw: "_BitWriter", zz, prev_dc: int) -> int:
    """Entropy-code one quantized zigzag block (DC differential + AC
    run-length with ZRL/EOB, Annex-K luminance tables). Returns the new
    DC predictor."""
    diff = zz[0] - prev_dc
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
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


_JFIF_APP0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
_DHT_LUMA = (
    bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
)


def encode_gray8_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    q: int = DEFAULT_Q,
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height) as a
    real baseline JFIF JPEG (single component, flat quant table ``q``,
    Annex-K huffman tables). Edges pad by replication to whole blocks.
    ``restart_interval`` > 0 emits a DRI segment and an RSTm marker every
    N MCUs (DC predictor reset + byte alignment — what camera firmware
    emits for error resilience)."""
    if len(pixels) != width * height or width == 0 or height == 0:
        raise ValueError("pixels length != width*height (or empty image)")
    if not 1 <= q <= 255:
        raise ValueError("flat quant value must fit one byte")
    bw = _BitWriter()
    prev_dc = 0
    mcu_count = 0
    rst_idx = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart(rst_idx)
                rst_idx = (rst_idx + 1) % 8
                prev_dc = 0
            mcu_count += 1
            block = [
                pixels[min(by + yy, height - 1) * width + min(bx + xx, width - 1)]
                for yy in range(8)
                for xx in range(8)
            ]
            prev_dc = _encode_block_zz(bw, _fdct_quant(block, q), prev_dc)
    scan = bw.flush()

    qtab = bytes([0x00]) + bytes([q] * 64)  # id 0, 8-bit precision
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xE0, _JFIF_APP0)
        + _seg(0xDB, qtab)
        + _seg(0xC0, sof)
        + _seg(0xC4, _DHT_LUMA)
        + dri
        + _seg(0xDA, sos)
        + scan
        + b"\xff\xd9"  # EOI
    )


def encode_rgb_jpeg(
    rgb: bytes,
    width: int,
    height: int,
    q: int = DEFAULT_Q,
    restart_interval: int = 0,
) -> bytes:
    """Encode interleaved RGB8 pixels as a real baseline YCbCr 4:2:0 JFIF
    JPEG: integer-exact RGB→YCbCr (:func:`_rgb_to_ycbcr_int`), edge-
    replicated padding to whole 16x16 MCUs, 2x2 box chroma subsampling
    (round half up), then an interleaved MCU scan — 4 Y blocks (2x2,
    left-right top-bottom) + Cb + Cr per MCU with per-component DC
    predictors (T.81 A.2.3). All three components share quant table 0
    (flat ``q`` — keeps the DC-only closed form) and the Annex-K
    luminance huffman tables (spec-legal: SOS maps any component to any
    loaded table; sharing avoids transcribing the chroma tables and
    changes nothing about the entropy coding's correctness)."""
    if len(rgb) != width * height * 3 or width == 0 or height == 0:
        raise ValueError("rgb length != width*height*3 (or empty image)")
    if not 1 <= q <= 255:
        raise ValueError("flat quant value must fit one byte")
    pw = (width + 15) // 16 * 16
    ph = (height + 15) // 16 * 16
    yp = bytearray(pw * ph)
    cbp = bytearray(pw * ph)
    crp = bytearray(pw * ph)
    for yy in range(ph):
        sy = min(yy, height - 1)
        for xx in range(pw):
            sx = min(xx, width - 1)
            i = (sy * width + sx) * 3
            yv, cb, cr = _rgb_to_ycbcr_int(rgb[i], rgb[i + 1], rgb[i + 2])
            at = yy * pw + xx
            yp[at], cbp[at], crp[at] = yv, cb, cr
    cw, chh = pw // 2, ph // 2
    cbs = bytearray(cw * chh)
    crs = bytearray(cw * chh)
    for cy in range(chh):
        for cx in range(cw):
            a = 2 * cy * pw + 2 * cx
            cbs[cy * cw + cx] = (cbp[a] + cbp[a + 1] + cbp[a + pw] + cbp[a + pw + 1] + 2) // 4
            crs[cy * cw + cx] = (crp[a] + crp[a + 1] + crp[a + pw] + crp[a + pw + 1] + 2) // 4

    def block(plane, pwidth, bx, by):
        return [
            plane[(by * 8 + yy) * pwidth + bx * 8 + xx]
            for yy in range(8)
            for xx in range(8)
        ]

    bw = _BitWriter()
    prev = [0, 0, 0]  # per-component DC predictors (Y, Cb, Cr)
    mcu_count = 0
    rst_idx = 0
    for myi in range(ph // 16):
        for mxi in range(pw // 16):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart(rst_idx)
                rst_idx = (rst_idx + 1) % 8
                prev = [0, 0, 0]
            mcu_count += 1
            for vy in range(2):
                for vx in range(2):
                    zz = _fdct_quant(block(yp, pw, 2 * mxi + vx, 2 * myi + vy), q)
                    prev[0] = _encode_block_zz(bw, zz, prev[0])
            prev[1] = _encode_block_zz(bw, _fdct_quant(block(cbs, cw, mxi, myi), q), prev[1])
            prev[2] = _encode_block_zz(bw, _fdct_quant(block(crs, cw, mxi, myi), q), prev[2])
    scan = bw.flush()

    qtab = bytes([0x00]) + bytes([q] * 64)
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + _seg(0xE0, _JFIF_APP0)
        + _seg(0xDB, qtab)
        + _seg(0xC0, sof)
        + _seg(0xC4, _DHT_LUMA)
        + dri
        + _seg(0xDA, sos)
        + scan
        + b"\xff\xd9"
    )


def _parse_baseline(payload: bytes):
    """Marker walk of a baseline JPEG → header facts.

    Returns (width, height, comps, qtables, dc_tables, ac_tables, scan,
    scan_start) where ``comps`` is the SOF0 component list
    [(cid, h, v, tq)], the huffman dicts are keyed by table id, and
    ``scan`` is the SOS mapping [(cid, dc_id, ac_id)], and the trailing
    element is the DRI restart interval (0 = none). Raises ValueError for
    anything outside 8-bit baseline sequential (progressive, 16-bit
    tables)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []
    scan = None
    scan_start = None
    restart_interval = 0
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
            if precision != 8:
                raise ValueError("only 8-bit precision baseline supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                n = sum(bits)
                vals = list(body[at + 17 : at + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _build_decode(bits, vals)
                at += 17 + n
        elif marker == 0xDD:  # DRI: restart every N MCUs (0 = disabled)
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ns)
            ]
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if (
        width is None
        or scan_start is None
        or scan is None
        or not dc_tables
        or not ac_tables
    ):
        raise ValueError("missing SOF/SOS/DHT")
    return (
        width, height, comps, qtables, dc_tables, ac_tables, scan,
        scan_start, restart_interval,
    )


def _decode_block(br: "_BitReader", dc_dec, ac_dec, prev_dc: int):
    """One entropy-coded block → (zigzag coefficients, new DC predictor)."""
    t = br.huff(dc_dec)
    diff = _extend(br.bits(t), t) if t else 0
    dc = prev_dc + diff
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
    return zz, dc


def _decode_planes(payload: bytes):
    """Interleaved-MCU scan decode (T.81 A.2.3) → per-component planes.

    Handles any component count / sampling factors baseline allows; each
    returned plane is padded to its MCU coverage (``mx * h * 8`` wide).
    Returns (width, height, comps, planes-by-cid, (mx, my, hmax, vmax))."""
    (
        width, height, comps, qtables, dc_t, ac_t, scan, scan_start, dri,
    ) = _parse_baseline(payload)
    if len(scan) != len(comps):
        raise ValueError("scan component count != frame component count")
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("invalid sampling factors")
    mx = (width + 8 * hmax - 1) // (8 * hmax)
    my = (height + 8 * vmax - 1) // (8 * vmax)
    planes: dict[int, bytearray] = {}
    comp_by_id: dict[int, tuple[int, int, list[int]]] = {}
    for cid, h, v, tq in comps:
        q = qtables.get(tq)
        if q is None:
            raise ValueError("missing quant table")
        if len(q) != 64:
            raise ValueError("quant table must have 64 entries (8-bit baseline)")
        planes[cid] = bytearray(mx * h * 8 * my * v * 8)
        comp_by_id[cid] = (h, v, q)
    end = payload.rfind(b"\xff\xd9")
    br = _BitReader(payload[scan_start : end if end > 0 else len(payload)])
    prev = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    rst_idx = 0
    for myi in range(my):
        for mxi in range(mx):
            if dri and mcu_count and mcu_count % dri == 0:
                # restart boundary: byte-align, consume RSTm, reset the
                # DC predictors (T.81 E.2.4 — the resync that makes scans
                # corruption-resilient)
                br.sync_restart(rst_idx)
                rst_idx = (rst_idx + 1) % 8
                prev = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for cid, td, ta in scan:
                h, v, q = comp_by_id[cid]
                dc_dec, ac_dec = dc_t.get(td), ac_t.get(ta)
                if dc_dec is None or ac_dec is None:
                    raise ValueError("missing huffman table for scan component")
                pw = mx * h * 8
                for vy in range(v):
                    for vx in range(h):
                        zz, prev[cid] = _decode_block(br, dc_dec, ac_dec, prev[cid])
                        block = _idct(zz, q)
                        bxi, byi = mxi * h + vx, myi * v + vy
                        for yy in range(8):
                            row = (byi * 8 + yy) * pw + bxi * 8
                            planes[cid][row : row + 8] = bytes(
                                block[yy * 8 : yy * 8 + 8]
                            )
    return width, height, comps, planes, (mx, my, hmax, vmax)


def decode_gray8_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline single-component JPEG -> (width, height, pixels).

    Real decode: marker walk, DQT/DHT table loads, byte-unstuffed huffman
    scan (DC differential + AC run-length), per-coefficient dequantize,
    exact IDCT, level shift + clamp, un-pad to the declared geometry.
    Raises ValueError for anything outside the baseline subset; color
    payloads go through :func:`decode_rgb_jpeg`.
    """
    width, height, comps, planes, (mx, _my, _hm, _vm) = _decode_planes(payload)
    if len(comps) != 1:
        raise ValueError(
            "only 8-bit single-component (grayscale) baseline JPEG is "
            "supported here; 3-component YCbCr goes through decode_rgb_jpeg"
        )
    cid, h, v, _tq = comps[0]
    if (h, v) != (1, 1):
        raise ValueError("subsampled grayscale is malformed")
    padded = planes[cid]
    pw = mx * 8
    out = bytearray(width * height)
    for y in range(height):
        out[y * width : (y + 1) * width] = padded[y * pw : y * pw + width]
    return width, height, bytes(out)


def decode_rgb_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline 3-component YCbCr JPEG -> (width, height, RGB8).

    Full color path: interleaved MCU scan with per-component sampling
    factors and DC predictors (4:2:0, 4:2:2, and 4:4:4 all fall out of
    the generic plane decode), chroma upsampled to full resolution by
    replication (nearest — the JFIF-sanctioned simple upsampler), then
    integer-exact YCbCr→RGB (:func:`_ycbcr_to_rgb_int`) with clamping.
    """
    width, height, comps, planes, (mx, my, hmax, vmax) = _decode_planes(payload)
    if len(comps) != 3:
        raise ValueError("decode_rgb_jpeg needs a 3-component (YCbCr) JPEG")
    full_w = mx * hmax * 8
    up: dict[int, bytearray | bytes] = {}
    for cid, h, v, _tq in comps:
        sx, sy = hmax // h, vmax // v
        if sx * h != hmax or sy * v != vmax:
            raise ValueError("non-integer subsampling ratio unsupported")
        plane = planes[cid]
        if sx == 1 and sy == 1:
            up[cid] = plane
            continue
        pw = mx * h * 8
        o = bytearray(full_w * (my * vmax * 8))
        for y in range(my * vmax * 8):
            src_row = (y // sy) * pw
            base = y * full_w
            for x in range(full_w):
                o[base + x] = plane[src_row + x // sx]
        up[cid] = o
    yp, cbp, crp = (up[cid] for cid, *_ in comps)  # SOF order: Y, Cb, Cr
    out = bytearray(width * height * 3)
    k = 0
    for yy in range(height):
        base = yy * full_w
        for xx in range(width):
            r, g, b = _ycbcr_to_rgb_int(yp[base + xx], cbp[base + xx], crp[base + xx])
            out[k] = r
            out[k + 1] = g
            out[k + 2] = b
            k += 3
    return width, height, bytes(out)
