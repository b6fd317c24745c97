"""External-origin codec conformance (VERDICT r7 directive #2).

Every payload in tests/fixtures/imageio_vectors.py was produced by the
JDK's javax.imageio / javax.sound.sampled — a fully independent
implementation of each container — via tools/conformance/GenVectors.java.
Pixel/sample patterns are closed-form in (x, y)/(i), recomputed HERE, so
the pins don't trust the generator's arithmetic either:

- lossless containers (PNG, TIFF incl. PackBits, GIF, WAV/PCM16) must
  decode to the exact pattern bytes;
- lossy JPEG (baseline + progressive, gray + YCbCr 4:2:0) is compared
  against ImageIO's own decode of the same file (tolerances cover the
  T.81-sanctioned IDCT variance and replication-vs-fancy chroma
  upsampling);
- G.711 A-law/mu-law byte streams must match the JDK's converters
  sample-for-sample except two named edge cells where the JDK deviates
  from the CCITT reference arithmetic (documented inline).

A second, wild-origin set pins the two most widely published tiny
payloads on the internet (the canonical 43-byte 1x1 GIF and the 70-byte
1x1 RGBA PNG), exercising real-world quirks: a GIF LZW stream that omits
the EOI code, and PNG color type 6.
"""

from __future__ import annotations

import base64

from kafka_streams_and_ktable_example_spark.operators import (
    g711_codec,
    gif_codec,
    jpeg_codec,
    png_codec,
    tiff_codec,
    wav_codec,
)
import importlib.util as _ilu
import pathlib

_spec = _ilu.spec_from_file_location(
    "imageio_vectors",
    pathlib.Path(__file__).parent / "fixtures" / "imageio_vectors.py",
)
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
VECTORS = _mod.VECTORS


def _gray_at(x: int, y: int) -> int:
    return (x * 37 + y * 101 + 7) % 256


def _rgb_at(x: int, y: int) -> tuple[int, int, int]:
    return (
        (x * 53 + y * 11) % 256,
        (x * 19 + y * 71 + 3) % 256,
        (x * 5 + y * 29 + 90) % 256,
    )


def _gray_plane(w: int, h: int) -> bytes:
    return bytes(_gray_at(x, y) for y in range(h) for x in range(w))


def _rgb_plane(w: int, h: int) -> bytes:
    return bytes(v for y in range(h) for x in range(w) for v in _rgb_at(x, y))


def _pcm_pattern(n: int) -> list[int]:
    out = []
    for i in range(n):
        v = (i * 2731 - 32768 + (i % 7) * 4001) % 65536
        if v > 32767:
            v -= 65536
        out.append(v)
    return out


def test_png_external_decode_exact():
    w, h, ch, px = png_codec.decode(VECTORS["png_gray_8x5"])
    assert (w, h, ch) == (8, 5, 1)
    assert px == _gray_plane(8, 5)
    w, h, ch, px = png_codec.decode(VECTORS["png_rgb_7x4"])
    assert (w, h, ch) == (7, 4, 3)
    assert px == _rgb_plane(7, 4)


def test_tiff_external_decode_exact():
    for name, (w0, h0, c0) in [
        ("tiff_gray_none_9x5", (9, 5, 1)),
        ("tiff_gray_packbits_9x5", (9, 5, 1)),
        ("tiff_rgb_packbits_7x4", (7, 4, 3)),
    ]:
        w, h, ch, px = tiff_codec.decode_tiff(VECTORS[name])
        assert (w, h, ch) == (w0, h0, c0), name
        exp = _gray_plane(w0, h0) if c0 == 1 else _rgb_plane(w0, h0)
        assert px == exp, name


def test_gif_external_decode_exact():
    # 2x2 flat quadrants: red / green / blue / yellow — ImageIO's GIF
    # writer palettizes losslessly here, so the decode must be exact
    w, h, frames, delay = gif_codec.gif_frames_rgb(VECTORS["gif_quadrants_4x4"])
    assert (w, h, len(frames)) == (4, 4, 1)
    quad = {(0, 0): (255, 0, 0), (1, 0): (0, 255, 0),
            (0, 1): (0, 0, 255), (1, 1): (255, 255, 0)}
    exp = bytes(
        v for y in range(4) for x in range(4)
        for v in quad[(x // 2, y // 2)]
    )
    assert frames[0] == exp


def _diffstats(a: bytes, b: bytes) -> tuple[int, float]:
    d = [abs(x - y) for x, y in zip(a, b)]
    return max(d), sum(d) / len(d)


def test_jpeg_gray_external_baseline_and_progressive():
    for name in ("jpeg_gray_baseline_16x16", "jpeg_gray_progressive_16x16"):
        w, h, px = jpeg_codec.decode_gray8_jpeg(VECTORS[name])
        assert (w, h) == (16, 16), name
        mx, mean = _diffstats(px, VECTORS[name + ".readback"])
        # measured maxdiff 1 vs ImageIO (its fast integer IDCT vs our
        # exact float IDCT); T.81 Annex A allows exactly this variance
        assert mx <= 2, (name, mx)
        assert mean <= 0.25, (name, mean)


def test_jpeg_color_external_baseline_and_progressive():
    for name in ("jpeg_rgb_baseline_16x16", "jpeg_rgb_progressive_16x16"):
        w, h, px = jpeg_codec.decode_rgb_jpeg(VECTORS[name])
        assert (w, h) == (16, 16), name
        mx, mean = _diffstats(px, VECTORS[name + ".readback"])
        # measured maxdiff 5 / meandiff 1.42: IDCT variance plus
        # replication (JFIF simple) vs libjpeg fancy chroma upsampling
        assert mx <= 8, (name, mx)
        assert mean <= 2.5, (name, mean)


def test_wav_external_container_decode_exact():
    rate, ch, samples = wav_codec.decode_wav(VECTORS["wav_pcm16_mono_64"])
    assert (rate, ch) == (8000, 1)
    assert samples == _pcm_pattern(64)


def test_g711_alaw_matches_jdk_converter():
    pcm = _pcm_pattern(64)
    mine = bytes(g711_codec.alaw_encode_sample(s) for s in pcm)
    jdk = VECTORS["alaw_of_pcm64"]
    mismatches = [i for i, (a, b) in enumerate(zip(mine, jdk)) if a != b]
    # i=8 (pcm -6919): CCITT linear2alaw folds negatives as -pcm-1 in the
    # 13-bit domain (our arithmetic); the JDK quantizes from the 16-bit
    # value and lands one code lower on this exact boundary. Both decode
    # within one quantization step of the input.
    assert mismatches == [8], mismatches
    assert (mine[8], jdk[8]) == (0x0E, 0x0F)
    assert abs(g711_codec.alaw_decode_sample(mine[8]) - pcm[8]) <= 136
    assert abs(g711_codec.alaw_decode_sample(jdk[8]) - pcm[8]) <= 136


def test_g711_mulaw_matches_jdk_converter():
    pcm = _pcm_pattern(64)
    mine = bytes(g711_codec.encode_sample(s) for s in pcm)
    jdk = VECTORS["ulaw_of_pcm64"]
    mismatches = [i for i, (a, b) in enumerate(zip(mine, jdk)) if a != b]
    # i=0 (pcm -32768): the JDK's negate-then-bias overflows the int16
    # edge and emits 0x7F (decodes to 0!); CCITT g711.c clips to 32635
    # and emits 0x00 (decodes to -32124) — ours follows the CCITT
    # reference, so the ONE divergent byte is the JDK's known artifact.
    assert mismatches == [0], mismatches
    assert (mine[0], jdk[0]) == (0x00, 0x7F)
    assert g711_codec.decode_sample(mine[0]) == -32124


def test_wild_origin_one_pixel_gif():
    # the canonical 43-byte transparent 1x1 GIF (published everywhere as
    # base64 for tracking pixels); its LZW stream omits the EOI code
    payload = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, frames, palette, delay = gif_codec.decode_gif(payload)
    assert (w, h) == (1, 1)
    assert frames == [b"\x00"]
    assert palette == [(0, 0, 0), (255, 255, 255)]


def test_wild_origin_one_pixel_png_rgba():
    # the ubiquitous 70-byte 1x1 PNG (color type 6 = RGBA)
    payload = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
        "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    w, h, ch, px = png_codec.decode(payload)
    assert (w, h, ch) == (1, 1, 4)
    assert px == b"\x00\x00\xff\x7f"  # half-transparent blue


def test_gif_truncation_still_quarantines():
    # the r8 no-EOI leniency must not weaken the corruption contract:
    # a missing trailer byte and a mid-stream cut must still raise
    import pytest

    full = VECTORS["gif_quadrants_4x4"]
    assert full[-1] == 0x3B
    with pytest.raises(ValueError):
        gif_codec.decode_gif(full[:-1])  # trailer stripped
    with pytest.raises(ValueError):
        gif_codec.decode_gif(full[: int(len(full) * 0.6)])

# ---------------------------------------------------------------------------
# Round-9 additions (VERDICT r8 directive #5): the two container paths that
# were still pinned only by self-roundtrips — AVI/Motion-JPEG and the
# changelog wire format — each get an external- or spec-origin vector.
# ---------------------------------------------------------------------------


def test_avi_mjpg_spec_origin_container_with_jdk_frames():
    """AVI/MJPG decode pinned against a container NOT written by our
    encoder: the RIFF/AVI structure is hand-assembled here from the
    public Microsoft AVI spec (RIFF 'AVI ', LIST hdrl{avih, LIST
    strl{strh,strf}}, LIST movi{00dc...}, idx1), and the frame payload is
    the JDK-ImageIO-generated baseline JPEG from VECTORS — so neither the
    container layout nor the entropy-coded bytes originate from the code
    under test. Also exercises two spec behaviors a self-roundtrip never
    hits: an unknown JUNK chunk that must be skipped, and odd-sized
    chunk padding (the JUNK body is 5 bytes -> 1 pad byte)."""
    import struct

    from kafka_streams_and_ktable_example_spark.operators import avi_codec

    jpeg = VECTORS["jpeg_gray_baseline_16x16"]
    w = h = 16
    fps = 5
    n_frames = 2

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, 0, 0, 0x10, n_frames, 0, 1, len(jpeg),
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n_frames, len(jpeg),
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0
    )
    hdrl = chunk(
        b"LIST",
        b"hdrl" + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    junk = chunk(b"JUNK", b"\xde\xad\xbe\xef\x55")  # odd size: pad byte
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jpeg) * n_frames)
    idx_body = b""
    off = 4
    for _ in range(n_frames):
        idx_body += b"00dc" + struct.pack("<3I", 0x10, off, len(jpeg))
        off += 8 + len(jpeg) + (len(jpeg) % 2)
    body = b"AVI " + hdrl + junk + movi + chunk(b"idx1", idx_body)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    dw, dh, dfps, frames = avi_codec.decode_avi_mjpg(payload)
    assert (dw, dh, dfps) == (w, h, fps)
    assert len(frames) == n_frames
    ref = VECTORS["jpeg_gray_baseline_16x16.readback"]
    for px in frames:
        mx, mean = _diffstats(px, ref)  # same T.81 IDCT-variance bound
        assert mx <= 2 and mean <= 0.25  # as the direct JPEG vector test


def test_changelog_wire_external_duckdb_writer():
    """Changelog wire-format parity against an INDEPENDENT JSON writer:
    DuckDB's COPY (FORMAT JSON) serializes the records — tombstone
    (value null), nested object value, non-ASCII text — and our Python
    DataSource byte-range reader must recover every record exactly.
    Expected tuples are written out literally here, trusting neither
    implementation."""
    import json
    import os
    import tempfile

    import duckdb

    from kafka_streams_and_ktable_example_spark.sources.pydatasource import (
        ChangelogJsonlReader,
    )

    d = tempfile.mkdtemp(prefix="wire_conf_")
    path = os.path.join(d, "wire.jsonl")
    duckdb.sql(
        f"""
        COPY (
          SELECT * FROM (VALUES
            ('alice', {{'amount': 120, 'note': 'café ☃'}}, 0),
            ('bob',   {{'amount': 7,   'note': 'x'}},      1),
            ('alice', NULL,                                2),
            ('dañé',  {{'amount': -3,  'note': ''}},       3)
          ) AS t(key, value, "offset") ORDER BY "offset"
        ) TO '{path}' (FORMAT JSON)
        """
    )
    reader = ChangelogJsonlReader({"path": path, "numPartitions": "3"})
    got = []
    for part in reader.partitions():
        for rb in reader.read(part):
            got.extend(rb.to_pylist())
    got.sort(key=lambda r: r["offset"])
    rows = [
        (r["key"], None if r["value_json"] is None else json.loads(r["value_json"]),
         r["offset"])
        for r in got
    ]
    assert rows == [
        ("alice", {"amount": 120, "note": "café ☃"}, 0),
        ("bob", {"amount": 7, "note": "x"}, 1),
        ("alice", None, 2),
        ("dañé", {"amount": -3, "note": ""}, 3),
    ]


def test_changelog_wire_spec_origin_json_edge_cases():
    """RFC 8259 edge forms a same-implementation roundtrip never
    exercises: \\uXXXX escapes (including a surrogate pair), the escaped
    solidus, insignificant whitespace, member-order permutation, and an
    explicit null-value tombstone. Every line below is hand-authored
    from the RFC's grammar; the reader must map them all onto the wire
    contract (key, canonical value_json, offset)."""
    import json
    import os
    import tempfile

    from kafka_streams_and_ktable_example_spark.sources.pydatasource import (
        ChangelogJsonlReader,
    )

    lines = [
        # A = 'A'; solidus may be escaped; whitespace is free
        '{ "key" : "\\u0041lice" , "value": {"p":"a\\/b"} ,"offset": 0 }',
        # surrogate pair U+1F600 in the key
        '{"key":"k\\ud83d\\ude00","value":{"n":1},"offset":1}',
        # member order permuted; tombstone is an explicit JSON null
        '{"offset":2,"value":null,"key":"Alice"}',
        # nested array + unicode escape inside the value document
        '{"key":"z","offset":3,"value":{"xs":[1,2,{"\\u00e9":true}]}}',
    ]
    d = tempfile.mkdtemp(prefix="wire_spec_")
    path = os.path.join(d, "edge.jsonl")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    reader = ChangelogJsonlReader({"path": path, "numPartitions": "2"})
    got = []
    for part in reader.partitions():
        for rb in reader.read(part):
            got.extend(rb.to_pylist())
    got.sort(key=lambda r: r["offset"])
    rows = [
        (r["key"], None if r["value_json"] is None else json.loads(r["value_json"]),
         r["offset"])
        for r in got
    ]
    assert rows == [
        ("Alice", {"p": "a/b"}, 0),
        ("k\U0001F600", {"n": 1}, 1),
        ("Alice", None, 2),
        ("z", {"xs": [1, 2, {"é": True}]}, 3),
    ]


# ---------------------------------------------------------------------------
# Round-10 additions (VERDICT r9 directive #6): the last two self-verified
# codecs get an independent pin each — IMA-ADPCM against CPython's C
# `audioop` module (a second implementation descended from the original
# Intel/DVI reference code, not from ours), and FRV1 against a hand-built
# container whose bytes never touch our encoder.
# ---------------------------------------------------------------------------


def _audioop():
    import pytest

    # removed from the stdlib in 3.13; this box runs 3.11
    return pytest.importorskip("audioop")


def _swap_nibbles(body: bytes) -> bytes:
    # ADP1 packs LOW nibble first; audioop packs HIGH nibble first
    return bytes(((b & 0x0F) << 4) | (b >> 4) for b in body)


def test_adpcm_decode_matches_cpython_audioop():
    """Decode parity with `audioop.adpcm2lin` — sample-for-sample over a
    fixed pseudorandom nibble stream (sha256-derived, so no draw from our
    encoder) from four initial (predictor, step-index) states including
    both table edges. This replaces the self-referential oracle concern:
    the r9 DuckDB oracle replays OUR state machine; audioop's C decoder
    shares no code with this repo."""
    import array
    import hashlib
    import struct

    audioop = _audioop()
    from kafka_streams_and_ktable_example_spark.operators import adpcm_codec as ac

    body = hashlib.sha256(b"adpcm-vector").digest() * 4  # 256 nibbles
    for pred0, idx0 in [(0, 0), (-1234, 17), (32000, 88), (-32768, 44)]:
        payload = (
            ac.MAGIC + struct.pack("<Hhb", len(body) * 2, pred0, idx0) + body
        )
        mine = ac.decode(payload)
        theirs = array.array("h")
        theirs.frombytes(
            audioop.adpcm2lin(_swap_nibbles(body), 2, (pred0, idx0))[0]
        )
        assert mine == list(theirs), (pred0, idx0)


def test_adpcm_encode_matches_cpython_audioop():
    """Encode parity with `audioop.lin2adpcm` on the shared PCM pattern:
    both implementations do the spec's successive-approximation
    quantization, so the nibble streams must be bit-identical (measured —
    no tolerance needed, unlike the G.711 JDK edge cells)."""
    import struct

    audioop = _audioop()
    from kafka_streams_and_ktable_example_spark.operators import adpcm_codec as ac

    pcm = _pcm_pattern(64)
    mine = _swap_nibbles(ac.encode(pcm)[9:])  # strip the 9-byte ADP1 header
    pcm_bytes = b"".join(struct.pack("<h", s) for s in pcm)
    theirs, (pred, idx) = audioop.lin2adpcm(pcm_bytes, 2, (0, 0))
    assert mine == theirs
    # and our decoder's final state agrees with audioop's encoder state
    assert ac.decode(ac.encode(pcm))[-1] == pred


def test_framevid_hand_built_container_decode():
    """FRV1 decode pinned against a container assembled HERE from the
    documented layout (magic, <HHHH header, raw gray8 frames) — the bytes
    never pass through framevid_codec.encode, so a framing bug shared by
    encode+decode can no longer hide behind the self-roundtrip."""
    import struct

    from kafka_streams_and_ktable_example_spark.operators import framevid_codec as fv

    w, h, fps = 5, 3, 12
    f0 = _gray_plane(w, h)
    f1 = bytes(255 - b for b in f0)
    payload = b"FRV1" + struct.pack("<HHHH", w, h, 2, fps) + f0 + f1
    dw, dh, dfps, frames = fv.decode(payload)
    assert (dw, dh, dfps) == (w, h, fps)
    assert frames == [f0, f1]
    # truncation/garbage must still quarantine, not mis-parse
    import pytest

    with pytest.raises(ValueError):
        fv.decode(payload[:-1])
    with pytest.raises(ValueError):
        fv.decode(b"FRV0" + payload[4:])
