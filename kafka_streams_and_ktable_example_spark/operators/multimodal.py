"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no codec *libraries*, but the common formats need none: the
decode step is REAL for PNG payloads via the stdlib codec in
``operators/png_codec.py`` (chunk walk + CRC + inflate + unfilter;
gray8, RGB8, paletted color type 3 with PLTE expansion, and ADAM7
interlaced layouts), for
JPEG via ``operators/jpeg_codec.py`` — baseline grayscale AND 3-component
YCbCr color (huffman scan, dequantize, IDCT, chroma upsample, restart
intervals) plus PROGRESSIVE (SOF2) grayscale and color (multi-scan
spectral selection + successive approximation, interleaved DC scans) —
for animated GIF89a via ``operators/gif_codec.py`` (real LZW
variable-width entropy coding, 4-pass row interlace, global color
table), for baseline TIFF via ``operators/tiff_codec.py`` (both byte
orders, IFD tag walk, multi-strip, PackBits RLE), for
RIFF/WAVE PCM16 via ``operators/wav_codec.py``, for IMA-ADPCM compressed
audio via ``operators/adpcm_codec.py`` (adaptive-quantizer encode AND
decode), for raw-frame video via ``operators/framevid_codec.py``
(RIFF-style declared-size container), and for COMPRESSED video via
``operators/avi_codec.py`` (real RIFF AVI/Motion-JPEG: container walk +
per-frame JPEG entropy decode) — with PIL picked up automatically when
importable for other image formats. The byte-statistics stub
(deterministic fake) remains the oracle path for generic media;
inter-frame-predicted video (H.26x etc.) still needs ffmpeg on the
cluster image and raises NotImplementedError. Everything Spark-side is real and
tested either way: binary columns, typed metadata structs, Arrow-batched
mapInPandas signatures, partitioning.

At 100 TB the pattern matters: media bytes stay in binary columns that are
column-pruned away unless the query touches them, metadata predicates push
down to parquet, and decode runs Arrow-batched per partition with bounded
batch sizes (spark.sql.execution.arrow.maxRecordsPerBatch) so executor
memory is payload-bound, not row-count-bound.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct every media column carries
MEDIA_META_FIELDS = "media_type STRING, width INT, height INT, n_frames INT"


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload + typed metadata from text.

    Stands in for reading real image/audio bytes; the payload is the UTF-8
    bytes (opaque to the engine, as real media would be), metadata derived
    deterministically so oracles can check the plumbing.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return (
        df.withColumn("media_bytes", payload)
        .withColumn(
            "media_meta",
            F.struct(
                F.when(F.col("doc_id") % 3 == 0, "image")
                .when(F.col("doc_id") % 3 == 1, "audio")
                .otherwise("video")
                .alias("media_type"),
                (F.col("doc_id") % 8 * 160 + 320).cast("int").alias("width"),
                (F.col("doc_id") % 8 * 90 + 180).cast("int").alias("height"),
                (F.col("doc_id") % 16 + 1).cast("int").alias("n_frames"),
            ),
        )
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode step: mapInPandas over (id, bytes, meta) batches.

    With ``fake=True`` produces a deterministic 4-float feature row per
    payload (byte-level statistics — a stand-in for decoded-pixel stats).
    With ``fake=False`` dispatches on container magic to the repo's REAL
    codecs — PNG (png_codec), baseline grayscale JPEG (jpeg_codec),
    RIFF/WAVE PCM16 (wav_codec), IMA-ADPCM (adpcm_codec), FRV1 raw-frame
    video (framevid_codec) — and raises NotImplementedError only for
    formats with no codec here (compressed video such as H.26x).
    """

    def _real_features(payload: bytes) -> tuple[float, float, float, float]:
        """Dispatch on container magic to the repo's REAL codecs: PNG
        (png_codec), baseline JPEG (jpeg_codec), RIFF AVI/Motion-JPEG
        video (avi_codec), RIFF/WAVE PCM16 (wav_codec), IMA-ADPCM
        (adpcm_codec), FRV1 raw-frame video (framevid_codec).
        Zero-length media (0-sample
        WAV/ADPCM, 0-frame FRV1) is valid per the containers and yields
        zeroed features rather than a ZeroDivisionError."""
        if payload[:8] == PNG_SIGNATURE or payload[:2] == b"\xff\xd8":
            w, h, c, px = decode_image_bytes(payload)
            return (
                float(w * h),
                float(c),
                float(sum(px) / len(px)) if px else 0.0,
                float(px[0]) if px else 0.0,
            )
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from .avi_codec import decode_avi_mjpg

            w, h, _fps, frames = decode_avi_mjpg(payload)
            npix = len(frames) * w * h
            return (
                float(len(frames)),
                float(w * h),
                float(sum(sum(f) for f in frames) / npix) if npix else 0.0,
                float(frames[0][0]) if npix else 0.0,
            )
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            from .wav_codec import decode_wav

            rate, _, samples = decode_wav(payload)
            return (
                float(len(samples)),
                float(rate),
                float(sum(samples) / len(samples)) if samples else 0.0,
                float(max(abs(s) for s in samples)) if samples else 0.0,
            )
        if payload[:4] == b"ADP1":
            from .adpcm_codec import decode as adpcm_decode

            samples = adpcm_decode(payload)
            return (
                float(len(samples)),
                8000.0,
                float(sum(samples) / len(samples)) if samples else 0.0,
                float(max(abs(s) for s in samples)) if samples else 0.0,
            )
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from .gif_codec import gif_frames_rgb

            w, h, rgb_frames, _delay = gif_frames_rgb(payload)
            npix = len(rgb_frames) * w * h * 3
            return (
                float(len(rgb_frames)),
                float(w * h),
                float(sum(sum(f) for f in rgb_frames) / npix) if npix else 0.0,
                float(rgb_frames[0][0] if rgb_frames and rgb_frames[0] else 0),
            )
        if payload[:4] == b"FRV1":
            from .framevid_codec import decode as frv_decode

            w, h, _fps, frames = frv_decode(payload)
            npix = len(frames) * w * h
            return (
                float(len(frames)),
                float(w * h),
                float(sum(sum(f) for f in frames) / npix) if npix else 0.0,
                float(frames[0][0] if frames and frames[0] else 0),
            )
        raise NotImplementedError(
            "no codec for this payload format (PNG/JPEG/GIF/AVI-MJPG/WAV/"
            "ADPCM/FRV1 are real; anything else needs PIL/ffmpeg on the "
            "cluster image)"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                rows = [
                    (r["doc_id"], *_real_features(bytes(r["media_bytes"])))
                    for _, r in pdf.iterrows()
                ]
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "n_bytes", "first_byte", "sig_mean", "sig_head",
                    ],
                )
                continue
            rows = []
            for _, r in pdf.iterrows():
                payload: bytes = r["media_bytes"]
                digest = hashlib.sha256(payload).digest()
                rows.append(
                    (
                        r["doc_id"],
                        float(len(payload)),
                        float(payload[0] if payload else 0),
                        float(sum(digest[:8]) / 8.0),
                        float(digest[0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "first_byte", "sig_mean", "sig_head"],
            )

    return df.select("doc_id", "media_bytes").mapInPandas(
        decode,
        schema="doc_id long, n_bytes double, first_byte double, "
        "sig_mean double, sig_head double",
    )


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video rows: explode n_frames into frame indices,
    keep every n-th — pure relational (sequence + explode + filter), so it
    scales as a projection."""
    return (
        df.where(F.col("media_meta.media_type") == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("media_meta.n_frames") - 1)
            ).alias("frame_idx"),
        )
        .where(F.col("frame_idx") % every_n == 0)
    )


def resize_media(
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Resize step: mapInPandas producing a payload scaled to the target
    pixel count, with updated metadata.

    ``fake=True``: the stub scales the byte length by the pixel ratio —
    out_len = max(1, in_len * (tw*th) // (w*h)), payload tiled/truncated
    deterministically — so the oracle can verify the plumbing through
    pure length arithmetic while the bytes stay opaque.
    ``fake=False``: REAL for grayscale AND RGB PNG payloads — decode
    (inflate + unfilter), channel-aware nearest-neighbor resample on the
    decoded pixel grid, and re-encode to a genuine PNG of the same color
    type at the target geometry (png_codec end to end); other formats
    raise NotImplementedError until PIL/ffmpeg exist on the cluster image.
    """

    def _real_resize(payload: bytes) -> bytes:
        from . import png_codec

        if payload[:8] != PNG_SIGNATURE:
            raise NotImplementedError(
                "real resize implemented for PNG payloads; other formats "
                "need PIL/ffmpeg on the cluster image"
            )
        w, h, c, px = png_codec.decode(payload)
        out = png_codec.nearest_resize(px, w, h, target_w, target_h, channels=c)
        if c == 1:
            return png_codec.encode_gray8(out, target_w, target_h)
        if c == 3:
            return png_codec.encode_rgb8(out, target_w, target_h)
        # only reachable via PIL decodes of exotic band counts (e.g. RGBA)
        raise NotImplementedError("real re-encode implemented for gray8/rgb8")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                rows = []
                for _, r in pdf.iterrows():
                    enc = _real_resize(bytes(r["media_bytes"]))
                    rows.append(
                        (r["doc_id"], enc, target_w, target_h, len(enc))
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "media_bytes", "width", "height", "n_bytes",
                    ],
                )
                continue
            rows = []
            for _, r in pdf.iterrows():
                payload: bytes = r["media_bytes"]
                w, h = int(r["width"]), int(r["height"])
                out_len = max(1, len(payload) * (target_w * target_h) // (w * h))
                tiled = (payload * (out_len // max(1, len(payload)) + 1))[:out_len]
                rows.append((r["doc_id"], tiled, target_w, target_h, out_len))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_bytes", "width", "height", "n_bytes"],
            )

    flat = df.select(
        "doc_id",
        "media_bytes",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    return flat.mapInPandas(
        resize,
        schema="doc_id long, media_bytes binary, width int, height int, n_bytes long",
    )


# -- real PNG path (no PIL needed; see operators/png_codec.py) -------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def decode_image_bytes(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL image decode → (width, height, channels, pixels).

    PIL when importable (any format it knows); otherwise the stdlib
    codecs — PNG (gray/RGB/paletted) and baseline JPEG (grayscale AND
    3-component YCbCr color, restart intervals included). Raises
    NotImplementedError only for formats neither path covers.
    """
    try:
        import io

        from PIL import Image  # type: ignore

        im = Image.open(io.BytesIO(payload))
        im.load()
        if im.mode == "P":
            # palette-expand so PIL and the stdlib codec agree on the
            # (w, h, 3, rgb) contract for color-type-3 PNGs
            im = im.convert("RGB")
        return im.width, im.height, len(im.getbands()), im.tobytes()
    except ImportError:
        pass
    if payload[:8] == PNG_SIGNATURE:
        from . import png_codec

        return png_codec.decode(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg_codec import (
            _parse_baseline,
            _parse_progressive,
            decode_gray8_jpeg,
            decode_rgb_jpeg,
            sof_marker,
        )

        # dispatch on SOFn + component count: 1 → grayscale plane, 3 →
        # full YCbCr color decode (4:2:0/4:2:2/4:4:4); both decoders
        # route progressive (SOF2) streams through the multi-scan
        # successive-approximation coefficient decoder internally
        parse = _parse_progressive if sof_marker(payload) == 0xC2 else _parse_baseline
        ncomp = len(parse(payload)[2])
        if ncomp == 3:
            w, h, px = decode_rgb_jpeg(payload)
            return w, h, 3, px
        w, h, px = decode_gray8_jpeg(payload)
        return w, h, 1, px
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif_codec import gif_frames_rgb

        w, h, rgb_frames, _delay = gif_frames_rgb(payload)
        return w, h, 3, rgb_frames[0]  # first frame, same RGB contract
    if payload[:2] in (b"II", b"MM"):
        from .tiff_codec import decode_tiff

        return decode_tiff(payload)
    raise NotImplementedError(
        "no codec for this payload format on this machine (install PIL)"
    )


def attach_synth_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL PNG payload per row (graded pattern
    pixel(y, x) = (x + y + id) % 256, size 8+id%5 × 8+id%7, per-image
    scanline filter id % 3) — synthesized executor-side in Arrow batches,
    so the bytes crossing the plan are genuine encoded PNGs."""
    from . import png_codec

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 5, 8 + d % 7
                px = bytes((x + y + d) % 256 for y in range(h) for x in range(w))
                out.append((d, png_codec.encode_gray8(px, w, h, filter_type=d % 3)))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes"])

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary"
    )


def attach_synth_png_interlaced(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a deterministic REAL ADAM7-INTERLACED PNG per row — graded
    pattern pixel(y, x) = (x + 2y + id) % 256, geometry (1 + id%12) ×
    (1 + id%11) so the tiny widths/heights exercise EMPTY interlace
    passes (which carry no bytes at all, not even filter bytes — PNG
    spec 8.2), per-image scanline filter id % 3 applied independently
    per pass. Interlacing reorders wire bytes only; decoded pixels equal
    the plain encoding's, so the closed-form checksum oracle holds."""
    from . import png_codec

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 1 + d % 12, 1 + d % 11
                px = bytes((x + 2 * y + d) % 256 for y in range(h) for x in range(w))
                out.append(
                    (
                        d,
                        png_codec.encode_gray8(
                            px, w, h, filter_type=d % 3, interlace=True
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=[id_col, "media_bytes"])

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary"
    )


def png_decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL decode of PNG payloads (inflate + unfilter) → geometry and an
    exact pixel checksum the oracle can recompute in closed form."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, c, px = decode_image_bytes(bytes(r["media_bytes"]))
                rows.append((int(r[id_col]), w, h, c, int(sum(px))))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "pixel_sum"]
            )

    return df.mapInPandas(
        dec,
        schema=f"{id_col} long, width int, height int, channels int, pixel_sum long",
    )


def png_resize_stats(
    df: DataFrame, new_w: int = 8, new_h: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """REAL decode + nearest-neighbor resize on the decoded pixel grid,
    reported as the resized image's exact pixel checksum."""
    from . import png_codec

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, c, px = decode_image_bytes(bytes(r["media_bytes"]))
                rp = png_codec.nearest_resize(px, w, h, new_w, new_h, channels=c)
                rows.append((int(r[id_col]), new_w, new_h, int(sum(rp))))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "pixel_sum"]
            )

    return df.mapInPandas(
        rs, schema=f"{id_col} long, width int, height int, pixel_sum long"
    )


def attach_synth_png_rgb(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL color-type-2 (RGB8) PNG per row —
    pixel(y, x, ch) = (3x + 5y + 7ch + id) % 256, geometry 8+id%5 ×
    8+id%7, per-image scanline filter id % 3 — plus the media_meta struct
    resize_media expects. Bytes crossing the plan are genuine encoded
    PNGs; the oracle recomputes the pattern in closed form."""
    from . import png_codec

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 5, 8 + d % 7
                px = bytes(
                    (3 * x + 5 * y + 7 * ch + d) % 256
                    for y in range(h)
                    for x in range(w)
                    for ch in range(3)
                )
                out.append(
                    (d, png_codec.encode_rgb8(px, w, h, filter_type=d % 3), w, h)
                )
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "w", "h"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def attach_synth_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL baseline JFIF JPEG per row — grayscale,
    geometry 8*(1 + id%2) × 8*(1 + id%3), BLOCK-CONSTANT pattern
    block(bx, by) = (37bx + 53by + 11id) % 256, flat quant table q=16.
    Block-constant sources make the lossy round trip exactly
    oracle-computable (every block is DC-only — operators/jpeg_codec.py
    module docstring has the closed form); the bytes crossing the plan
    are genuine entropy-coded JPEGs."""
    from .jpeg_codec import encode_gray8_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 * (1 + d % 2), 8 * (1 + d % 3)
                px = bytes(
                    (37 * (x // 8) + 53 * (y // 8) + 11 * d) % 256
                    for y in range(h)
                    for x in range(w)
                )
                out.append((d, encode_gray8_jpeg(px, w, h, q=16), w, h))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "w", "h"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def attach_synth_color_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL color baseline JPEG per row — YCbCr
    4:2:0, geometry 16*(1 + id%2) × 16*(1 + id%3), MCU-CONSTANT tile
    pattern tile(tx, ty) = ((37tx + 53ty + 11id) % 256, (23tx + 41ty +
    7id) % 256, (29tx + 31ty + 13id) % 256) as (R, G, B), flat q=16.
    MCU-constant sources keep every stage of the color pipeline exactly
    oracle-computable: the 2x2 box chroma subsample is the identity on a
    constant tile, every block is DC-only, and the integer fixed-point
    YCbCr<->RGB conversions replay in SQL (operators/jpeg_codec.py)."""
    from .jpeg_codec import encode_rgb_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 16 * (1 + d % 2), 16 * (1 + d % 3)
                rgb = bytes(
                    c
                    for y in range(h)
                    for x in range(w)
                    for c in (
                        (37 * (x // 16) + 53 * (y // 16) + 11 * d) % 256,
                        (23 * (x // 16) + 41 * (y // 16) + 7 * d) % 256,
                        (29 * (x // 16) + 31 * (y // 16) + 13 * d) % 256,
                    )
                )
                out.append((d, encode_rgb_jpeg(rgb, w, h, q=16), w, h))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "w", "h"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def attach_synth_jpeg_dri(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL baseline JPEG per row WITH RESTART
    MARKERS — grayscale, geometry 8*(1 + id%2) × 8*(1 + id%3),
    block-constant pattern block(bx, by) = (37bx + 53by + 11id) % 256,
    flat q=16, DRI restart interval 1 + id%3 MCUs (so every payload
    exercises RSTm emission, byte alignment, and DC predictor resets at a
    different cadence). Restart markers change the wire bytes but not
    the decoded pixels, so the grayscale closed form still holds."""
    from .jpeg_codec import encode_gray8_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 * (1 + d % 2), 8 * (1 + d % 3)
                px = bytes(
                    (37 * (x // 8) + 53 * (y // 8) + 11 * d) % 256
                    for y in range(h)
                    for x in range(w)
                )
                payload = encode_gray8_jpeg(
                    px, w, h, q=16, restart_interval=1 + d % 3
                )
                out.append((d, payload, w, h))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "w", "h"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def attach_synth_tiff(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL baseline TIFF per row — grayscale,
    geometry (8 + id%9) x (4 + id%6), run-friendly pattern pixel(y, x) =
    (x//4 + y + id) % 256, PACKBITS-compressed multi-strip layout
    (RowsPerStrip = 1 + id%3) in BIG-endian ("MM") byte order for odd
    ids and little-endian ("II") for even — so the IFD walk, both
    endians, strip reassembly, and the RLE all carry real weight
    (operators/tiff_codec.py). TIFF is lossless; the oracle recomputes
    pixels directly."""
    from .tiff_codec import encode_tiff

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 9, 4 + d % 6
                px = bytes(
                    (x // 4 + y + d) % 256 for y in range(h) for x in range(w)
                )
                out.append(
                    (
                        d,
                        encode_tiff(
                            px, w, h,
                            rows_per_strip=1 + d % 3,
                            packbits=True,
                            big_endian=bool(d % 2),
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=[id_col, "media_bytes"])

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary"
    )


def attach_synth_crossformat(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach the SAME logical image in ONE of three lossless containers
    per row — PNG (RGB8), TIFF (PackBits, alternating byte order), or
    single-frame GIF (grayscale palette) chosen by id % 3 — where the
    pixel content depends ONLY on the duplicate key id % 7: gray value
    v(y, x) = (x + 3y + 7*(id%7)) % 256 replicated to RGB, 16x8. Rows
    sharing a key are exact duplicates that LOOK completely different on
    the wire (different container families, different entropy coders,
    different byte orders); only decoding proves it."""
    from . import png_codec
    from .gif_codec import encode_gif
    from .tiff_codec import encode_tiff

    w, h = 16, 8
    gray_palette = [(i, i, i) for i in range(256)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                key, fmt = d % 7, d % 3
                gray = bytes(
                    (x + 3 * y + 7 * key) % 256
                    for y in range(h)
                    for x in range(w)
                )
                if fmt == 0:
                    rgb = bytes(v for g in gray for v in (g, g, g))
                    payload = png_codec.encode_rgb8(rgb, w, h, filter_type=d % 3)
                elif fmt == 1:
                    rgb = bytes(v for g in gray for v in (g, g, g))
                    payload = encode_tiff(
                        rgb, w, h, channels=3,
                        rows_per_strip=1 + d % 3, packbits=True,
                        big_endian=bool(d % 2),
                    )
                else:
                    payload = encode_gif([gray], w, h, gray_palette)
                out.append((d, payload, fmt))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "fmt"])

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, fmt int"
    )


def crossformat_dedup_groups(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Container-agnostic EXACT dedup: decode every payload through its
    own codec (PNG chunk/inflate, TIFF IFD/PackBits, GIF LZW — whichever
    the bytes demand), fingerprint the DECODED pixels, and group on that
    digest. One group per identical image regardless of container; the
    keeper is the smallest doc id. Output carries no digest — the oracle
    verifies the GROUPING ITSELF (membership, sizes, format diversity),
    which is only reproducible if all three decoders emit bit-identical
    pixels for the same logical image."""
    import hashlib as _hashlib

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, c, px = decode_image_bytes(bytes(r["media_bytes"]))
                dig = _hashlib.md5(
                    f"{w}x{h}x{c}:".encode() + bytes(px)
                ).hexdigest()
                rows.append((int(r[id_col]), int(r["fmt"]), dig, w, h))
            yield pd.DataFrame(
                rows, columns=[id_col, "fmt", "digest", "width", "height"]
            )

    decoded = df.select(id_col, "fmt", "media_bytes").mapInPandas(
        dec, schema=f"{id_col} long, fmt int, digest string, width int, height int"
    )
    return decoded.groupBy("digest").agg(
        F.min(id_col).alias("keeper_doc_id"),
        F.count("*").alias("n_docs"),
        F.countDistinct("fmt").alias("n_formats"),
        F.first("width").alias("width"),
        F.first("height").alias("height"),
    ).drop("digest")


def attach_synth_corrupt_media(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a payload that is VALID or deliberately CORRUPTED by
    id % 4: 0 → valid grayscale PNG (the attach_synth_png pattern,
    pixel = (x+y+id) % 256, 8+id%5 x 8+id%7); 1 → the same PNG with one
    IDAT payload byte flipped (CRC now lies); 2 → a baseline JPEG
    truncated to 60% (cuts mid-header or mid-scan); 3 → an animated GIF
    truncated to 60% (cuts the LZW sub-block chain). The corruptions are
    deterministic per id, so the quarantine outcome is a closed-form
    function of id arithmetic."""
    from . import png_codec
    from .gif_codec import encode_gif
    from .jpeg_codec import encode_gray8_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                fmt = d % 4
                w, h = 8 + d % 5, 8 + d % 7
                px = bytes((x + y + d) % 256 for y in range(h) for x in range(w))
                if fmt in (0, 1):
                    payload = png_codec.encode_gray8(px, w, h, filter_type=d % 3)
                    if fmt == 1:
                        at = payload.index(b"IDAT") + 4 + 2
                        buf = bytearray(payload)
                        buf[at] ^= 0xFF  # payload byte flips, CRC does not
                        payload = bytes(buf)
                elif fmt == 2:
                    whole = encode_gray8_jpeg(px, w, h, q=16)
                    payload = whole[: max(20, len(whole) * 3 // 5)]
                else:
                    pal = [(i, i, i) for i in range(256)]
                    whole = encode_gif([px, px], w, h, pal)
                    payload = whole[: max(20, len(whole) * 3 // 5)]
                out.append((d, payload, fmt))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "fmt"])

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, fmt int"
    )


def media_quarantine_stats(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The corruption-never-misparses contract for media (the
    kafka_wire_corrupt_view analog): decode each payload with the
    stdlib codec its magic demands; ValueError quarantines the row,
    success contributes its exact pixel checksum. Per-format totals
    prove record conservation (n = n_ok + quarantined) AND that the
    valid slice decoded to the right pixels — a decoder that silently
    accepts a corrupt payload, or quarantines a valid one, shifts a
    count or the checksum."""
    from . import png_codec
    from .gif_codec import decode_gif
    from .jpeg_codec import decode_gray8_jpeg

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["media_bytes"])
                ok, psum = 1, 0
                try:
                    if payload[:8] == PNG_SIGNATURE:
                        _w, _h, _c, px = png_codec.decode(payload)
                        psum = int(sum(px))
                    elif payload[:2] == b"\xff\xd8":
                        _w, _h, px = decode_gray8_jpeg(payload)
                        psum = int(sum(px))
                    elif payload[:6] in (b"GIF87a", b"GIF89a"):
                        _w, _h, frames, _pal, _d = decode_gif(payload)
                        psum = int(sum(sum(f) for f in frames))
                    else:
                        ok = 0
                except ValueError:
                    ok = 0
                rows.append((int(r[id_col]), int(r["fmt"]), ok, psum))
            yield pd.DataFrame(
                rows, columns=[id_col, "fmt", "ok", "psum"]
            )

    decoded = df.select(id_col, "fmt", "media_bytes").mapInPandas(
        dec, schema=f"{id_col} long, fmt int, ok int, psum long"
    )
    return decoded.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum("ok").alias("n_ok"),
        (F.count("*") - F.sum("ok")).alias("n_quarantined"),
        F.sum("psum").alias("pixel_sum_ok"),
    )


def attach_synth_gif(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL animated GIF89a per row — geometry
    8*(1 + id%2) x 8, 2 + id%3 full-size frames of the index pattern
    idx(x, y, f) = (x + 2y + 3f + id) % 16 through the fixed 16-entry
    palette entry(i) = ((3i)%256, (5i)%256, (7i)%256), frame delay
    4 + id%5 centiseconds, frame 0 row-interlaced when id is odd (the
    4-pass GIF interlace). Real LZW entropy coding per frame
    (operators/gif_codec.py); GIF is lossless, so the oracle recomputes
    pixels directly."""
    from .gif_codec import encode_gif

    palette = [((3 * i) % 256, (5 * i) % 256, (7 * i) % 256) for i in range(16)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h, nf = 8 * (1 + d % 2), 8, 2 + d % 3
                frames = [
                    bytes(
                        (x + 2 * y + 3 * f + d) % 16
                        for y in range(h)
                        for x in range(w)
                    )
                    for f in range(nf)
                ]
                payload = encode_gif(
                    frames, w, h, palette,
                    delay_cs=4 + d % 5, interlace_first=bool(d % 2),
                )
                out.append((d, payload, w, h, nf))
            yield pd.DataFrame(
                out, columns=[id_col, "media_bytes", "w", "h", "nf"]
            )

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int, nf int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("video").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.col("nf").alias("n_frames"),
        ).alias("media_meta"),
    )


def gif_animation_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL GIF decode of ``media_bytes`` → geometry, frame count, frame
    delay and exact per-channel checksums over ALL frames plus a
    first-frame checksum (LZW decode, de-interlace, palette expansion —
    operators/gif_codec.py)."""
    from .gif_codec import gif_frames_rgb

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, frames, delay = gif_frames_rgb(bytes(r["media_bytes"]))
                rows.append(
                    (
                        int(r[id_col]),
                        w,
                        h,
                        len(frames),
                        delay,
                        int(sum(sum(f[0::3]) for f in frames)),
                        int(sum(sum(f[1::3]) for f in frames)),
                        int(sum(sum(f[2::3]) for f in frames)),
                        int(sum(frames[0])),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "n_frames", "delay_cs",
                    "sum_r", "sum_g", "sum_b", "sum_f0",
                ],
            )

    return df.select(id_col, "media_bytes").mapInPandas(
        dec,
        schema=(
            f"{id_col} long, width int, height int, n_frames int, "
            "delay_cs int, sum_r long, sum_g long, sum_b long, sum_f0 long"
        ),
    )


def attach_synth_progressive_jpeg(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a deterministic REAL PROGRESSIVE (SOF2) JPEG per row —
    grayscale, geometry 8*(1 + id%2) × 8*(1 + id%3), the same
    block-constant pattern as :func:`attach_synth_jpeg`, encoded as six
    spectral-selection + successive-approximation scans with per-scan
    optimal huffman tables (operators/jpeg_codec.py::
    encode_gray8_progressive). Progressive re-orders the WIRE bits but
    reconstructs the identical coefficients, so the grayscale
    block-constant closed form still hash-checks the decode."""
    from .jpeg_codec import encode_gray8_progressive

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 * (1 + d % 2), 8 * (1 + d % 3)
                px = bytes(
                    (37 * (x // 8) + 53 * (y // 8) + 11 * d) % 256
                    for y in range(h)
                    for x in range(w)
                )
                out.append((d, encode_gray8_progressive(px, w, h, q=16), w, h))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "w", "h"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def attach_synth_progressive_color_jpeg(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a deterministic REAL PROGRESSIVE COLOR JPEG per row — the
    same YCbCr 4:2:0 MCU-constant tile pattern as
    :func:`attach_synth_color_jpeg`, encoded as libjpeg's ten-scan color
    progression (interleaved DC scans with separate luma/chroma optimal
    tables, per-component AC scans — operators/jpeg_codec.py::
    encode_rgb_progressive). Identical coefficients to the baseline
    encoding, so the color closed form still hash-checks the decode."""
    from .jpeg_codec import encode_rgb_progressive

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 16 * (1 + d % 2), 16 * (1 + d % 3)
                rgb = bytes(
                    c
                    for y in range(h)
                    for x in range(w)
                    for c in (
                        (37 * (x // 16) + 53 * (y // 16) + 11 * d) % 256,
                        (23 * (x // 16) + 41 * (y // 16) + 7 * d) % 256,
                        (29 * (x // 16) + 31 * (y // 16) + 13 * d) % 256,
                    )
                )
                out.append((d, encode_rgb_progressive(rgb, w, h, q=16), w, h))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "w", "h"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def jpeg_color_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL color JPEG decode of ``media_bytes`` → geometry + exact
    per-channel checksums (interleaved-MCU huffman scan, dequantize,
    IDCT, chroma upsample, integer YCbCr→RGB — jpeg_codec.py)."""
    from .jpeg_codec import decode_rgb_jpeg

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, px = decode_rgb_jpeg(bytes(r["media_bytes"]))
                rows.append(
                    (
                        int(r[id_col]),
                        w,
                        h,
                        int(sum(px[0::3])),
                        int(sum(px[1::3])),
                        int(sum(px[2::3])),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return df.select(id_col, "media_bytes").mapInPandas(
        dec,
        schema=(
            f"{id_col} long, width int, height int, "
            "sum_r long, sum_g long, sum_b long"
        ),
    )


def jpeg_decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL JPEG decode of ``media_bytes`` → geometry + exact pixel
    checksum (huffman scan, dequantize, IDCT, clamp — jpeg_codec.py)."""
    from .jpeg_codec import decode_gray8_jpeg

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, px = decode_gray8_jpeg(bytes(r["media_bytes"]))
                rows.append((int(r[id_col]), w, h, int(sum(px))))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "pixel_sum"]
            )

    return df.select(id_col, "media_bytes").mapInPandas(
        dec, schema=f"{id_col} long, width int, height int, pixel_sum long"
    )


def jpeg_resize_stats(
    df: DataFrame, new_w: int = 8, new_h: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """REAL JPEG decode + nearest-neighbor resample on the decoded pixel
    grid → exact checksum of the resized image. Output pixel (i, j)
    samples source (i*h//new_h, j*w//new_w) — integer-exact, so a
    block-constant source stays closed-form through decode AND resize
    (the resized grid is not re-encoded: mixing blocks creates AC
    energy, which is exactly the lossiness the oracle cannot replay)."""
    from .jpeg_codec import decode_gray8_jpeg
    from .png_codec import nearest_resize

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, px = decode_gray8_jpeg(bytes(r["media_bytes"]))
                out = nearest_resize(px, w, h, new_w, new_h, channels=1)
                rows.append((int(r[id_col]), new_w, new_h, int(sum(out))))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "pixel_sum"]
            )

    return df.select(id_col, "media_bytes").mapInPandas(
        dec, schema=f"{id_col} long, width int, height int, pixel_sum long"
    )


def attach_synth_avi(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL AVI/Motion-JPEG video per row — 16x8
    grayscale, 2 + id%3 frames at 10 fps, each frame a genuine baseline
    JPEG of the block-constant pattern block(bx, f) = (37bx + 11id +
    19f) % 256 (one block row at h=8). Real interchange container (RIFF
    AVI: avih/strh/strf headers, movi 00dc chunks, idx1), real per-frame
    entropy coding — operators/avi_codec.py."""
    from .avi_codec import encode_avi_mjpg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h, n = 16, 8, 2 + d % 3
                frames = [
                    bytes(
                        (37 * (x // 8) + 11 * d + 19 * f) % 256
                        for _y in range(h)
                        for x in range(w)
                    )
                    for f in range(n)
                ]
                out.append((d, encode_avi_mjpg(frames, w, h, fps=10), n))
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "nf"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, nf int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit(16).alias("width"),
            F.lit(8).alias("height"),
            F.col("nf").alias("n_frames"),
        ).alias("media_meta"),
    )


def avi_video_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL AVI/MJPG decode → container metadata + exact pixel checksums
    (whole clip and first frame). Container parse + per-frame JPEG
    decode both on the line: a bad chunk walk, frame-count mismatch, or
    one wrong huffman bit shifts the sums."""
    from .avi_codec import decode_avi_mjpg

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, fps, frames = decode_avi_mjpg(bytes(r["media_bytes"]))
                rows.append(
                    (
                        int(r[id_col]),
                        len(frames),
                        w,
                        h,
                        fps,
                        int(sum(sum(f) for f in frames)),
                        int(sum(frames[0])) if frames else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "width", "height", "fps",
                    "pixel_sum", "sum_f0",
                ],
            )

    return df.select(id_col, "media_bytes").mapInPandas(
        dec,
        schema=(
            f"{id_col} long, n_frames int, width int, height int, "
            "fps int, pixel_sum long, sum_f0 long"
        ),
    )


def attach_synth_png_pal(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL color-type-3 (paletted) PNG per row —
    a 16-entry palette palette[p] = ((7p + id) % 256, (11p + 2id) % 256,
    (13p + 3id) % 256), index(y, x) = (x + 2y + id) % 16, geometry
    8+id%5 × 8+id%7, per-image scanline filter id % 3. Bytes crossing the
    plan are genuine encoded PNGs with a PLTE chunk; the oracle
    recomputes the palette lookup in closed form."""
    from . import png_codec

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 5, 8 + d % 7
                palette = [
                    ((7 * p + d) % 256, (11 * p + 2 * d) % 256, (13 * p + 3 * d) % 256)
                    for p in range(16)
                ]
                idx = bytes(
                    (x + 2 * y + d) % 16 for y in range(h) for x in range(w)
                )
                out.append(
                    (
                        d,
                        png_codec.encode_pal8(idx, w, h, palette, filter_type=d % 3),
                        w,
                        h,
                    )
                )
            yield pd.DataFrame(out, columns=[id_col, "media_bytes", "w", "h"])

    flat = df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media_bytes binary, w int, h int"
    )
    return flat.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image").alias("media_type"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    )


def png_channel_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL decode of PNG payloads → geometry plus exact per-channel pixel
    checksums (gray images report their single channel as sum_r with
    sum_g/sum_b zero). Strictly stronger than png_decode_stats for color
    payloads: a channel-swap bug keeps pixel_sum but breaks sum_r/g/b."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, c, px = decode_image_bytes(bytes(r["media_bytes"]))
                sums = [0, 0, 0]
                for k, v in enumerate(px):
                    sums[k % c] += v
                rows.append(
                    (int(r[id_col]), w, h, c, int(sum(px)), *map(int, sums))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "channels",
                    "pixel_sum", "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.select(id_col, "media_bytes").mapInPandas(
        dec,
        schema=(
            f"{id_col} long, width int, height int, channels int, "
            "pixel_sum long, sum_r long, sum_g long, sum_b long"
        ),
    )


def attach_synth_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL mono PCM16 WAV per row: 16 samples derived from
    sha256(id), each sample (byte-pair big-endian) - 32768 — deterministic
    so the oracle recomputes the waveform from the same digest."""
    from .wav_codec import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b[id_col].tolist()
            payloads = []
            for i in ids:
                dig = hashlib.sha256(str(i).encode()).digest()
                samples = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(16)
                ]
                payloads.append(encode_wav(samples))
            yield pd.DataFrame({id_col: ids, "wav_bytes": payloads})

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, wav_bytes binary"
    )


def wav_decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode the WAV container (REAL RIFF chunk-walk parse) and reduce to
    integer waveform statistics the oracle can recompute."""
    from .wav_codec import decode_wav

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                id_col: [],
                "sample_rate": [],
                "n_samples": [],
                "peak": [],
                "energy": [],
            }
            for i, payload in zip(b[id_col], b["wav_bytes"]):
                rate, _, samples = decode_wav(bytes(payload))
                out[id_col].append(i)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["peak"].append(max(abs(s) for s in samples))
                out["energy"].append(sum(s * s for s in samples))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        dec,
        schema=(
            f"{id_col} long, sample_rate int, n_samples int, "
            "peak int, energy long"
        ),
    )


def attach_synth_wav_stereo(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL stereo PCM16 WAV per row: the 16 sha256-derived
    samples of attach_synth_wav reinterpreted as 8 frames × 2 channels
    (frame-interleaved L R L R …, the RIFF wire layout)."""
    from .wav_codec import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b[id_col].tolist()
            payloads = []
            for i in ids:
                dig = hashlib.sha256(str(i).encode()).digest()
                samples = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(16)
                ]
                payloads.append(encode_wav(samples, channels=2))
            yield pd.DataFrame({id_col: ids, "wav_bytes": payloads})

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, wav_bytes binary"
    )


def wav_stereo_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode a stereo WAV (REAL RIFF parse incl. block-align checks),
    de-interleave the channels, and reduce to exact per-channel integer
    stats plus the L·R frame dot product (a mono-downmix/abs-stat bug
    keeps per-channel energies but breaks lr_dot)."""
    from .wav_codec import decode_wav

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, payload in zip(b[id_col], b["wav_bytes"]):
                rate, ch, samples = decode_wav(bytes(payload))
                if ch != 2:
                    raise ValueError("expected a stereo payload")
                left, right = samples[0::2], samples[1::2]
                # 0-frame payloads are valid RIFF: zeroed stats, same as
                # decode_media's zero-length-media contract
                rows.append(
                    (
                        int(i),
                        rate,
                        len(left),
                        max((abs(s) for s in left), default=0),
                        max((abs(s) for s in right), default=0),
                        sum(s * s for s in left),
                        sum(s * s for s in right),
                        sum(l * r for l, r in zip(left, right)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_frames",
                    "peak_l", "peak_r", "energy_l", "energy_r", "lr_dot",
                ],
            )

    return df.mapInPandas(
        dec,
        schema=(
            f"{id_col} long, sample_rate int, n_frames int, peak_l int, "
            "peak_r int, energy_l long, energy_r long, lr_dot long"
        ),
    )


def attach_synth_adpcm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL IMA-ADPCM compressed audio payload per row: the
    same sha256-derived 16-sample PCM waveform as attach_synth_wav, run
    through the genuine adaptive-quantizer encoder (adpcm_codec.encode),
    so the bytes crossing the plan are actual 4-bit compressed audio."""
    from .adpcm_codec import encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b[id_col].tolist()
            payloads = []
            for i in ids:
                dig = hashlib.sha256(str(i).encode()).digest()
                samples = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(16)
                ]
                payloads.append(encode(samples))
            yield pd.DataFrame({id_col: ids, "adpcm_bytes": payloads})

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, adpcm_bytes binary"
    )


def adpcm_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse + decode the ADPCM container (REAL adaptive-quantizer state
    machine) and reduce the lossy round trip to exact integer stats —
    peak of the original waveform (recomputed from the digest, proving
    sample parity), energy of the RECONSTRUCTED waveform, and the max/sum
    absolute quantization error. The oracle replays the identical encoder
    state machine with a recursive CTE, so every predictor/step-index
    transition is value-checked."""
    from .adpcm_codec import decode

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                id_col: [],
                "peak_orig": [],
                "energy_recon": [],
                "max_abs_err": [],
                "sum_abs_err": [],
            }
            for i, payload in zip(b[id_col], b["adpcm_bytes"]):
                recon = decode(bytes(payload))
                dig = hashlib.sha256(str(int(i)).encode()).digest()
                orig = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(len(recon))
                ]
                out[id_col].append(i)
                # 0-sample payloads are valid containers: zeroed stats,
                # same as decode_media's zero-length-media contract
                out["peak_orig"].append(max((abs(s) for s in orig), default=0))
                out["energy_recon"].append(sum(r * r for r in recon))
                out["max_abs_err"].append(
                    max((abs(a - b_) for a, b_ in zip(orig, recon)), default=0)
                )
                out["sum_abs_err"].append(
                    sum(abs(a - b_) for a, b_ in zip(orig, recon))
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        dec,
        schema=(
            f"{id_col} long, peak_orig long, energy_recon long, "
            "max_abs_err long, sum_abs_err long"
        ),
    )


def attach_synth_mulaw(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL G.711 μ-law payload per row: the sha256-derived
    16-sample PCM waveform run through the genuine ITU-T companding
    encoder (g711_codec.encode), so the bytes crossing the plan are
    actual 8-bit logarithmic PCM."""
    from .g711_codec import encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b[id_col].tolist()
            payloads = []
            for i in ids:
                dig = hashlib.sha256(str(i).encode()).digest()
                samples = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(16)
                ]
                payloads.append(encode(samples))
            yield pd.DataFrame({id_col: ids, "mulaw_bytes": payloads})

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, mulaw_bytes binary"
    )


def attach_synth_alaw(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL G.711 A-law payload per row: the same
    sha256-derived 16-sample PCM waveform as the μ-law fixture, run
    through the genuine PCMA companding encoder (g711_codec.alaw_encode)
    — actual European-telephony 8-bit logarithmic PCM on the wire."""
    from .g711_codec import alaw_encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b[id_col].tolist()
            payloads = []
            for i in ids:
                dig = hashlib.sha256(str(i).encode()).digest()
                samples = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(16)
                ]
                payloads.append(alaw_encode(samples))
            yield pd.DataFrame({id_col: ids, "alaw_bytes": payloads})

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, alaw_bytes binary"
    )


def alaw_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse + decode the ALW1 container (REAL G.711 A-law expansion) and
    reduce the lossy round trip to exact integer stats — the PCMA mirror
    of mulaw_roundtrip_stats."""
    from .g711_codec import alaw_decode

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                id_col: [],
                "peak_orig": [],
                "energy_recon": [],
                "max_abs_err": [],
                "sum_abs_err": [],
            }
            for i, payload in zip(b[id_col], b["alaw_bytes"]):
                recon = alaw_decode(bytes(payload))
                dig = hashlib.sha256(str(int(i)).encode()).digest()
                orig = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(len(recon))
                ]
                out[id_col].append(i)
                out["peak_orig"].append(max((abs(s) for s in orig), default=0))
                out["energy_recon"].append(sum(r * r for r in recon))
                out["max_abs_err"].append(
                    max((abs(a - b_) for a, b_ in zip(orig, recon)), default=0)
                )
                out["sum_abs_err"].append(
                    sum(abs(a - b_) for a, b_ in zip(orig, recon))
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        dec,
        schema=(
            f"{id_col} long, peak_orig long, energy_recon long, "
            "max_abs_err long, sum_abs_err long"
        ),
    )


def mulaw_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse + decode the ULW1 container (REAL G.711 expansion) and reduce
    the lossy round trip to exact integer stats — same contract as
    adpcm_roundtrip_stats, but the stateless companding law lets the
    oracle replay encode→decode with plain integer CASE arithmetic."""
    from .g711_codec import decode

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                id_col: [],
                "peak_orig": [],
                "energy_recon": [],
                "max_abs_err": [],
                "sum_abs_err": [],
            }
            for i, payload in zip(b[id_col], b["mulaw_bytes"]):
                recon = decode(bytes(payload))
                dig = hashlib.sha256(str(int(i)).encode()).digest()
                orig = [
                    (dig[2 * j] << 8 | dig[2 * j + 1]) - 32768
                    for j in range(len(recon))
                ]
                out[id_col].append(i)
                # 0-sample payloads are valid containers: zeroed stats,
                # same as decode_media's zero-length-media contract
                out["peak_orig"].append(max((abs(s) for s in orig), default=0))
                out["energy_recon"].append(sum(r * r for r in recon))
                out["max_abs_err"].append(
                    max((abs(a - b_) for a, b_ in zip(orig, recon)), default=0)
                )
                out["sum_abs_err"].append(
                    sum(abs(a - b_) for a, b_ in zip(orig, recon))
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        dec,
        schema=(
            f"{id_col} long, peak_orig long, energy_recon long, "
            "max_abs_err long, sum_abs_err long"
        ),
    )


def attach_synth_framevid(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL FRV1 raw-frame video container per row: geometry
    8x6 gray8, 4 + id%5 frames, pixel(f, y, x) = (x + 2*y + f*f + id) % 256
    — the f*f term makes consecutive-frame mean deltas non-constant, so
    scene-cut detection has real structure to find. Deterministic, so the
    oracle recomputes every frame statistic in closed form."""
    from .framevid_codec import encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b[id_col].tolist()
            payloads = []
            for d in ids:
                d = int(d)
                w, h = 8, 6
                frames = [
                    bytes(
                        (x + 2 * y + f * f + d) % 256
                        for y in range(h)
                        for x in range(w)
                    )
                    for f in range(4 + d % 5)
                ]
                payloads.append(encode(frames, w, h))
            yield pd.DataFrame({id_col: ids, "video_bytes": payloads})

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, video_bytes binary"
    )


def framevid_scene_stats(
    df: DataFrame, cut_threshold: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """REAL video decode (FRV1 container parse) → per-payload frame
    statistics: frame count, exact pixel checksum across all frames, and
    scene-cut count (consecutive frames whose integer mean brightness
    jumps by >= cut_threshold — the classic mean-delta cut detector).
    Only the scalars leave Python; frames never cross the shuffle."""
    from .framevid_codec import decode

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                id_col: [],
                "n_frames": [],
                "pixel_sum": [],
                "n_scene_cuts": [],
            }
            for i, payload in zip(b[id_col], b["video_bytes"]):
                _w, _h, _fps, frames = decode(bytes(payload))
                means = [sum(f) // len(f) for f in frames]
                cuts = sum(
                    1
                    for a, b_ in zip(means, means[1:])
                    if abs(a - b_) >= cut_threshold
                )
                out[id_col].append(i)
                out["n_frames"].append(len(frames))
                out["pixel_sum"].append(sum(sum(f) for f in frames))
                out["n_scene_cuts"].append(cuts)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        dec,
        schema=(
            f"{id_col} long, n_frames long, pixel_sum long, n_scene_cuts long"
        ),
    )


def png_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL decode → 8x8 nearest-neighbor downsample → average-hash: bit i
    set iff resampled pixel i exceeds the integer mean — the standard
    perceptual aHash, packed as two 32-bit words (lo: pixels 0-31, hi:
    32-63) so both engines stay in non-negative BIGINT arithmetic."""
    from . import png_codec

    def ah(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, _c, px = decode_image_bytes(bytes(r["media_bytes"]))
                rp = png_codec.nearest_resize(px, w, h, 8, 8)
                mean = sum(rp) // 64
                lo = sum(
                    (1 << i) for i in range(32) if rp[i] > mean
                )
                hi = sum(
                    (1 << i) for i in range(32) if rp[32 + i] > mean
                )
                rows.append((int(r[id_col]), lo, hi))
            yield pd.DataFrame(rows, columns=[id_col, "ahash_lo", "ahash_hi"])

    return df.mapInPandas(
        ah, schema=f"{id_col} long, ahash_lo long, ahash_hi long"
    )


def png_ahash_decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused single-decode form of ``png_ahash`` + ``png_decode_stats``
    (r10, guide §4: move the payload through the JVM↔Python boundary
    ONCE). A pipeline that needs both the perceptual hash and the decode
    stats of the same media column would otherwise run synthesis and
    inflate+unfilter twice — one mapInPandas per consumer. This operator
    decodes each image once and emits both result groups; each output
    column is byte-identical to its unfused counterpart (pinned by
    tests/test_multimodal_fused.py against the composed originals)."""
    from . import png_codec

    def ahs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, c, px = decode_image_bytes(bytes(r["media_bytes"]))
                rp = png_codec.nearest_resize(px, w, h, 8, 8)
                mean = sum(rp) // 64
                lo = sum((1 << i) for i in range(32) if rp[i] > mean)
                hi = sum((1 << i) for i in range(32) if rp[32 + i] > mean)
                rows.append((int(r[id_col]), lo, hi, w, h, c, int(sum(px))))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "ahash_lo",
                    "ahash_hi",
                    "width",
                    "height",
                    "channels",
                    "pixel_sum",
                ],
            )

    return df.mapInPandas(
        ahs,
        schema=(
            f"{id_col} long, ahash_lo long, ahash_hi long, width int,"
            " height int, channels int, pixel_sum long"
        ),
    )


def wav_vad_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    frame: int = 4,
    threshold: int = 1_400_000_000,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation over decoded PCM16:
    split the waveform into fixed ``frame``-sample frames, mark a frame
    active when its energy (sum of squared samples) exceeds ``threshold``,
    and reduce the active/inactive sequence to segment statistics
    (active frames, segment count, longest run) per clip.

    The whole frame walk happens INSIDE the Arrow batch right after the
    container parse — samples never leave the executor, nothing row-level
    shuffles, and the output is 5 ints per clip regardless of duration:
    the decode-at-scale shape for audio (cf. ``wav_decode_stats``).
    """
    from .wav_codec import decode_wav

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                id_col: [],
                "n_frames": [],
                "n_active": [],
                "n_segments": [],
                "max_run": [],
            }
            for i, payload in zip(b[id_col], b["wav_bytes"]):
                _, _, samples = decode_wav(bytes(payload))
                flags = []
                for f0 in range(0, len(samples) - frame + 1, frame):
                    e = sum(s * s for s in samples[f0 : f0 + frame])
                    flags.append(e > threshold)
                n_seg = run = best = 0
                prev = False
                for a in flags:
                    if a:
                        run += 1
                        best = max(best, run)
                        if not prev:
                            n_seg += 1
                    else:
                        run = 0
                    prev = a
                out[id_col].append(i)
                out["n_frames"].append(len(flags))
                out["n_active"].append(sum(flags))
                out["n_segments"].append(n_seg)
                out["max_run"].append(best)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        seg,
        schema=(
            f"{id_col} long, n_frames int, n_active int, "
            "n_segments int, max_run int"
        ),
    )


def png_patch_stats(
    df: DataFrame, patch: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """REAL decode + ViT-style patch grid: the decoded pixel plane is cut
    into ``patch`` x ``patch`` tiles (ragged edge tiles keep their partial
    size, like ViT padding masks) and each tile reports its exact integer
    sum/count — the patch-embedding preprocessing shape, value-checkable
    because the synthetic pattern is closed-form. Payload bytes never
    leave the Arrow stage; only the bounded per-patch rows shuffle."""

    def pt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, _c, px = decode_image_bytes(bytes(r["media_bytes"]))
                sums: dict = {}
                for y in range(h):
                    base = y * w
                    for x in range(w):
                        key = (y // patch, x // patch)
                        s, n = sums.get(key, (0, 0))
                        sums[key] = (s + px[base + x], n + 1)
                for (pi, pj), (s, n) in sums.items():
                    rows.append((int(r[id_col]), pi, pj, n, s, s // n))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "patch_i", "patch_j", "n_px", "patch_sum", "patch_mean"],
            )

    return df.mapInPandas(
        pt,
        schema=(
            f"{id_col} long, patch_i int, patch_j int, n_px int,"
            " patch_sum long, patch_mean long"
        ),
    )
