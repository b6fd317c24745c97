"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake or NotImplementedError), but everything Spark-side is
real and tested: binary columns, typed metadata structs, Arrow-batched
mapInPandas signatures, partitioning. Swapping the stub for a real codec
(PIL/ffmpeg on cluster images) changes one function body, not the plan.

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
    With ``fake=False`` raises NotImplementedError where a real codec
    (PIL / torchaudio / ffmpeg) would be invoked on a cluster image.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this container; install PIL/ffmpeg and replace this "
                    "branch"
                )
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
    ``fake=False`` raises NotImplementedError where PIL/ffmpeg scaling
    would run on a cluster image.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resize requires codec libraries not present in "
                    "this container; install PIL/ffmpeg and replace this "
                    "branch"
                )
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
