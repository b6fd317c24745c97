"""Pin the fused single-decode operator (r10, guide §4) against the
composition of the two originals it replaces in pipeline_multimodal_prep:
every output column of png_ahash_decode_stats must be byte-identical to
png_ahash ⋈ png_decode_stats over the same media frame."""

from pyspark.sql import functions as F


def test_png_ahash_decode_stats_matches_composed_originals(spark):
    from kafka_streams_and_ktable_example_spark.operators.multimodal import (
        attach_synth_png,
        png_ahash,
        png_ahash_decode_stats,
        png_decode_stats,
    )

    docs = spark.range(24).select(F.col("id").alias("doc_id"))
    media = attach_synth_png(docs).persist()
    try:
        fused = {
            r["doc_id"]: r for r in png_ahash_decode_stats(media).collect()
        }
        hashes = {r["doc_id"]: r for r in png_ahash(media).collect()}
        stats = {r["doc_id"]: r for r in png_decode_stats(media).collect()}
    finally:
        media.unpersist()

    assert set(fused) == set(hashes) == set(stats) == set(range(24))
    for d in range(24):
        f, h, s = fused[d], hashes[d], stats[d]
        assert (f["ahash_lo"], f["ahash_hi"]) == (
            h["ahash_lo"],
            h["ahash_hi"],
        ), d
        assert (f["width"], f["height"], f["channels"], f["pixel_sum"]) == (
            s["width"],
            s["height"],
            s["channels"],
            s["pixel_sum"],
        ), d
