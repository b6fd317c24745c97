"""Equivalence pins for the SAX-block integer top-k kernel (r10).

The kernel replaces a word-blocked pair self-join + interpreted
integer-L2 HOF + per-user rank window. Integer arithmetic removes every
float concern — the pin is row-identity against the verbatim original
expression, on the real fixture and on a synthetic block engineered
with heavy distance ties (identical profiles) so the (dist, neighbor)
tie-break is actually exercised.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_streams_and_ktable_example_spark.operators.similarity import (
    intvec_block_topk_neighbors,
)


def _original_topk(words):
    """The pre-r10 tail, verbatim."""
    a = words.select(
        F.col("uid"), F.col("arr").alias("aarr"), "word"
    )
    b = words.select(
        F.col("uid").alias("neighbor"), F.col("arr").alias("barr"), "word"
    )
    cand = (
        a.join(b, "word")
        .where(F.col("uid") != F.col("neighbor"))
        .select(
            "uid",
            "neighbor",
            F.expr(
                "CAST(aggregate(zip_with(aarr, barr,"
                " (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT),"
                " (acc, x) -> acc + x) AS BIGINT)"
            ).alias("dist_cents2"),
        )
    )
    w = W.partitionBy("uid").orderBy("dist_cents2", "neighbor")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "uid", "neighbor", "dist_cents2", F.col("rank").cast("int").alias("rank")
        )
    )


def _rows(df):
    return sorted(
        (r.uid, r.neighbor, r.dist_cents2, r["rank"]) for r in df.collect()
    )


def _kernel_rows(words):
    return _rows(
        intvec_block_topk_neighbors(words, k=3).select(
            "uid", "neighbor", F.col("dist").alias("dist_cents2"), "rank"
        )
    )


def test_kernel_rows_identical_on_fixture(spark, sf_dir):
    from kafka_streams_and_ktable_example_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.col("ts").cast("date")).alias("_d0"))
    daily = (
        ev.crossJoin(F.broadcast(d0))
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.col("_d0")).alias("di"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("user_id", "di")
        .agg(F.sum("c").alias("cents"))
    )
    prof = (
        daily.groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("di", "cents"))).alias("m"))
        .select(
            "user_id",
            F.expr(
                "transform(sequence(0, 29),"
                " i -> coalesce(element_at(m, i), CAST(0 AS BIGINT)))"
            ).alias("arr"),
        )
    )
    segs = prof.select(
        "user_id",
        "arr",
        F.expr(
            "transform(sequence(0, 5),"
            " k -> aggregate(slice(arr, k*5+1, 5), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x))"
        ).alias("s"),
    )
    words = segs.select(
        F.col("user_id").alias("uid"),
        "arr",
        F.expr(
            "array_join(transform(sequence(0, 5), i ->"
            " substring('LLMMHH', 1 + size(filter(sequence(0, 5),"
            "   j -> s[j] < s[i] OR (s[j] = s[i] AND j < i))), 1)), '')"
        ).alias("word"),
    ).persist()
    got = _kernel_rows(words.select("word", "uid", "arr"))
    want = _rows(_original_topk(words))
    words.unpersist()
    assert got == want
    assert got  # fixture must exercise the path


def test_kernel_rows_identical_with_heavy_ties(spark):
    """Blocks containing exact-duplicate profiles (dist 0 ties at the
    cutoff) and singleton/pair blocks — the rank tie-break must pick the
    lowest neighbor ids, and blocks with fewer than k+1 members emit
    short lists, exactly like the window form."""
    rng = np.random.default_rng(42)
    rows = []
    uid = 0
    for blk in range(4):
        size = (1, 2, 7, 40)[blk]
        base = rng.integers(0, 50, size=(max(1, size // 3), 30))
        for i in range(size):
            profile = base[i % len(base)]  # duplicates within block
            rows.append((uid, f"W{blk}", [int(x) for x in profile]))
            uid += 1
    df = spark.createDataFrame(rows, "uid long, word string, arr array<bigint>")
    got = _kernel_rows(df.select("word", "uid", "arr"))
    want = _rows(_original_topk(df))
    assert got == want
    assert any(r[2] == 0 for r in got)  # dist-0 ties actually occurred
