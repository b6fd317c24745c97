#!/usr/bin/env python3
"""r11 hot-key characterization for the two applyInPandas block kernels
(VERDICT r10 directive #2): at the 100x replica,

1. census the REAL block sizes both declared queries produce (how much
   headroom the max_block_rows=200k guard has in practice),
2. run each kernel on an ENGINEERED hot key — every input row forced
   into ONE block — and time it green (the straggler cost of a single
   maximal block, i.e. what a degenerate corpus costs before the guard),
3. show the guard fires descriptively when the bound is set below the
   hot block.

Usage: python3 tools/exp_hotkey_r11.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafka_streams_and_ktable_example_spark.functions import as_double_array
from kafka_streams_and_ktable_example_spark.operators.similarity import (
    intvec_block_topk_neighbors,
    round_halfup_ge_boundary,
    semdedup_block_dups,
)
from kafka_streams_and_ktable_example_spark.session import (
    get_spark,
    tune_for_input,
)
from kafka_streams_and_ktable_example_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp_hotkey_r11")
    tune_for_input(spark, sf_dir)
    sc = spark.sparkContext

    # --- semdedup: real census + hot block -------------------------------
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    norm = F.expr("sqrt(aggregate(transform(v, x -> x * x), 0.0D, (a, x) -> a + x))")
    n_emb = emb.count()
    # real query block census: 8 nearest-centroid clusters (the query's own
    # assignment); report max block vs the guard
    from pyspark.sql import Window as W

    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    w = W.partitionBy("vec_id").orderBy("dist", "cid")
    assigned = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "cid", "v", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("rn", "dist")
    )
    census = assigned.groupBy("cid").count().agg(
        F.max("count").alias("mx"), F.count("*").alias("nblk")
    ).first()
    print(
        f"semdedup census @ {sf_dir}: {n_emb} vectors, {census['nblk']} blocks, "
        f"max block {census['mx']} rows (guard 200000: "
        f"{200000 // max(census['mx'], 1)}x headroom)",
        flush=True,
    )

    # hot block: every sampled vector in ONE cid. Deterministic modulus
    # sample caps the engineered block at ~60k rows (the quadratic pair
    # time of a single maximal task, not box-days) — still several times
    # any real block the census above reports.
    step = max(1, n_emb // 60_000)
    hot = (
        emb.where(F.expr(f"pmod(vec_id, {step}) = 0"))
        .select(F.lit(0).alias("cid"), "vec_id", "v")
        .withColumn("nrm", norm)
    )
    n_hot = hot.count()
    boundary = round_halfup_ge_boundary("0.3", 4)
    sc.setJobDescription("hot semdedup block")
    t0 = time.time()
    n_dups = semdedup_block_dups(hot, boundary).count()
    t_hot = time.time() - t0
    print(
        f"semdedup HOT block: {n_hot} rows in ONE block -> kernel green in "
        f"{t_hot:.1f}s ({n_dups} dups)",
        flush=True,
    )
    try:
        semdedup_block_dups(hot, boundary, max_block_rows=max(1, n_hot // 2)).count()
        print("semdedup guard: DID NOT FIRE (unexpected)")
    except Exception as exc:
        msg = str(exc)
        ok = "max_block_rows" in msg
        print(f"semdedup guard fired descriptively: {ok}", flush=True)

    # --- SAX top-k: real census + hot block -------------------------------
    # the query's own `words` relation, rebuilt verbatim up to the kernel
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
        "user_id",
        "arr",
        F.expr(
            "array_join(transform(sequence(0, 5), i ->"
            " substring('LLMMHH', 1 + size(filter(sequence(0, 5),"
            "   j -> s[j] < s[i] OR (s[j] = s[i] AND j < i))), 1)), '')"
        ).alias("word"),
    ).persist()
    n_users = words.count()
    census2 = words.groupBy("word").count().agg(
        F.max("count").alias("mx"), F.count("*").alias("nblk")
    ).first()
    print(
        f"sax census @ {sf_dir}: {n_users} users, {census2['nblk']} words, "
        f"max block {census2['mx']} rows (guard 200000: "
        f"{200000 // max(census2['mx'], 1)}x headroom)",
        flush=True,
    )
    step2 = max(1, n_users // 30_000)
    hot_words = (
        words.where(F.expr(f"pmod(user_id, {step2}) = 0"))
        .select(F.lit("HOT").alias("word"), F.col("user_id").alias("uid"), "arr")
    )
    n_hot2 = hot_words.count()
    sc.setJobDescription("hot sax block")
    t0 = time.time()
    n_rows = intvec_block_topk_neighbors(hot_words, k=3).count()
    t_hot2 = time.time() - t0
    print(
        f"sax HOT block: {n_hot2} users in ONE word -> kernel green in "
        f"{t_hot2:.1f}s ({n_rows} rows)",
        flush=True,
    )
    try:
        intvec_block_topk_neighbors(hot_words, k=3, max_block_rows=max(1, n_hot2 // 2)).count()
        print("sax guard: DID NOT FIRE (unexpected)")
    except Exception as exc:
        ok = "max_block_rows" in str(exc)
        print(f"sax guard fired descriptively: {ok}", flush=True)


if __name__ == "__main__":
    main()
