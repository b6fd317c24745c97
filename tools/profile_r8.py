"""Round-8 stage profiles (VERDICT r7 directives #3 and #5).

Times the internal stages of the two rows under investigation so the
annotation is MEASURED, not guessed (the r7 lesson):

- graph_edge_triangle_support at the 100x replica: edge-build vs
  wedge+close vs support-fold share.
- dedup_minhash_lsh / dedup_pipeline_lsh_jaccard at sf0.1 and 10x:
  shingle+signature share vs band-join share vs verify share.

Usage: python3 tools/profile_r8.py [triangle|minhash] [factor]
Writes tools/profile_r8_<what>.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from kafka_streams_and_ktable_example_spark.session import get_spark, tune_for_input  # noqa: E402
from kafka_streams_and_ktable_example_spark.sources.scale_replicate import replicate_sf  # noqa: E402
from kafka_streams_and_ktable_example_spark.sources.tables import load_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def timed(label, thunk, out):
    t0 = time.time()
    n = thunk()
    dt = round(time.time() - t0, 2)
    out[label] = {"sec": dt, "rows": n}
    print(f"  {label}: {dt}s ({n} rows)", flush=True)
    return n


def profile_triangle(spark, sf_dir, out):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
        .persist()
    )
    timed("edge_build", e.count, out)
    x, y = e.alias("x"), e.alias("y")
    wedges = x.join(
        y, (F.col("x.pa") == F.col("y.pa")) & (F.col("x.pb") < F.col("y.pb"))
    ).select(
        F.col("x.pa").alias("u"), F.col("x.pb").alias("v"), F.col("y.pb").alias("w")
    )
    timed("wedge_count", wedges.count, out)
    closing = e.select(F.col("pa").alias("v2"), F.col("pb").alias("w2"))
    tri = wedges.join(
        closing, (F.col("v") == F.col("v2")) & (F.col("w") == F.col("w2"))
    ).select("u", "v", "w").persist()
    timed("triangle_close", tri.count, out)
    sides = (
        tri.groupBy(F.col("u").alias("pa"), F.col("v").alias("pb"))
        .agg(F.count("*").alias("sup"))
        .unionByName(
            tri.groupBy(F.col("u").alias("pa"), F.col("w").alias("pb"))
            .agg(F.count("*").alias("sup"))
        )
        .unionByName(
            tri.groupBy(F.col("v").alias("pa"), F.col("w").alias("pb"))
            .agg(F.count("*").alias("sup"))
        )
    )
    support = sides.groupBy("pa", "pb").agg(F.sum("sup").alias("support"))
    dist = e.join(support, ["pa", "pb"], "left").select(
        F.coalesce(F.col("support"), F.lit(0)).alias("sup")
    )
    hist = dist.groupBy(F.col("sup").cast("long").alias("triangle_support")).agg(
        F.count("*").cast("long").alias("n_edges")
    )
    timed("support_fold", hist.count, out)
    e.unpersist()
    tri.unpersist()


def profile_minhash(spark, sf_dir, out):
    from kafka_streams_and_ktable_example_spark.operators.dedup import (
        _exploded_shingles,
        lsh_bands,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    shingles = _exploded_shingles(docs, "doc_id", "text", 3).persist()
    timed("shingle_explode_digest", shingles.count, out)
    sigs = minhash_signatures(docs, shingles=shingles)
    timed("minhash_signatures", sigs.count, out)
    bands = lsh_bands(sigs)
    timed("lsh_bands", bands.count, out)
    pairs = minhash_lsh_pairs(docs, shingles=shingles)
    timed("lsh_pairs_full", pairs.count, out)
    shingles.unpersist()


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "triangle"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark(f"profile-r8-{what}")
    base = "/root/testdata/sf0.1"
    if factor > 1:
        sf_dir = replicate_sf(spark, base, factor)
    else:
        sf_dir = base
    tune_for_input(spark, sf_dir)
    out = {"what": what, "factor": factor, "sf_dir": sf_dir}
    t0 = time.time()
    if what == "triangle":
        profile_triangle(spark, sf_dir, out)
    else:
        profile_minhash(spark, sf_dir, out)
    out["total_sec"] = round(time.time() - t0, 2)
    path = f"tools/profile_r8_{what}_{factor}x.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()