"""Paired A/B: Column-chain vs string-form construction of
rp_lsh_candidate_pairs (r10 §18).

Arm A is the pre-change Column-chain body copied VERBATIM (the py4j-heavy
form: n_planes x (dim lits + ~6 ops) round trips); arm B is the shipped
string-form operator.  Both arms build the full ann_lsh_rp_pairs frame in
ONE session, interleaved, so box drift hits both equally.  Also dumps
explain("formatted") of both forms for the plan-identity check and runs a
value-identity assert (exceptAll both ways == 0).

Usage: python3 tools/exp_rp_lsh_build.py <sf_dir> [reps]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafka_streams_and_ktable_example_spark.session import get_spark, tune_for_input  # noqa: E402
from kafka_streams_and_ktable_example_spark.sources.tables import load_table  # noqa: E402
from kafka_streams_and_ktable_example_spark.operators.similarity import (  # noqa: E402
    _rp_signs,
    rp_lsh_band_bits,
    rp_lsh_candidate_pairs,
    with_norm,
)
from kafka_streams_and_ktable_example_spark.functions import (  # noqa: E402
    as_double_array,
    cosine,
)


def rp_lsh_candidate_pairs_column_form(
    emb, id_col="vec_id", vec_col="embedding", dim=64, n_planes=16, bands=4
):
    """Pre-r10-§18 body, verbatim."""
    if n_planes is None:
        n_planes = bands * rp_lsh_band_bits(emb.count())
    v = as_double_array(vec_col)
    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(s) for s in _rp_signs(p, dim)])
        dot_p = F.aggregate(
            F.zip_with(v, signs, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(F.round(dot_p, 6) > 0, F.lit("1")).otherwise(F.lit("0")))
    code = F.concat(*bits)
    width = n_planes // bands
    coded = emb.select(F.col(id_col), code.alias("code"))
    banded = coded.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.substring("code", b * width + 1, width).alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_val")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_val")
    return (
        a.join(b, on=["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def full_query(spark, sf_dir, cand_fn):
    emb = load_table(spark, sf_dir, "embeddings")
    cand = cand_fn(emb, n_planes=None)
    e = with_norm(emb).select(
        F.col("vec_id"), F.col("_v").alias("v"), F.col("_norm").alias("n")
    )
    ea = e.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    eb = e.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    sim = F.round(cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 4)
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cos_sim", sim)
        .where(F.col("cos_sim") >= 0.3)
        .select("id_a", "id_b", "cos_sim")
    )


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    tune_for_input(spark, sf_dir)
    # warm-up: one build+action of each arm (JVM/codegen spin-up)
    for fn in (rp_lsh_candidate_pairs_column_form, rp_lsh_candidate_pairs):
        full_query(spark, sf_dir, fn).write.format("noop").mode("overwrite").save()

    col_builds, str_builds = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        df_a = full_query(spark, sf_dir, rp_lsh_candidate_pairs_column_form)
        col_builds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        df_b = full_query(spark, sf_dir, rp_lsh_candidate_pairs)
        str_builds.append(time.perf_counter() - t0)
    print(f"build column-form: min {min(col_builds):.3f}s  all {['%.3f' % t for t in col_builds]}")
    print(f"build string-form: min {min(str_builds):.3f}s  all {['%.3f' % t for t in str_builds]}")

    # value identity
    n_ab = df_a.exceptAll(df_b).count()
    n_ba = df_b.exceptAll(df_a).count()
    print(f"exceptAll a\\b={n_ab} b\\a={n_ba}")
    assert n_ab == 0 and n_ba == 0, "VALUE MISMATCH"

    # plan dumps
    with open("plans/r10/ann_lsh_rp_pairs_before.txt", "w") as f:
        f.write(df_a._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    with open("plans/r10/ann_lsh_rp_pairs_after.txt", "w") as f:
        f.write(df_b._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print("plan files written")
    spark.stop()


if __name__ == "__main__":
    main()
