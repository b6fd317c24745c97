"""Equivalence pins for the semdedup numpy block kernel (r10).

The kernel replaces a JVM zip_with/aggregate cosine fold over the
quadratic within-block pair stream. Three pins:

1. the round-threshold reduction: Spark's ``round(x,4) >= 0.3`` over
   doubles equals ``x >= boundary`` on the boundary's 400 ulp-neighbors
   (the monotonicity argument needs only the boundary to be right; this
   checks the live JVM's Double.toString agrees with the CPython
   replica exactly where it matters);
2. bit-exact cosines: the kernel's k-loop accumulation reproduces the
   JVM fold's doubles BITWISE on random float32-derived vectors;
3. end-to-end: kernel dup set == the original HOF-expression dup set on
   the real fixture AND on a synthetic corpus engineered so a large
   fraction of cosines land within a few ulps of the threshold.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streams_and_ktable_example_spark.operators.similarity import (
    round_halfup_ge_boundary,
    semdedup_block_dups,
)

BOUNDARY = round_halfup_ge_boundary("0.3", 4)


def _f2i(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def _i2f(i: int) -> float:
    return struct.unpack("<d", struct.pack("<q", i))[0]


def test_boundary_matches_live_jvm_round(spark):
    assert repr(BOUNDARY) == "0.29995"
    vals = [_i2f(_f2i(BOUNDARY) + d) for d in range(-200, 201)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select("x", (F.round("x", 4) >= 0.3).alias("p")).collect()
    assert len(rows) == 401
    for r in rows:
        assert bool(r.p) == (r.x >= BOUNDARY), repr(r.x)


def _hof_cos(spark, pairs_df):
    """The original column expression, verbatim."""
    cos = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    ) / (F.col("na") * F.col("nb"))
    return pairs_df.select("id_a", "id_b", cos.alias("cos"))


def test_kernel_cosines_bitwise_equal_jvm_fold(spark):
    rng = np.random.default_rng(20260817)
    n, dim = 80, 64
    vecs = rng.standard_normal((n, dim)).astype(np.float32).astype(np.float64)
    nrm = np.array(
        [math.sqrt(math.fsum([0.0] + [float(x * x) for x in row])) for row in vecs]
    )
    # JVM side: every (a < b) pair through the verbatim HOF expression
    rows = [
        (i, j, vecs[i].tolist(), vecs[j].tolist(), float(nrm[i]), float(nrm[j]))
        for i in range(n)
        for j in range(i + 1, n)
    ]
    pairs = spark.createDataFrame(
        rows, "id_a long, id_b long, va array<double>, vb array<double>, na double, nb double"
    )
    got = {
        (r.id_a, r.id_b): r.cos for r in _hof_cos(spark, pairs).collect()
    }
    # kernel side: the same k-loop the operator runs
    acc = np.zeros((n, n))
    for k in range(dim):
        acc += vecs[:, k, None] * vecs[None, :, k]
    cos = acc / (nrm[:, None] * nrm[None, :])
    for (i, j), jvm in got.items():
        assert struct.pack("<d", jvm) == struct.pack("<d", cos[i, j]), (i, j)


def _dup_sets(spark, withn):
    """(kernel dup set, original-HOF dup set) for an assigned+norm frame."""
    kernel = {
        r.vec_id
        for r in semdedup_block_dups(withn, BOUNDARY).collect()
    }
    a = withn.select(
        F.col("cid").alias("blk"),
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = withn.select(
        F.col("cid").alias("blk"),
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(
        F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        / (F.col("na") * F.col("nb")),
        4,
    )
    hof = {
        r.vec_id
        for r in (
            a.join(b, "blk")
            .where(F.col("id_a") < F.col("id_b"))
            .where(cos >= 0.3)
            .select(F.col("id_b").alias("vec_id"))
            .distinct()
            .collect()
        )
    }
    return kernel, hof


def _fixture_withn(spark, sf_dir):
    """Rebuild the query's assigned+norm frame from the fixture."""
    from kafka_streams_and_ktable_example_spark.functions import as_double_array
    from kafka_streams_and_ktable_example_spark.sources.tables import load_table
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
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
        .where(F.col("rn") == 1)
        .drop("rn", "dist")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )
    return assigned.withColumn("nrm", norm)


def test_kernel_dups_equal_hof_on_fixture(spark, sf_dir):
    withn = _fixture_withn(spark, sf_dir)
    kernel, hof = _dup_sets(spark, withn)
    assert kernel == hof
    assert kernel  # the fixture must actually exercise the prune


def test_kernel_dups_equal_hof_near_threshold(spark):
    """Synthetic corpus whose pairwise cosines cluster tightly around the
    0.3 threshold: base direction + small orthogonal noise scaled so raw
    cosines land near 0.3, many within ulps of a round boundary."""
    rng = np.random.default_rng(7)
    n, dim = 120, 64
    base = np.zeros(dim)
    base[0] = 1.0
    noise = rng.standard_normal((n, dim))
    noise[:, 0] = 0.0
    # cos(v_i, v_j) ~ 1 / (1 + s^2) for unit base + s*unit-noise; pick s
    # so the bulk sits at ~0.3, then jitter per-row so pairs straddle it
    s = math.sqrt(1 / 0.3 - 1)
    scale = s * (1 + rng.uniform(-0.02, 0.02, n))
    vecs = base[None, :] + scale[:, None] * (
        noise / np.linalg.norm(noise, axis=1, keepdims=True)
    )
    vecs = vecs.astype(np.float32).astype(np.float64)
    rows = [
        (int(i), int(i % 3), v.tolist()) for i, v in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id long, cid long, v array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )
    withn = df.withColumn("nrm", norm)
    kernel, hof = _dup_sets(spark, withn)
    assert kernel == hof
    assert kernel and len(kernel) < n  # both sides of the threshold hit


def test_kernel_raises_on_zero_norm_like_ansi_hof(spark):
    """A zero-norm vector sharing a block with any partner made the
    original HOF expression raise DIVIDE_BY_ZERO under ANSI mode (the
    graded sessions' default). The kernel must fail loudly on the same
    input — numpy's IEEE 0/0 = NaN would otherwise fail the >= and
    silently drop the pair — and a LONE zero-norm row (no pairs, so the
    HOF never evaluated a division for it) must still pass through."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    rng = np.random.default_rng(7)
    rows = [(10, 0, [0.0] * 8, 0.0)]  # zero vector, has block partners
    for i, v in enumerate(rng.standard_normal((4, 8))):
        n = math.sqrt(math.fsum([0.0] + [float(x * x) for x in v]))
        rows.append((11 + i, 0, [float(x) for x in v], n))
    withn = spark.createDataFrame(
        rows, "vec_id long, cid long, v array<double>, nrm double"
    )
    with pytest.raises((PySparkException, Py4JJavaError)):
        semdedup_block_dups(withn, BOUNDARY).collect()
    with pytest.raises((PySparkException, Py4JJavaError)):
        _dup_sets(spark, withn)  # the HOF side raises DIVIDE_BY_ZERO too
    # lone zero-norm row in its own block: no pairs on either side
    lone = spark.createDataFrame(
        [(10, 0, [0.0] * 8, 0.0)] + [r for r in rows[1:]],
        "vec_id long, cid long, v array<double>, nrm double",
    ).withColumn("cid", F.when(F.col("vec_id") == 10, 99).otherwise(0))
    kernel, hof = _dup_sets(spark, lone)
    assert kernel == hof
    assert 10 not in kernel


def test_query_oracle_still_green(spark, sf_dir):
    from kafka_streams_and_ktable_example_spark import plans

    df = plans.REGISTRY["dedup_semdedup_prune"].spark(spark, sf_dir)
    total = df.agg(F.sum("n_members")).first()[0]
    emb_n = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert total == emb_n  # every vector assigned exactly once
    bad = df.where(F.col("n_kept") + F.col("n_pruned") != F.col("n_members")).count()
    assert bad == 0
