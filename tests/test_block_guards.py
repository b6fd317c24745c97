"""r11 group-size guards for the two applyInPandas block kernels
(operators/similarity.py): an oversized group must raise a descriptive
error naming the knob instead of OOMing/straggling the task (guide §5),
a group at/under the bound must be unaffected, and raising the bound
explicitly must still produce the exact result — i.e. the guard is a
guard, not a behavior change."""

import pytest
from pyspark.sql import functions as F


def _vec_fixture(spark, n, cid=7):
    rows = [(cid, i, [float((i * 13 + d) % 5 + 1) for d in range(4)]) for i in range(n)]
    df = spark.createDataFrame(rows, "cid int, vec_id long, v array<double>")
    return df.withColumn(
        "nrm", F.expr("sqrt(aggregate(v, 0.0D, (a, x) -> a + x * x))")
    )


def _sax_fixture(spark, n, word="ww"):
    rows = [(word, i, [int((i * 7 + c) % 9) for c in range(3)]) for i in range(n)]
    return spark.createDataFrame(rows, "word string, uid long, arr array<bigint>")


def test_semdedup_guard_fires_on_giant_block(spark):
    from kafka_streams_and_ktable_example_spark.operators.similarity import (
        semdedup_block_dups,
    )

    df = _vec_fixture(spark, 150)
    out = semdedup_block_dups(df, 0.5, max_block_rows=100)
    with pytest.raises(Exception, match="max_block_rows"):
        out.collect()


def test_semdedup_under_bound_and_raised_bound_identical(spark):
    from kafka_streams_and_ktable_example_spark.operators.similarity import (
        semdedup_block_dups,
    )

    df = _vec_fixture(spark, 150)
    base = sorted(r["vec_id"] for r in semdedup_block_dups(df, 0.5).collect())
    raised = sorted(
        r["vec_id"]
        for r in semdedup_block_dups(df, 0.5, max_block_rows=150).collect()
    )
    assert base == raised and len(base) > 0


def test_sax_guard_fires_on_giant_block(spark):
    from kafka_streams_and_ktable_example_spark.operators.similarity import (
        intvec_block_topk_neighbors,
    )

    df = _sax_fixture(spark, 150)
    out = intvec_block_topk_neighbors(df, k=3, max_block_rows=100)
    with pytest.raises(Exception, match="max_block_rows"):
        out.collect()


def test_sax_under_bound_and_raised_bound_identical(spark):
    from kafka_streams_and_ktable_example_spark.operators.similarity import (
        intvec_block_topk_neighbors,
    )

    df = _sax_fixture(spark, 150)
    key = lambda r: (r["uid"], r["rank"], r["neighbor"], r["dist"])  # noqa: E731
    base = sorted(map(key, intvec_block_topk_neighbors(df, k=3).collect()))
    raised = sorted(
        map(key, intvec_block_topk_neighbors(df, k=3, max_block_rows=150).collect())
    )
    assert base == raised and len(base) == 150 * 3
