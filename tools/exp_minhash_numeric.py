#!/usr/bin/env python3
"""A/B prototype: minhash signature aggregation over LONG digests
(HashAggregate) vs the current string min (SortAggregate).

Correctness precondition: for fixed-width lowercase hex, lexicographic
order == numeric order, so min(conv(slice,16,10)) mapped back through
lpad(lower(hex(x)),8,'0') must equal min(slice) exactly.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_and_ktable_example_spark.operators.dedup import (  # noqa: E402
    _exploded_shingles,
)
from kafka_streams_and_ktable_example_spark.session import (  # noqa: E402
    get_spark,
    tune_for_input,
)
from kafka_streams_and_ktable_example_spark.sources.tables import load_table  # noqa: E402


def sigs_string(sh):
    digs = sh.selectExpr(
        "doc_id",
        *[f"md5(concat('{s}:', sh)) AS dig{s}" for s in range(4)],
    )
    aggs = [
        F.expr(f"min(substring(dig{s}, {j * 8 + 1}, 8)) AS mh{4 * s + j}")
        for s in range(4)
        for j in range(4)
    ]
    return digs.groupBy("doc_id").agg(*aggs)


def sigs_numeric(sh):
    digs = sh.selectExpr(
        "doc_id",
        *[f"md5(concat('{s}:', sh)) AS dig{s}" for s in range(4)],
    )
    aggs = [
        F.expr(
            f"min(cast(conv(substring(dig{s}, {j * 8 + 1}, 8), 16, 10) "
            f"as bigint)) AS n{4 * s + j}"
        )
        for s in range(4)
        for j in range(4)
    ]
    num = digs.groupBy("doc_id").agg(*aggs)
    return num.selectExpr(
        "doc_id",
        *[f"lpad(lower(hex(n{i})), 8, '0') AS mh{i}" for i in range(16)],
    )


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-minhash")
    tune_for_input(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    # correctness: exact equality of the 16 signature columns
    sh = _exploded_shingles(docs, "doc_id", "text", 3)
    a = sigs_string(sh)
    b = sigs_numeric(sh)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"value diff rows: {diff}")
    assert diff == 0, "numeric rewrite changed values!"

    for label, fn in [("string-min", sigs_string), ("numeric-min", sigs_numeric)]:
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            force(fn(_exploded_shingles(docs, "doc_id", "text", 3)))
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        print(f"{label}: {best:.3f}s")
        fn(_exploded_shingles(docs, "doc_id", "text", 3)).explain("formatted")


if __name__ == "__main__":
    main()
