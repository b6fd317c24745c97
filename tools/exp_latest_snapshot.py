#!/usr/bin/env python3
"""A/B: latest_snapshot with an early value-field projection.

Variant A (current): max_by(value_struct, offset) — struct agg buffer, so
Spark plans SortAggregate (sort per partition, both sides of the
exchange).

Variant B: project value down to the fields the query needs BEFORE the
aggregate; when every kept field is hash-mutable (numeric/bool/ts), the
whole aggregation runs as HashAggregate. Null-ness of the struct is
preserved via an explicit CASE WHEN so tombstone semantics are identical.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_and_ktable_example_spark.operators.ktable import (  # noqa: E402
    latest_snapshot,
)
from kafka_streams_and_ktable_example_spark.session import (  # noqa: E402
    get_spark,
    tune_for_input,
)
from kafka_streams_and_ktable_example_spark.sources.changelog import (  # noqa: E402
    orders_changelog,
    shareholders_changelog,
)


def project_value(cl, fields):
    keep = F.when(
        F.col("value").isNotNull(),
        F.struct(*[F.col(f"value.{f}").alias(f) for f in fields]),
    )
    return cl.select("key", keep.alias("value"), "offset")


def rollup(snap):
    return snap.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def force(df):
    df.write.mode("overwrite").format("noop").save()


def best_of(spark, n, fn):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        force(fn())
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-snap")
    tune_for_input(spark, sf_dir)

    def latest_fields(cl, fields):
        """Per-field max_by: every buffer primitive -> HashAggregate."""
        latest = cl.groupBy("key").agg(
            *[F.max_by(f"value.{f}", "offset").alias(f) for f in fields],
            F.max_by(F.col("value").isNotNull(), F.col("offset")).alias("_live"),
            F.max("offset").alias("offset"),
        )
        return latest.where(F.col("_live")).drop("_live")

    cur = lambda: rollup(latest_snapshot(orders_changelog(spark, sf_dir)))
    proj = lambda: rollup(
        latest_fields(
            orders_changelog(spark, sf_dir), ["o_custkey", "o_totalprice"]
        )
    )
    a, b = cur(), proj()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"ord_rollup value diff rows: {diff}")
    assert diff == 0

    print(f"ord_rollup current : {best_of(spark, 4, cur):.3f}s")
    print(f"ord_rollup projected: {best_of(spark, 4, proj):.3f}s")
    proj().explain("formatted")

    # shareholders: strings stay, but the row narrows (ticker/amount drop)
    def sh_view(snap):
        return (
            snap.where(F.col("exchange") == "NASDAQ")
            .groupBy("client")
            .agg(F.sort_array(F.collect_set("id")).alias("p"))
            .select("client", F.concat_ws(",", "p").alias("positions"))
        )

    cur2 = lambda: sh_view(latest_snapshot(shareholders_changelog(spark, sf_dir)))
    proj2 = lambda: sh_view(
        latest_snapshot(
            project_value(
                shareholders_changelog(spark, sf_dir),
                ["client", "id", "exchange"],
            )
        )
    )
    a, b = cur2(), proj2()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"sh_view value diff rows: {diff}")
    assert diff == 0
    print(f"sh_view current : {best_of(spark, 4, cur2):.3f}s")
    print(f"sh_view projected: {best_of(spark, 4, proj2):.3f}s")


if __name__ == "__main__":
    main()
