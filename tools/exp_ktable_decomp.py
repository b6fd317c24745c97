#!/usr/bin/env python3
"""Decompose ktable headline query cost: changelog synthesis vs
latest_snapshot aggregate vs the grouped view, at a given sf dir."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_and_ktable_example_spark.operators.ktable import (  # noqa: E402
    grouped_reduce_view,
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
    spark = get_spark("exp-ktable")
    tune_for_input(spark, sf_dir)

    stages = {
        "sh_changelog_only": lambda: shareholders_changelog(spark, sf_dir),
        "sh_latest_snapshot": lambda: latest_snapshot(
            shareholders_changelog(spark, sf_dir)
        ),
        "sh_full_view": lambda: grouped_reduce_view(
            latest_snapshot(shareholders_changelog(spark, sf_dir)),
            predicate=F.col("exchange") == "NASDAQ",
            group_col="client",
            collect_col="id",
            set_col="positions_arr",
        ).select("client", F.concat_ws(",", "positions_arr").alias("positions")),
        "ord_changelog_only": lambda: orders_changelog(spark, sf_dir),
        "ord_latest_snapshot": lambda: latest_snapshot(
            orders_changelog(spark, sf_dir)
        ),
        "ord_rollup": lambda: latest_snapshot(orders_changelog(spark, sf_dir))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        ),
    }
    for label, fn in stages.items():
        print(f"{label}: {best_of(spark, 4, fn):.3f}s", flush=True)


if __name__ == "__main__":
    main()
