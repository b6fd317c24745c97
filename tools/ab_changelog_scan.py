#!/usr/bin/env python3
"""Interleaved A/B: single-scan changelog fan-out vs 3-scan union.

VERDICT r5 directive #3: commit f455290 switched orders_changelog from a
3-scan unionByName (base/update/tombstone each rescanning orders) to one
scan + inline record-array explode, arguing scan I/O dominates at 100 TB
— but only sf0.1 was measured (where the single-scan form LOSES ~0.25 s
to fake parallelism of the 3 concurrent scan stages on a 1-split input).
This tool measures `ktable_orders_rollup_by_cust` under both derivations
at sf0.1 and the 10x/100x replicas, interleaved min-of-N in ONE session,
and prints a SCALING.md-ready table.

Usage: python3 tools/ab_changelog_scan.py [--factors 10 100] [--n 5]
"""

from __future__ import annotations

import argparse
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
)
from kafka_streams_and_ktable_example_spark.sources.tables import (  # noqa: E402
    load_table,
)


def orders_changelog_union(spark, sf_dir):
    """The pre-f455290 derivation: three scans of orders unioned."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    ok = F.col("o_orderkey")
    val = F.struct(
        F.col("o_custkey"), F.col("o_orderstatus"), F.col("o_totalprice")
    )
    upd_val = F.struct(
        F.col("o_custkey"),
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    vtype = orders.select(val.alias("value")).schema["value"].dataType
    base = orders.select(
        ok.alias("key"), val.alias("value"), (ok * 3).alias("offset")
    )
    upd = orders.where(ok % 10 == 0).select(
        ok.alias("key"), upd_val.alias("value"), (ok * 3 + 1).alias("offset")
    )
    tomb = orders.where(ok % 20 == 0).select(
        ok.alias("key"),
        F.lit(None).cast(vtype).alias("value"),
        (ok * 3 + 2).alias("offset"),
    )
    return base.unionByName(upd).unionByName(tomb)


def rollup(changelog):
    snap = latest_snapshot(changelog)
    return snap.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", nargs="*", type=int, default=[10, 100])
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("ab_changelog")
    from kafka_streams_and_ktable_example_spark.sources.scale_replicate import (
        replicate_sf,
    )

    dirs = [("sf0.1", "/root/testdata/sf0.1")]
    for f in args.factors:
        dirs.append((f"{f}x", replicate_sf(spark, "/root/testdata/sf0.1", f)))

    print("| scale | single-scan (s) | 3-scan union (s) |")
    print("|---|---|---|")
    for label, d in dirs:
        tune_for_input(spark, d)
        variants = {
            "single": lambda: rollup(orders_changelog(spark, d)),
            "union": lambda: rollup(orders_changelog_union(spark, d)),
        }
        # warm both (page cache + codegen), then interleave timed draws
        for mk in variants.values():
            mk().write.mode("overwrite").format("noop").save()
        best = {k: float("inf") for k in variants}
        for _ in range(args.n):
            for k, mk in variants.items():
                t0 = time.time()
                mk().write.mode("overwrite").format("noop").save()
                best[k] = min(best[k], time.time() - t0)
                spark.catalog.clearCache()
        print(
            f"| {label} | {best['single']:.3f} | {best['union']:.3f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
