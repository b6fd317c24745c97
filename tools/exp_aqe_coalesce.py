#!/usr/bin/env python3
"""Interleaved A/B: AQE coalesce targeting parallelism-first (default)
vs advisory-size-first (guide §2.2 "fewer, larger reduce partitions").

Both arms run in ONE session (the confs are runtime-settable), min of N
interleaved draws per query, so box drift hits both arms equally.
Usage: python3 tools/exp_aqe_coalesce.py [sf_dir] [advisory]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_streams_and_ktable_example_spark import plans  # noqa: E402
from kafka_streams_and_ktable_example_spark.session import (  # noqa: E402
    get_spark,
    tune_for_input,
)


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    advisory = sys.argv[2] if len(sys.argv) > 2 else "64m"
    spark = get_spark("aqe-ab")
    names = list(plans.headline_queries())
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            plans.REGISTRY[n].spark(spark, warm).collect()
        except Exception:
            pass
    spark.catalog.clearCache()
    tune_for_input(spark, sf_dir)

    def set_arm(arm: str) -> None:
        if arm == "base":
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
            )
        else:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory
            )

    res: dict[str, dict[str, float]] = {n: {} for n in names}
    for arm in ("base", "sized", "base", "sized", "base", "sized"):
        set_arm(arm)
        for n in names:
            t0 = time.time()
            try:
                force(plans.REGISTRY[n].spark(spark, sf_dir))
            except Exception as exc:
                print(f"{n}@{arm} failed: {exc}")
                continue
            dt = time.time() - t0
            res[n][arm] = min(res[n].get(arm, 1e9), dt)
            spark.catalog.clearCache()
    tb = ts = 0.0
    for n in names:
        b, s = res[n].get("base", -1), res[n].get("sized", -1)
        tb += max(b, 0)
        ts += max(s, 0)
        print(f"{n:35s} base {b:6.3f}  sized {s:6.3f}")
    print(f"{'TOTAL':35s} base {tb:6.3f}  sized {ts:6.3f}")


if __name__ == "__main__":
    main()
