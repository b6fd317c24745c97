#!/usr/bin/env python3
"""VERDICT r10 directive #5: back the r10 kept-for-shape claims with 100x
numbers. Arm A = embedding_pca_power_iteration WITHOUT the covariance
persist (DataFrame.persist monkeypatched to a no-op, the same device as
the r10 sf0.1/10x A/B); arm B = the live registry body (persisted cov).
Interleaved in one session, min of --draws.

Usage: python3 tools/exp_pca_persist_100x.py [sf_dir] [--draws N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql

from kafka_streams_and_ktable_example_spark import plans
from kafka_streams_and_ktable_example_spark.session import (
    get_spark,
    tune_for_input,
)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = next(
        (a for a in argv if not a.startswith("--")), "/root/testdata/sf0.1"
    )
    draws = int(argv[argv.index("--draws") + 1]) if "--draws" in argv else 3
    spark = get_spark("exp_pca_persist")
    tune_for_input(spark, sf_dir)
    q = plans.REGISTRY["embedding_pca_power_iteration"].spark
    real_persist = pyspark.sql.DataFrame.persist

    def run(label, nopersist):
        if nopersist:
            pyspark.sql.DataFrame.persist = lambda self, *a, **k: self
        try:
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            q(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.time() - t0
        finally:
            pyspark.sql.DataFrame.persist = real_persist
            spark.catalog.clearCache()

    run("warm A", True)
    run("warm B", False)
    a, b = [], []
    for _ in range(draws):
        a.append(run("A no-persist", True))
        b.append(run("B persist", False))
    print(
        f"pca_power_iteration @ {sf_dir}: no-persist min {min(a):.3f}s  "
        f"persist min {min(b):.3f}s  (draws: A={[round(x,2) for x in a]}, "
        f"B={[round(x,2) for x in b]})",
        flush=True,
    )


if __name__ == "__main__":
    main()
