"""SparkSession factory.

Local harness runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM). The config here is chosen to also be the right *shape* for a
large cluster run: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow on (vectorized Python interop), UTC session timezone
(parity with the DuckDB oracle, which is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "kafka_streams_and_ktable_example_spark") -> SparkSession:
    """Build (or return) the shared SparkSession.

    Notes for 100 TB scale: everything configured here is declarative and
    cluster-agnostic — shuffle partition count is the only local-mode
    number, and AQE coalescing makes it an upper bound rather than a fixed
    fan-out.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes the real fan-out: shuffles START wide (8x cores) and
        # coalesce down to ~64 MB partitions, so small-SF queries run at
        # a handful of partitions while 100x-replica joins keep
        # partitions spill-free — the same setting a 1000-executor
        # cluster wants (initialPartitionNum high, AQE right-sizes).
        # Without it, shuffle.partitions=32 put ~1 GB per partition at
        # the 60M-row replica and sort spills dominated the join-heavy
        # queries (SCALING.md records the before/after).
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTS", str(cpus * 8)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (Spark 4.1, off by default):
        # lets connectors consume scan predicates reader-side
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # bucketed-table materialization (operators/bucketed.py) needs a
        # writable warehouse; keep it out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
