"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``kafka_streams_and_ktable_example_spark.plans`` — a registry pairing each
Spark implementation with its DuckDB oracle SQL. This module is the thin
driver-facing adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_and_ktable_example_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's materialized shareholders view
    (changelog → latest-per-key snapshot → NASDAQ filter → per-client
    position set) over sf0.001."""
    fn = plans.queries()["ktable_shareholders_view"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each hash-checkable query."""
    return plans.oracle_sql()
