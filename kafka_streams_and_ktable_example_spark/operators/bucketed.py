"""Bucketed table materialization — pre-shuffled storage for repeat joins.

The reference's only co-location mechanism is Kafka's partition-by-key
(`docker-compose.yml:13` — 4 partitions; state lives with its partition).
The warehouse-scale analog is bucketing: write a fact table hash-bucketed
(and optionally sorted) by its join key, and every subsequent equi-join or
aggregation on that key reads the buckets directly — no Exchange, no sort
for sort-merge — across *every* query that touches the table, not just
one plan.

At 100 TB this is the difference between shuffling the fact table once
per query and never: bucket-pruned scans, shuffle-free joins between
co-bucketed tables (same key, same bucket count), and shuffle-free
groupBy on the bucket key. The cost is paid once at write time.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write df as a bucketed (optionally bucket-sorted) managed parquet
    table and return the re-read table, whose scans carry the bucket
    partitioning Catalyst uses to elide exchanges."""
    spark = df.sparkSession
    # a fresh session's in-memory catalog doesn't know about a previous
    # run's managed-table location; clear both before writing
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    leftover = os.path.join(warehouse, table_name.lower())
    if warehouse and os.path.isdir(leftover):
        shutil.rmtree(leftover)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return spark.table(table_name)
