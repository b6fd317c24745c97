"""Parquet table loaders for the driver-provided synthetic tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under the sf dir.

Scans are plain ``spark.read.parquet`` so Catalyst predicate pushdown and
column pruning reach the parquet reader (verify with
``df.explain("formatted")`` — look for PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def events_schema_and_ts_normalizer(spark: SparkSession, path: str):
    """Observed parquet schema for events + a fn normalizing ts to TimestampType.

    Some driver testdata generations store ts as TIMESTAMP(NANOS)
    (pandas-written), which Spark's parquet reader surfaces as long under
    legacy.parquet.nanosAsLong; others store TIMESTAMP(MICROS), which Spark
    reads as TIMESTAMP_NTZ. Adapt on the observed schema so both generations
    load identically — for batch reads AND file-source streams (which need
    an explicit schema and therefore must match the file's physical type).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):

        def norm(df: DataFrame) -> DataFrame:
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    elif isinstance(ts_type, T.TimestampNTZType):

        def norm(df: DataFrame) -> DataFrame:
            return df.withColumn("ts", F.col("ts").cast("timestamp"))

    else:

        def norm(df: DataFrame) -> DataFrame:
            return df

    return schema, norm


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _, norm = events_schema_and_ts_normalizer(spark, path)
        return norm(spark.read.parquet(path))
    return spark.read.parquet(path)


def register_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view so queries can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
