"""Changelog synthesis — the reference's data contract over parquet inputs.

The reference's input is a compacted Kafka topic of ``(String key,
EDN-value-or-null)`` records where a null value is a tombstone
(`our-service/src/our_service/kafka_streams.clj:21-26`,
`our-service/src/our_service/fake_producer.clj:24-36`). We model that
contract as a DataFrame::

    key STRING | BIGINT, value STRUCT<...> (null = tombstone), offset BIGINT

``offset`` is the per-key total order (the compaction "latest wins" key —
`docker-compose.yml:13`). Two synthetic changelogs are derived
deterministically from the driver's parquet tables so the SQL oracle can
derive the identical stream (FIXTURES.md §B2):

- ``orders_changelog``: key = o_orderkey; every order gets a base record,
  keys % 10 == 0 get a later update (price uplift), keys % 20 == 0 end
  with a tombstone.
- ``shareholders_changelog``: the reference's share-position domain
  (`fake_producer.clj:24-36`) synthesized from orders — key =
  "client:::ticker", value = {client, id, ticker, exchange, amount},
  tombstones for o_orderkey % 11 == 0. Multiple orders collide on the
  same key at different offsets, exercising latest-wins and
  exchange-flip retraction (`kafka_streams.clj:65-67`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import load_table

# Schema of the reference's share-holders changelog value
# (fake_producer.clj:31-36): {client, id, ticker, exchange, amount}.
POSITION_SCHEMA = T.StructType(
    [
        T.StructField("client", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("exchange", T.StringType()),
        T.StructField("amount", T.IntegerType()),
    ]
)

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), nullable=False),
        T.StructField("value", POSITION_SCHEMA, nullable=True),
        T.StructField("offset", T.LongType(), nullable=False),
    ]
)


def changelog_from_rows(spark: SparkSession, rows) -> DataFrame:
    """Build a share-holders changelog from python rows.

    ``rows`` is a list of (key, value_dict_or_None, offset). Used by tests
    to replay the reference's golden scenario (fake_producer.clj:48-54).
    """
    data = [
        (
            key,
            None
            if value is None
            else (
                value["client"],
                value["id"],
                value["ticker"],
                value["exchange"],
                value["amount"],
            ),
            offset,
        )
        for key, value, offset in rows
    ]
    return spark.createDataFrame(data, CHANGELOG_SCHEMA)


def orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic upsert/delete changelog keyed by o_orderkey.

    value struct: (o_custkey, o_orderstatus, o_totalprice). Base record at
    offset 3k; update (status 'U', price * 2 — binary-exact so float sums
    stay oracle-comparable) at 3k+1 for keys % 10 == 0;
    tombstone (null value) at 3k+2 for keys % 20 == 0.
    """
    orders = load_table(spark, sf_dir, "orders")
    val = F.struct(
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
    )
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        val.alias("value"),
        (F.col("o_orderkey") * 3).alias("offset"),
    )
    updates = orders.where(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.struct(
            F.col("o_custkey"),
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        ).alias("value"),
        (F.col("o_orderkey") * 3 + 1).alias("offset"),
    )
    tombstones = orders.where(F.col("o_orderkey") % 20 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast(base.schema["value"].dataType).alias("value"),
        (F.col("o_orderkey") * 3 + 2).alias("offset"),
    )
    return base.unionByName(updates).unionByName(tombstones)


def shareholders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's share-position changelog synthesized from orders.

    client = o_custkey (as string), ticker = 'T' || (o_orderkey % 7),
    exchange cycles NASDAQ/LON/NYSE by o_orderkey % 3, amount from
    o_totalprice; o_orderkey is the offset. o_orderkey % 11 == 0 produces a
    tombstone for its key — the `amount == 0 → null` producer rule
    (fake_producer.clj:26-29). `id == key` invariant preserved
    (fake_producer.clj:33).
    """
    orders = load_table(spark, sf_dir, "orders")
    client = F.col("o_custkey").cast("string")
    ticker = F.concat(F.lit("T"), (F.col("o_orderkey") % 7).cast("string"))
    key = F.concat_ws(":::", client, ticker)
    exchange = (
        F.when(F.col("o_orderkey") % 3 == 0, "NASDAQ")
        .when(F.col("o_orderkey") % 3 == 1, "LON")
        .otherwise("NYSE")
    )
    value = F.struct(
        client.alias("client"),
        key.alias("id"),
        ticker.alias("ticker"),
        exchange.alias("exchange"),
        F.col("o_totalprice").cast("int").alias("amount"),
    )
    return orders.select(
        key.alias("key"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
        .otherwise(value)
        .cast(POSITION_SCHEMA)
        .alias("value"),
        F.col("o_orderkey").alias("offset"),
    )
