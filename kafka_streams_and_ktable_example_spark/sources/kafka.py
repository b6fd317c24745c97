"""Kafka changelog source — the reference's actual ingress, Spark-native.

The reference consumes the compacted topic `share-holders` with key serde
String and value serde EDN, where an un-serialized nil value is a tombstone
(`our-service/src/our_service/kafka_streams.clj:21-39, 53-55, 64`;
topic spec `docker-compose.yml:13`). Spark's Kafka source yields
``key binary, value binary, topic, partition, offset, timestamp``; this
module maps that record shape onto the engine's changelog contract
(key STRING, value STRUCT-or-null, offset BIGINT) so every operator
downstream of :func:`parse_changelog_records` is source-agnostic — the
tests drive the identical parse path with static DataFrames, and a real
deployment only swaps in :func:`kafka_changelog_stream`.

Serde mapping: EDN is a serde detail, not semantics (SURVEY §7.4) — the
wire value is JSON here; a Kafka tombstone arrives as value IS NULL and
must stay null through parsing (from_json(null) is null, preserving the
NotSerializeNil passthrough contract of `kafka_streams.clj:21-26`).

Ordering: the reference relies on per-partition log order for
latest-wins. Kafka offsets are only comparable within a partition, so the
total order column is (partition, offset) packed into one BIGINT —
monotone per key because a key lives in exactly one partition (hash
partitioning by key, `fake_producer.clj` producer default).

No broker runs in the test container; kafka_changelog_stream is exercised
for plan construction only where a broker is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changelog import POSITION_SCHEMA

# 2^40 offsets per partition before collision; Kafka partition counts are
# small ints, so (partition << 40) | offset is a strict total order that
# agrees with log order inside each partition.
_PARTITION_SHIFT = 40


def _total_offset() -> F.Column:
    return (
        F.shiftleft(F.col("partition").cast("long"), _PARTITION_SHIFT)
        + F.col("offset")
    ).alias("offset")


def _malformed_pred(value_schema) -> F.Column:
    """True for records that must NOT flow into the changelog.

    Distinguishes the two null-value cases the naive parse conflates:
    a wire NULL value is a legitimate tombstone (NotSerializeNil
    passthrough, kafka_streams.clj:21-26), but a NON-null value that
    from_json cannot parse (truncated/garbled/empty bytes) is corruption —
    treating it as null would silently DELETE the key. Null keys are
    unroutable in a compacted topic and are quarantined too.

    Detection probes with a ``_corrupt_record`` column: Spark's default
    PERMISSIVE from_json maps truncated JSON to a struct of nulls (NOT a
    null struct), so ``parsed IS NULL`` alone misses it. Sparse-but-valid
    JSON (missing fields) still passes — schema-evolution tolerance.
    """
    from pyspark.sql import types as T

    probe_schema = T.StructType(
        list(value_schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    probed = F.from_json(
        F.col("value").cast("string"),
        probe_schema,
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    bad_value = F.col("value").isNotNull() & (
        probed.isNull() | probed["_corrupt_record"].isNotNull()
    )
    return F.col("key").isNull() | bad_value


def parse_changelog_records(
    raw: DataFrame, value_schema=POSITION_SCHEMA, malformed: str = "skip"
) -> DataFrame:
    """Kafka record shape → engine changelog contract.

    raw: key binary, value binary-or-null, partition int, offset long
    out: key string, value struct-or-null, offset long (total order)

    A NULL wire value stays a NULL struct (tombstone). Malformed records
    — non-null value that does not parse, or a null key — are handled per
    ``malformed``:

    - ``"skip"`` (default): dropped from the changelog; recover them with
      :func:`quarantined_changelog_records` for a dead-letter sink.
    - ``"fail"``: the batch/stream errors on first corrupt record
      (fail-fast deployments).
    """
    if malformed not in ("skip", "fail"):
        raise ValueError(f"malformed policy {malformed!r}")
    bad = _malformed_pred(value_schema)
    if malformed == "fail":
        raw = raw.where(
            F.assert_true(
                ~bad, F.concat(F.lit("malformed changelog record at offset "),
                               F.col("offset").cast("string"))
            ).isNull()
        )
    else:
        raw = raw.where(~bad)
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("value"),
        _total_offset(),
    )


def quarantined_changelog_records(
    raw: DataFrame, value_schema=POSITION_SCHEMA
) -> DataFrame:
    """The dead-letter side of :func:`parse_changelog_records`: every
    malformed record with its quarantine reason and raw payload, ready for
    a diagnostics sink — nothing is silently lost between the two views."""
    return raw.where(_malformed_pred(value_schema)).select(
        F.col("key").cast("string").alias("key"),
        F.col("value").alias("raw_value"),
        _total_offset(),
        # every row here satisfies _malformed_pred, so anything with a key
        # is a value-level corruption
        F.when(F.col("key").isNull(), "null_key")
        .otherwise("malformed_value")
        .alias("reason"),
    )


def kafka_changelog_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "share-holders",
    starting_offsets: str = "earliest",
    value_schema=POSITION_SCHEMA,
) -> DataFrame:
    """The reference's source node (`kafka_streams.clj:64`) as a Structured
    Streaming plan: subscribe to the compacted topic from the earliest
    offset (`AUTO_OFFSET_RESET_CONFIG "earliest"`, `kafka_streams.clj:55`).

    Returns the parsed changelog stream; feed it to the same foreachBatch
    compaction (streaming.pipeline) or stateful reduce (streaming.stateful)
    the file-source tests exercise.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    return parse_changelog_records(raw, value_schema)
