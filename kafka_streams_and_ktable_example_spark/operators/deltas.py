"""View-delta emission — derived KTables are themselves changelog streams.

In the reference, the result of the reduce is a KTable whose every change
is emitted downstream: to the debug `.print` sink (`kafka_streams.clj:94`)
and, in Kafka Streams generally, to the store changelog topic — so a
consumer of the view sees (key, new-value-or-null) records, where null
retracts a deleted group (the subtractor's nil result,
`kafka_streams.clj:77-79`).

:func:`view_deltas` reproduces that contract between two view snapshots:
a full outer join on the group key classifying each key as
insert / update / delete, emitting the new value (null for deletes).
Composed with the foreachBatch pipeline it yields the per-batch change
trace of the materialized view — micro-batch granularity, per SURVEY §7.4
(per-record emission is not promised; per-batch view diffs are exact).

Scale: one full-outer shuffle join keyed by the group key, between two
|groups|-sized relations (views, not facts). Map-side nothing to combine;
at 100 TB of *input* the views are orders of magnitude smaller, and at
cluster scale both sides arrive hash-partitioned by the same key from
their producing aggregations, so AQE elides the exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_deltas(
    old_view: DataFrame,
    new_view: DataFrame,
    key_col: str = "client",
    value_col: str = "positions",
) -> DataFrame:
    """Changelog of `new_view - old_view`: (key, op, value).

    op ∈ {'insert','update','delete'}; value is the NEW value, null when
    op='delete' — exactly the record a downstream KTable consumer (or a
    compacted Kafka sink) expects.
    """
    o = old_view.select(
        F.col(key_col).alias("_k"), F.col(value_col).alias("_old")
    )
    n = new_view.select(
        F.col(key_col).alias("_k"), F.col(value_col).alias("_new")
    )
    joined = o.join(n, on="_k", how="full_outer")
    op = (
        F.when(F.col("_old").isNull(), "insert")
        .when(F.col("_new").isNull(), "delete")
        .otherwise("update")
    )
    return (
        joined.where(
            F.col("_old").isNull()
            | F.col("_new").isNull()
            | (F.col("_old") != F.col("_new"))
        )
        .select(
            F.col("_k").alias(key_col),
            op.alias("op"),
            F.col("_new").alias(value_col),
        )
    )
