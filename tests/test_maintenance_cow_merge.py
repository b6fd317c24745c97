"""Copy-on-write MERGE contract (operators/maintenance.py::cow_merge).

Pins the three properties the registry query's oracle cannot see:
untouched partition directories keep their exact files (same inodes —
nothing was rewritten), tombstoned keys disappear, and upserted keys
carry the new values exactly once.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_streams_and_ktable_example_spark.operators.maintenance import cow_merge
from kafka_streams_and_ktable_example_spark.sources.tables import load_table


def _partition_inodes(base: str) -> dict:
    out = {}
    for d in os.listdir(base):
        if d.startswith("o_orderpriority="):
            pdir = os.path.join(base, d)
            out[d] = sorted(
                (f, os.stat(os.path.join(pdir, f)).st_ino)
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            )
    return out


@pytest.fixture()
def merged_layout(spark, sf_dir, tmp_path):
    base = str(tmp_path / "orders_base")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(base)
    before = _partition_inodes(base)

    upserts = (
        orders.where(
            (F.col("o_orderkey") % 13 == 0)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("_tombstone", F.lit(False))
    )
    deletes = orders.where(
        (F.col("o_orderkey") % 11 == 0)
        & (F.col("o_orderpriority") == "2-HIGH")
    ).withColumn("_tombstone", F.lit(True))
    info = cow_merge(
        spark,
        base,
        upserts.unionByName(deletes),
        key="o_orderkey",
        partition_col="o_orderpriority",
    )
    return base, before, info, orders


def test_untouched_partitions_keep_inodes(spark, merged_layout):
    base, before, info, _ = merged_layout
    after = _partition_inodes(base)
    touched = {p.split(" ")[0] for p in info["touched_partitions"]}
    assert touched == {
        "o_orderpriority=1-URGENT",
        "o_orderpriority=2-HIGH",
    }
    for part, files in before.items():
        if part not in touched:
            assert after[part] == files, f"{part} was rewritten"
        else:
            assert after[part] != files, f"{part} was NOT rewritten"


def test_tombstones_delete_and_upserts_replace(spark, merged_layout):
    base, _, _, orders = merged_layout
    merged = spark.read.parquet(base)
    gone = merged.where(
        (F.col("o_orderkey") % 11 == 0)
        & (F.col("o_orderpriority") == "2-HIGH")
    ).count()
    assert gone == 0
    flipped = merged.where(
        (F.col("o_orderkey") % 13 == 0)
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    n_expected = orders.where(
        (F.col("o_orderkey") % 13 == 0)
        & (F.col("o_orderpriority") == "1-URGENT")
    ).count()
    assert flipped.count() == n_expected > 0
    assert (
        flipped.where(F.col("o_orderstatus") != "X").count() == 0
    ), "upserted rows must carry the new status"
    # total row conservation: |orders| - |deletes|
    n_del = orders.where(
        (F.col("o_orderkey") % 11 == 0)
        & (F.col("o_orderpriority") == "2-HIGH")
    ).count()
    assert merged.count() == orders.count() - n_del


def test_versioned_publish_pointer_isolation(spark, sf_dir, tmp_path):
    """Readers resolve _CURRENT once: after a second publish the pointer
    serves v2 for every table, v1 stays addressable, and an in-flight
    (unpointered) v3 directory is invisible to pointer-resolved reads."""
    import os

    from pyspark.sql import functions as F

    from kafka_streams_and_ktable_example_spark.operators.maintenance import (
        current_version,
        publish_snapshot,
        read_snapshot,
    )
    from kafka_streams_and_ktable_example_spark.sources.tables import load_table

    root = str(tmp_path / "pub")
    os.makedirs(root)
    orders = load_table(spark, sf_dir, "orders")
    half = orders.where(F.col("o_orderkey") % 2 == 0)

    v = publish_snapshot(spark, root, {"orders": half})
    assert v == 1 and current_version(root) == 1
    n1 = read_snapshot(spark, root, "orders").count()

    v = publish_snapshot(spark, root, {"orders": orders})
    assert v == 2 and current_version(root) == 2
    assert read_snapshot(spark, root, "orders").count() == orders.count()
    # time travel: v1 unchanged
    assert read_snapshot(spark, root, "orders", 1).count() == n1

    # a version dir written WITHOUT the pointer swap must be invisible
    orders.limit(1).write.parquet(os.path.join(root, "v3", "orders"))
    assert current_version(root) == 2
    assert read_snapshot(spark, root, "orders").count() == orders.count()
