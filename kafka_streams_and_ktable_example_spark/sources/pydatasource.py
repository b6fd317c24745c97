"""Custom connector via the Spark 4 Python DataSource API.

The reference's only source is a Kafka consumer wired through serdes
(`our-service/src/our_service/kafka_streams.clj:21-39, 64`). This is the
engine-native way to add such a connector in PySpark: subclass
``pyspark.sql.datasource.DataSource``, register it once per session, and
``spark.read.format("changelog_jsonl")`` plans it like any other scan —
with real input partitions, so a 1000-executor cluster splits the byte
range instead of funneling through the driver.

Format served: JSONL changelog records ``{"key": str, "value": obj|null,
"offset": int}`` — null value is the tombstone, exactly the wire contract
of the reference's compacted topic (`fake_producer.clj:24-36`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

CHANGELOG_JSONL_SCHEMA = "key string, value_json string, offset bigint"


class ChangelogJsonlDataSource(DataSource):
    """``spark.read.format("changelog_jsonl").option("path", p)`` source."""

    @classmethod
    def name(cls) -> str:
        return "changelog_jsonl"

    def schema(self) -> str:
        return CHANGELOG_JSONL_SCHEMA

    def reader(self, schema) -> "ChangelogJsonlReader":
        return ChangelogJsonlReader(self.options)


class ChangelogJsonlReader(DataSourceReader):
    """Reads a JSONL file OR a directory of JSONL part-files (the layout
    ``df.write.text`` produces), so fixtures can be materialized
    distributed — no driver-side collect anywhere in the path."""

    def __init__(self, options):
        self.path = options["path"]
        self.num_partitions = int(options.get("numPartitions", "8"))

    def _files(self):
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                # skip Spark writer metadata (_SUCCESS, .crc, _committed…)
                if not f.startswith(("_", "."))
            )
        return [self.path]

    def partitions(self):
        # byte-range splits per file; a line belongs to the partition
        # containing its first byte, so every line is read exactly once
        # with no coordination
        files = self._files()
        n = max(1, self.num_partitions)
        parts = []
        for path in files:
            size = os.path.getsize(path)
            if size == 0:
                continue
            step = max(1, size // max(1, n // len(files)))
            bounds = list(range(0, size, step))
            parts.extend(
                InputPartition(
                    (path, lo, bounds[i + 1] if i + 1 < len(bounds) else size)
                )
                for i, lo in enumerate(bounds)
            )
        if not parts:
            # empty changelog: one empty partition, not zero partitions —
            # zero partitions breaks the scan contract downstream
            empty = files[0] if files else self.path
            parts = [InputPartition((empty, 0, 0))]
        return parts

    def read(self, partition):
        path, start, end = partition.value
        if end <= start:
            return
        with open(path, "rb") as f:
            if start:
                f.seek(start - 1)
                f.readline()  # consume the line straddling the boundary
            while f.tell() < end:
                line = f.readline()
                if not line:
                    break
                if not line.strip():
                    continue
                rec = json.loads(line)
                value = rec.get("value")
                yield (
                    rec["key"],
                    None if value is None else json.dumps(value),
                    rec["offset"],
                )


def register_changelog_jsonl(spark) -> None:
    """Register the connector (idempotent per session)."""
    if getattr(spark, "_changelog_jsonl_registered", False):
        return
    spark.dataSource.register(ChangelogJsonlDataSource)
    spark._changelog_jsonl_registered = True
