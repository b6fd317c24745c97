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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CHANGELOG_JSONL_SCHEMA = "key string, value_json string, offset bigint"


class ChangelogJsonlDataSource(DataSource):
    """``spark.read.format("changelog_jsonl").option("path", p)`` source —
    batch scan with byte-range partitions AND a streaming reader
    (``spark.readStream`` replays the log in bounded micro-batches with
    durable (file, byte-pos) offsets, the Kafka-consumer shape)."""

    @classmethod
    def name(cls) -> str:
        return "changelog_jsonl"

    def schema(self) -> str:
        return CHANGELOG_JSONL_SCHEMA

    def reader(self, schema) -> "ChangelogJsonlReader":
        return ChangelogJsonlReader(self.options)

    def simpleStreamReader(self, schema) -> "ChangelogJsonlStreamReader":
        return ChangelogJsonlStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "ChangelogJsonlWriter":
        return ChangelogJsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return ChangelogJsonlStreamWriter(self.options)


class ChangelogJsonlReader(DataSourceReader):
    """Reads a JSONL file OR a directory of JSONL part-files (the layout
    ``df.write.text`` produces), so fixtures can be materialized
    distributed — no driver-side collect anywhere in the path."""

    def __init__(self, options):
        self.path = options["path"]
        self.num_partitions = int(options.get("numPartitions", "8"))
        self.pushed: list = []  # filters accepted via pushFilters

    def pushFilters(self, filters):
        """Spark 4.1 connector-side filter pushdown: offset comparisons
        and key equality/prefix are evaluated inside the reader (records
        are skipped before they ever cross the Python->JVM boundary —
        for a remote source this is the difference between shipping a
        topic and shipping a slice). Supported filters are consumed
        (NOT returned), so the scan plan carries them as data-source
        filters; anything else is yielded back for Spark to evaluate."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            StringStartsWith,
        )

        supported = (
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col == "offset" and isinstance(f, supported + (EqualTo,)):
                self.pushed.append(("offset", type(f).__name__, f.value))
            elif col == "key" and isinstance(f, (EqualTo, StringStartsWith)):
                self.pushed.append(("key", type(f).__name__, f.value))
            else:
                yield f

    def _passes(self, key, offset) -> bool:
        for col, op, val in self.pushed:
            v = offset if col == "offset" else key
            if op == "EqualTo" and not v == val:
                return False
            if op == "GreaterThan" and not v > val:
                return False
            if op == "GreaterThanOrEqual" and not v >= val:
                return False
            if op == "LessThan" and not v < val:
                return False
            if op == "LessThanOrEqual" and not v <= val:
                return False
            if op == "StringStartsWith" and not str(v).startswith(val):
                return False
        return True

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
                if not self._passes(rec["key"], rec["offset"]):
                    continue  # pushed filter: drop reader-side
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


class ChangelogJsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming replay of a JSONL changelog (file or directory of part
    files) in bounded micro-batches — the Kafka-consumer shape on files:
    durable offsets are ``{"file": idx, "pos": byte}`` into the sorted
    file list, each ``read`` advances at most ``linesPerBatch`` records,
    and ``readBetweenOffsets`` re-serves any committed range exactly
    (replay/recovery contract). The simple-reader API serves batches from
    the driver process; a partition-parallel streaming source would ship
    ranges to executors like the batch reader — fine here because batches
    are bounded and the payload is line-framed."""

    def __init__(self, options):
        self.path = options["path"]
        self.per_batch = int(options.get("linesPerBatch", "500"))

    def _files(self):
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        return [self.path]

    @staticmethod
    def _parse(line: bytes):
        rec = json.loads(line)
        value = rec.get("value")
        return (
            rec["key"],
            None if value is None else json.dumps(value),
            rec["offset"],
        )

    def initialOffset(self) -> dict:
        return {"file": 0, "pos": 0}

    def _read_from(self, start: dict, stop: dict | None, limit: int | None):
        files = self._files()
        i, pos = int(start["file"]), int(start["pos"])
        out = []
        while i < len(files):
            if stop is not None and (i, pos) >= (int(stop["file"]), int(stop["pos"])):
                break
            with open(files[i], "rb") as f:
                f.seek(pos)
                while True:
                    if limit is not None and len(out) >= limit:
                        return out, {"file": i, "pos": pos}
                    if stop is not None and (i, pos) >= (
                        int(stop["file"]),
                        int(stop["pos"]),
                    ):
                        return out, {"file": i, "pos": pos}
                    line = f.readline()
                    if not line:
                        break
                    pos = f.tell()
                    if line.strip():
                        out.append(self._parse(line))
            i, pos = i + 1, 0
        return out, {"file": i, "pos": 0}

    def read(self, start: dict):
        rows, end = self._read_from(start, None, self.per_batch)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._read_from(start, end, None)
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # file replay has nothing to acknowledge upstream


class _JsonlCommit(WriterCommitMessage):
    """Per-partition commit message: the staged file and its row count.
    Plain picklable attributes per the WriterCommitMessage contract."""

    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class ChangelogJsonlWriter(DataSourceWriter):
    """Batch WRITER side of the connector (Spark 4 Python DataSource
    writer API): each executor partition serializes its rows to a staged
    ``part-*.jsonl`` and returns the file name as its commit message; the
    driver's ``commit`` promotes every staged file into the target
    directory and drops a ``_SUCCESS`` marker, ``abort`` discards the
    staging dir — files-appear-atomically-or-not-at-all, the same
    two-phase contract as Spark's built-in file sinks. Wire format is the
    reader's inverse: ``{"key": str, "value": obj|null, "offset": int}``
    with an explicit ``"value": null`` tombstone. Staging lives under the
    destination path (shared storage in a real deployment; one local FS
    here, same assumption the reader makes)."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid as _uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(
            staging, f"part-{_uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                value = (
                    None
                    if row.value_json is None
                    else json.loads(row.value_json)
                )
                f.write(
                    json.dumps(
                        {
                            "key": row.key,
                            "value": value,
                            "offset": row.offset,
                        }
                    )
                    + "\n"
                )
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages):
        import shutil as _shutil

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") and f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            os.rename(
                m.file, os.path.join(self.path, os.path.basename(m.file))
            )
        _shutil.rmtree(os.path.join(self.path, "_staging"), True)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages):
        import shutil as _shutil

        _shutil.rmtree(os.path.join(self.path, "_staging"), True)


class ChangelogJsonlStreamWriter(DataSourceStreamWriter):
    """STREAMING sink side of the connector — completing the matrix "
    (batch read/write, stream read, stream write): each micro-batch's
    partitions stage ``part-*.jsonl`` files, and ``commit(messages,
    batchId)`` promotes them under batch-id-prefixed names
    (``b0000000007-part-*.jsonl``) — so a RE-DELIVERED batch after a
    restart overwrites its own files instead of duplicating records,
    which is exactly-once for an idempotent file sink (the same
    epoch-keyed idempotence the foreachBatch jobs use, expressed at the
    connector layer). ``abort`` discards the staging dir."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import uuid as _uuid

        staging = os.path.join(self.path, "_stream_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                value = (
                    None
                    if row.value_json is None
                    else json.loads(row.value_json)
                )
                f.write(
                    json.dumps(
                        {"key": row.key, "value": value, "offset": row.offset}
                    )
                    + "\n"
                )
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages, batchId: int) -> None:
        import shutil as _shutil

        # idempotent re-delivery: this batch's previous files (if any) go
        # away before its new ones land
        prefix = f"b{batchId:010d}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix):
                os.remove(os.path.join(self.path, f))
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.rename(
                m.file,
                os.path.join(
                    self.path, prefix + os.path.basename(m.file)
                ),
            )
        _shutil.rmtree(os.path.join(self.path, "_stream_staging"), True)

    def abort(self, messages, batchId: int) -> None:
        import shutil as _shutil

        _shutil.rmtree(os.path.join(self.path, "_stream_staging"), True)
