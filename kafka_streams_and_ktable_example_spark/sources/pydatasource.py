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
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CHANGELOG_JSONL_SCHEMA = "key string, value_json string, offset bigint"

#: rows per Arrow RecordBatch crossing the Python->JVM boundary. Arrow
#: batching (vs per-row tuple pickling) is what took the 10x streaming
#: replay of this connector from 126 s to tens of seconds — the parse
#: stays Python, but serialization amortizes to one buffer per batch.
_ARROW_BATCH_ROWS = 8192


def _list_files(path: str) -> list[str]:
    """A JSONL file, or a directory of part files (``df.write.text``
    layout) sorted for a stable replay order; Spark metadata skipped."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            # skip Spark writer metadata (_SUCCESS, .crc, _committed…)
            if not f.startswith(("_", "."))
        )
    return [path]


def _parse_line(line: bytes) -> tuple:
    rec = json.loads(line)
    value = rec.get("value")
    return (
        rec["key"],
        None if value is None else json.dumps(value),
        rec["offset"],
    )


def _read_range(path: str, start: int, end: int):
    """Parsed (key, value_json, offset) tuples for the lines of
    ``path[start:end)`` under the owns-its-first-byte rule: a line belongs
    to the range containing its first byte, so disjoint ranges cover every
    line exactly once with no coordination. ``start`` may be any byte
    position — mid-line starts skip the straddling line; exact
    line-boundary starts (previous byte is the newline) skip nothing."""
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
            yield _parse_line(line)


def _to_arrow_batches(rows, batch_rows: int = _ARROW_BATCH_ROWS):
    """Pack row tuples into Arrow RecordBatches (the Spark 4 DataSource
    fast path: one Arrow buffer crosses the Python->JVM boundary per
    batch instead of one pickled tuple per row)."""
    import pyarrow as pa

    schema = pa.schema(
        [("key", pa.string()), ("value_json", pa.string()), ("offset", pa.int64())]
    )
    buf: list = []
    for row in rows:
        buf.append(row)
        if len(buf) >= batch_rows:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, s.type) for c, s in zip(zip(*buf), schema)],
                schema=schema,
            )
            buf = []
    if buf:
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, s.type) for c, s in zip(zip(*buf), schema)],
            schema=schema,
        )


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

    def streamReader(self, schema) -> "ChangelogJsonlPartitionedStreamReader":
        # preferred by Spark over simpleStreamReader(): partition-parallel
        # executor reads with Arrow batches, vs driver-side tuple batches
        return ChangelogJsonlPartitionedStreamReader(self.options)

    def simpleStreamReader(self, schema) -> "ChangelogJsonlStreamReader":
        # retained fallback (Spark only calls it when streamReader() is
        # absent); its offset/replay contract is unit-tested directly
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
        return _list_files(self.path)

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
        rows = (
            r
            for r in _read_range(path, start, end)
            # pushed filter: drop reader-side, before the row ever reaches
            # an Arrow buffer
            if self._passes(r[0], r[2])
        )
        yield from _to_arrow_batches(rows)


def register_changelog_jsonl(spark) -> None:
    """Register the connector (idempotent per session).

    Also enables ``spark.sql.python.filterPushdown.enabled`` at runtime:
    Spark 4.1 hard-fails reader initialization
    (``[DATA_SOURCE_PUSHDOWN_DISABLED]``) when a Python DataSource
    implements ``pushFilters()`` but the conf is at its default
    ``false``.  Our own tuned session (session.py) sets it, but a
    vanilla session (the driver's shape) does not — this caused the
    four driver-red rows in round 6.  The conf is runtime-settable, so
    setting it here makes the connector self-sufficient under any
    session.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
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


class ChangelogJsonlPartitionedStreamReader(DataSourceStreamReader):
    """Partition-parallel streaming replay of a JSONL changelog — the
    full ``DataSourceStreamReader`` contract, so micro-batch ranges are
    read ON EXECUTORS as Arrow RecordBatches instead of driver-side
    tuples (the SimpleDataSourceStreamReader path): ``latestOffset``
    advances a durable ``{"file": idx, "pos": byte}`` cursor by at most
    ``linesPerBatch`` records (driver-side newline count, no JSON parse),
    ``partitions`` splits the offset range into per-file byte segments
    (sub-split to ``numPartitions`` under the owns-its-first-byte rule —
    every offset the planner emits is an exact line boundary, where the
    straddle-skip is a no-op), and ``read`` replays a byte range exactly
    like the batch scan.

    Replay contract: the same (start, end) range always yields the same
    records, and the planning cursor is clamped forward by every offset
    Spark hands back to ``partitions`` — so a checkpoint restart that
    replays a pending batch resumes correctly (the replayed end becomes
    the cursor). The one case this cannot cover: a restart whose log is
    FULLY committed gives a fresh reader no offset before its first
    ``latestOffset`` (the MicroBatchStream API passes none), so that
    first planned batch regresses to the log head — restart-heavy
    pipelines on append sinks should use the Simple reader (Spark passes
    it the start offset on every read) or an idempotent/keyed sink. The
    file list is snapshotted at first use and re-listed at every
    ``latestOffset``: names sorting after the whole snapshot extend it
    (pure appends keep cursor indices stable, so a writer-concurrent
    stream picks up new part files), while any mutation of the
    snapshotted prefix raises loudly instead of serving wrong ranges."""

    def __init__(self, options):
        self.path = options["path"]
        self.per_batch = int(options.get("linesPerBatch", "500"))
        self.num_partitions = int(options.get("numPartitions", "8"))
        self._planned: dict | None = None  # latest offset handed to Spark
        self._files_snapshot: list[str] | None = None

    def _files(self) -> list[str]:
        if self._files_snapshot is None:
            self._files_snapshot = _list_files(self.path)
        return self._files_snapshot

    def _refresh_files(self) -> None:
        """Re-list the log directory at planning time so a writer-
        concurrent stream is handled loudly instead of silently: names
        that sort AFTER the whole snapshot extend it (the {file, pos}
        cursor indexes the sorted listing, so pure appends keep every
        existing index stable); any change to the already-snapshotted
        prefix (rename/delete/out-of-order insert) would reshuffle indices
        under a live cursor and raises instead of serving wrong ranges."""
        if self._files_snapshot is None:
            self._files()
            return
        current = _list_files(self.path)
        snap = self._files_snapshot
        if current[: len(snap)] != snap:
            raise RuntimeError(
                "changelog directory changed under a live stream cursor: "
                f"snapshotted prefix {snap[:3]}...({len(snap)} files) no "
                f"longer matches the listing ({len(current)} files); only "
                "appending files that sort after the existing ones is "
                "supported mid-stream"
            )
        if len(current) > len(snap):
            self._files_snapshot = current

    def initialOffset(self) -> dict:
        return {"file": 0, "pos": 0}

    @staticmethod
    def _max_offset(*offsets: dict | None) -> dict | None:
        best = None
        for o in offsets:
            if o is None:
                continue
            if best is None or (int(o["file"]), int(o["pos"])) > (
                int(best["file"]),
                int(best["pos"]),
            ):
                best = o
        return best

    def _advance(self, start: dict, max_lines: int) -> dict:
        """Offset at most ``max_lines`` newline-terminated records past
        ``start`` — a chunked byte scan counting b'\\n' (no JSON parse)."""
        files = self._files()
        i, pos = int(start["file"]), int(start["pos"])
        remaining = max_lines
        while i < len(files) and remaining > 0:
            size = os.path.getsize(files[i])
            if pos >= size:
                i, pos = i + 1, 0
                continue
            with open(files[i], "rb") as f:
                f.seek(pos)
                while remaining > 0 and pos < size:
                    chunk = f.read(min(1 << 20, size - pos))
                    if not chunk:
                        break
                    # consume newlines inside this chunk, at most `remaining`
                    at = 0
                    while remaining > 0:
                        nl = chunk.find(b"\n", at)
                        if nl < 0:
                            break
                        at = nl + 1
                        remaining -= 1
                    if remaining == 0:
                        pos += at
                    else:
                        pos += len(chunk)
            if pos >= size and remaining > 0:
                i, pos = i + 1, 0
        return {"file": i, "pos": pos}

    def latestOffset(self) -> dict:
        self._refresh_files()
        start = self._planned or self.initialOffset()
        self._planned = self._advance(start, self.per_batch)
        return self._planned

    def partitions(self, start: dict, end: dict):
        # clamp the planning cursor forward by whatever Spark hands back:
        # a restart that replays a pending (start, end) batch lands here
        # before any latestOffset call, so the replayed end — not the log
        # head — seeds the next batch's advance
        self._planned = self._max_offset(self._planned, start, end)
        files = self._files()
        parts: list[InputPartition] = []
        s_file, s_pos = int(start["file"]), int(start["pos"])
        e_file, e_pos = int(end["file"]), int(end["pos"])
        for i in range(s_file, min(e_file + 1, len(files))):
            lo = s_pos if i == s_file else 0
            hi = e_pos if i == e_file else os.path.getsize(files[i])
            if hi <= lo:
                continue
            # sub-split the segment so one big file still fans out; the
            # owns-its-first-byte rule keeps splits coordination-free
            n = max(1, self.num_partitions)
            step = max(1 << 16, (hi - lo + n - 1) // n)
            bounds = list(range(lo, hi, step))
            parts.extend(
                InputPartition(
                    (files[i], a, bounds[j + 1] if j + 1 < len(bounds) else hi)
                )
                for j, a in enumerate(bounds)
            )
        if not parts:
            # empty range (e.g. a clamped restart batch): one empty
            # partition, not zero — same scan contract as the batch reader
            empty = files[0] if files else self.path
            parts = [InputPartition((empty, 0, 0))]
        return parts

    def read(self, partition):
        path, start, end = partition.value
        yield from _to_arrow_batches(_read_range(path, start, end))

    def commit(self, end: dict) -> None:
        pass  # file replay has nothing to acknowledge upstream


class _JsonlCommit(WriterCommitMessage):
    """Per-partition commit message: the staged file and its row count.
    Plain picklable attributes per the WriterCommitMessage contract."""

    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


def _stage_jsonl_batches(batches, staging: str) -> "_JsonlCommit":
    """Serialize Arrow RecordBatches of (key, value_json, offset) into one
    staged part file as wire-format JSONL (explicit ``"value": null``
    tombstones). Shared by the batch and stream writer faces — both
    receive Arrow batches (DataSource[Stream]ArrowWriter), so rows cross
    the JVM->Python boundary as columnar buffers, not pickled tuples."""
    import uuid as _uuid

    os.makedirs(staging, exist_ok=True)
    fname = os.path.join(staging, f"part-{_uuid.uuid4().hex}.jsonl")
    n = 0
    with open(fname, "w") as f:
        for rb in batches:
            for row in rb.to_pylist():
                value = (
                    None
                    if row["value_json"] is None
                    else json.loads(row["value_json"])
                )
                f.write(
                    json.dumps(
                        {
                            "key": row["key"],
                            "value": value,
                            "offset": row["offset"],
                        }
                    )
                    + "\n"
                )
                n += 1
    return _JsonlCommit(fname, n)


class ChangelogJsonlWriter(DataSourceArrowWriter):
    """Batch WRITER side of the connector (Spark 4 Python DataSource
    ARROW writer API — partitions arrive as pyarrow RecordBatches, not
    pickled rows): each executor partition serializes its batches to a
    staged ``part-*.jsonl`` and returns the file name as its commit
    message; the driver's ``commit`` promotes every staged file into the
    target directory and drops a ``_SUCCESS`` marker, ``abort`` discards
    the staging dir — files-appear-atomically-or-not-at-all, the same
    two-phase contract as Spark's built-in file sinks. Wire format is the
    reader's inverse: ``{"key": str, "value": obj|null, "offset": int}``
    with an explicit ``"value": null`` tombstone. Staging lives under the
    destination path (shared storage in a real deployment; one local FS
    here, same assumption the reader makes)."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        return _stage_jsonl_batches(
            iterator, os.path.join(self.path, "_staging")
        )

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


class ChangelogJsonlStreamWriter(DataSourceStreamArrowWriter):
    """STREAMING sink side of the connector — completing the matrix
    (batch read/write, stream read, stream write), Arrow on every face:
    each micro-batch's partitions arrive as pyarrow RecordBatches and
    stage ``part-*.jsonl`` files, and ``commit(messages, batchId)``
    promotes them under batch-id-prefixed names
    (``b0000000007-part-*.jsonl``) — so a RE-DELIVERED batch after a
    restart overwrites its own files instead of duplicating records,
    which is exactly-once for an idempotent file sink (the same
    epoch-keyed idempotence the foreachBatch jobs use, expressed at the
    connector layer). ``abort`` discards the staging dir."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_jsonl_batches(
            iterator, os.path.join(self.path, "_stream_staging")
        )

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
