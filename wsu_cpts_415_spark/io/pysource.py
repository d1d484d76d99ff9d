"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic-events generator, registered as ``format("synthetic_events")``.

Why it exists: the engine's source surface (S-rows in SURVEY.md §2)
covers files (parquet/ORC/CSV/JSON/XML, TSV crawl trees) and streams
(file-source streaming).  The Python DataSource API is the remaining
first-class way third parties plug sources into Spark -- this module
carries that surface with a generator any test can call without I/O:
seeded, partition-parallel, and schema-stable.

Semantics: ``load()`` takes options ``n_rows`` (total), ``n_partitions``
and ``seed``; every row is a pure function of (seed, row index) via a
splitmix64-style integer mix, so the SAME option set yields the SAME
rows on any cluster, any partition count (rows are range-partitioned by
index).  No RNG state crosses partitions -- each task derives its rows
from its [start, end) slice alone, the property that makes a generator
scale: adding executors re-slices the index space without changing a
single emitted row.

This is also the pattern for real custom sources (REST pagination,
message queues): partitions() enumerates self-describing slices up
front; read() touches only its slice.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer: a public-domain integer mix (Steele et al.,
    "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _row(seed: int, i: int):
    h = _mix(seed * 0x5851F42D4C957F2D + i)
    return (
        i,
        1_700_000_000_000_000 + i * 1_000_000 + (h % 1_000_000),
        h % 1000,
        EVENT_TYPES[(h >> 10) % len(EVENT_TYPES)],
        round(((h >> 20) % 10_000) / 100.0, 2),
    )


@dataclass
class _Slice(InputPartition):
    start: int
    end: int
    seed: int


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_rows // self.n_partitions)
        return [
            _Slice(lo, min(lo + per, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("ts_us", T.LongType(), False),
                T.StructField("user_id", T.LongType(), False),
                T.StructField("event_type", T.StringType(), False),
                T.StructField("value", T.DoubleType(), False),
            ]
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


# --- streaming face of the same generator --------------------------------


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same (seed, index) row space: offsets
    are plain row indices, each trigger advances by ``rows_per_batch``
    until ``max_rows``.  Because rows are pure functions of the index,
    replaying any offset range after a crash yields identical rows --
    exactly-once comes from determinism plus the checkpoint's offset
    log, with no source-side state at all."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 2))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": self.max_rows}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        per = max(1, -(-(hi - lo) // self.n_partitions))
        return [
            _Slice(s, min(s + per, hi), self.seed) for s in range(lo, hi, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)

    def commit(self, end):
        pass  # nothing to clean up: the generator holds no state


class SyntheticEventsStreamingDataSource(SyntheticEventsDataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def streamReader(self, schema: T.StructType):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_stream_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsStreamingDataSource)


# --- writer face: JSON-lines sink with a two-phase commit ------------------


@dataclass
class _StagedFile(WriterCommitMessage):
    """Commit message: one staged file per task, with its audit counts.
    Picklable (dataclass of primitives), per the WriterCommitMessage
    contract."""

    path: str
    n_rows: int
    total_value: float


class JsonLinesAuditWriter(DataSourceWriter):
    """Executor side of the sink: each task streams its rows to ONE
    staged file under ``<path>/_staging/`` and returns a commit message
    naming the file plus its control totals.  Nothing becomes visible
    until the driver's commit() publishes it -- the two-phase protocol
    that makes a distributed write atomic-by-rename on a filesystem (an
    object store swaps the rename for multipart-complete; the message
    flow is identical)."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.total_col = options.get("total_col")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        # attempt-unique name: a zombie task's file is simply never
        # committed (its message never reaches the driver)
        fname = os.path.join(
            staging,
            f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex}.jsonl",
        )
        n, total = 0, 0.0
        with open(fname, "w") as f:
            for row in iterator:
                d = row.asDict()
                f.write(json.dumps(d, default=str) + "\n")
                n += 1
                if self.total_col is not None:
                    total += float(d[self.total_col] or 0.0)
        return _StagedFile(path=fname, n_rows=n, total_value=total)

    def commit(self, messages):
        import json
        import os
        import shutil

        final_files = []
        for m in messages:
            dest = os.path.join(self.path, os.path.basename(m.path))
            os.replace(m.path, dest)  # atomic on a posix fs
            final_files.append(os.path.basename(dest))
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
        control = {
            "n_rows": sum(m.n_rows for m in messages),
            "n_files": len(messages),
            "files": sorted(final_files),
        }
        if self.total_col is not None:
            control["total_col"] = self.total_col
            control["total_value"] = round(
                sum(m.total_value for m in messages), 6
            )
        with open(os.path.join(self.path, "_control_totals.json"), "w") as f:
            json.dump(control, f, sort_keys=True)

    def abort(self, messages):
        import os
        import shutil

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonLinesAuditDataSource(DataSource):
    """``df.write.format("jsonl_audit").option("path", ...).save()``:
    JSON-lines files plus a ``_control_totals.json`` reconciliation
    sidecar (row count, file list, optional column sum) -- the S5
    control-total sink discipline (io/ingest.py:146) carried onto the
    Python DataSource writer API, closing the write face of the custom
    source surface (reader + streamReader above)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema: T.StructType, overwrite: bool):
        if "path" not in self.options:
            raise ValueError("jsonl_audit requires .option('path', ...)")
        return JsonLinesAuditWriter(self.options, overwrite)


def register_jsonl_audit_sink(spark) -> None:
    spark.dataSource.register(JsonLinesAuditDataSource)
