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
    staged file under ``<path>/_staging/<write_id>/`` and returns a
    commit message naming the file plus its control totals.  Nothing
    becomes visible until the driver's commit() publishes it -- the
    two-phase protocol that makes a distributed write atomic-by-rename
    on a filesystem (an object store swaps the rename for
    multipart-complete; the message flow is identical).

    PRECONDITION: executors and driver must share the filesystem under
    ``path`` (local mode, NFS, or a DFS mount) -- write() stages on the
    executor's filesystem and commit() renames on the driver's, so the
    protocol silently loses data if those differ.  This repo runs
    single-node; a cluster deployment would swap the ``open``/
    ``os.replace`` calls for HDFS/object-store clients with the same
    stage-then-publish message flow.

    Abort discipline (three layers, because Spark does not promise the
    driver-side abort() runs AFTER every in-flight task stops):
      * each write is namespaced by a driver-minted ``write_id``, so a
        retried/aborted attempt of THIS path never shares a staging dir
        with a later attempt;
      * a failing task unlinks its own staged file (try/except);
      * abort() drops a ``<write_id>._ABORTED`` marker BEFORE sweeping,
        and every task re-checks the marker after closing its file --
        a task that finishes after the sweep sees the marker and
        deletes its own file, closing the finish-after-sweep race.
        The marker itself must OUTLIVE every straggler, so abort()
        deliberately leaves it behind;
      * staleness is swept at the next write to the same path: a new
        writer's __init__ (driver-side, before any task runs) removes
        foreign staging DIRS but preserves foreign ``._ABORTED``
        markers -- a prior aborted write's stragglers may still be
        running, and the marker is what makes them self-delete, so it
        must survive the init sweep; commit() then rmtrees the whole
        ``_staging`` (markers included), so abort-only workloads
        accumulate at most one write's dirs plus the tiny markers
        until the next successful commit.

    CONTRACT: one writer per path at a time.  The stale sweeps above
    assume any foreign ``_staging`` entry belongs to a FINISHED prior
    job; a concurrent write to the same path would have its staged
    files silently swept.  (Spark itself gives the same guarantee only
    per-job; cross-job output commit coordination is the deployment's
    responsibility on any sink.)
    """

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options["path"]
        self.total_col = options.get("total_col")
        self.overwrite = overwrite
        # minted once on the driver, pickled to every task: the job's
        # staging namespace and abort-marker identity
        self.write_id = uuid.uuid4().hex
        # stale sweep (driver-side, before any task of THIS write runs):
        # under the one-writer-per-path contract, anything already under
        # _staging -- abort markers, dirs a straggler re-created after
        # its job's abort() -- belongs to a finished prior attempt
        self._sweep_stale_staging()

    def _sweep_stale_staging(self):
        import os
        import shutil

        root = os.path.join(self.path, "_staging")
        try:
            entries = os.listdir(root)
        except OSError:
            return
        for e in entries:
            p = os.path.join(root, e)
            try:
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                elif not e.endswith("._ABORTED"):
                    os.remove(p)
                # foreign ._ABORTED markers are PRESERVED here: an
                # aborted prior write's straggler tasks may still be
                # running (Spark does not preclude that interleaving),
                # and the marker is what makes them self-delete their
                # re-landed staged files -- "the marker must outlive
                # every straggler" has to hold across back-to-back
                # writes to the same path.  Markers die at commit()'s
                # full _staging rmtree, the point where this write has
                # already won and any residue is unreachable anyway.
            except OSError:
                pass

    def _staging_dir(self):
        import os

        return os.path.join(self.path, "_staging", self.write_id)

    def _abort_marker(self):
        import os

        return os.path.join(
            self.path, "_staging", f"{self.write_id}._ABORTED"
        )

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        staging = self._staging_dir()
        os.makedirs(staging, exist_ok=True)
        # attempt-unique name: a zombie task's file is simply never
        # committed (its message never reaches the driver)
        fname = os.path.join(
            staging,
            f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex}.jsonl",
        )
        n, total = 0, 0.0
        try:
            with open(fname, "w") as f:
                for row in iterator:
                    d = row.asDict()
                    f.write(json.dumps(d, default=str) + "\n")
                    n += 1
                    if self.total_col is not None:
                        total += float(d[self.total_col] or 0.0)
        except BaseException:
            # failing/interrupted task cleans up its own staged file
            try:
                os.remove(fname)
            except OSError:
                pass
            raise
        # close the finish-after-sweep race: if the driver already
        # aborted this write, our file was (or is about to be) orphaned
        # by the sweep -- delete it ourselves
        if os.path.exists(self._abort_marker()):
            try:
                os.remove(fname)
            except OSError:
                pass
        return _StagedFile(path=fname, n_rows=n, total_value=total)

    def commit(self, messages):
        import json
        import os
        import shutil

        old_files = set()
        if self.overwrite and os.path.isdir(self.path):
            old_files = {
                f
                for f in os.listdir(self.path)
                if f.endswith(".jsonl")
                and os.path.isfile(os.path.join(self.path, f))
            }
        final_files = []
        for m in messages:
            dest = os.path.join(self.path, os.path.basename(m.path))
            os.replace(m.path, dest)  # atomic on a posix fs
            final_files.append(os.path.basename(dest))
        if self.overwrite:
            # overwrite semantics: pre-existing part files not re-staged
            # this write must go, or readers globbing *.jsonl would see
            # a union the control sidecar doesn't describe
            for f in old_files - set(final_files):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass
        # stale-attempt sweep: anything still under _staging -- other
        # write_ids' leftovers, abort markers, files from task attempts
        # whose messages never reached us -- is by definition not part
        # of this commit
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

        # marker FIRST: any task finishing after this point sees it and
        # unlinks its own staged file (see write()); only then sweep
        try:
            os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
            with open(self._abort_marker(), "w") as f:
                f.write("aborted")
        except OSError:
            pass
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        shutil.rmtree(self._staging_dir(), ignore_errors=True)


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
