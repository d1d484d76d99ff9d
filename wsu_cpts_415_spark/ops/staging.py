"""Session-scoped staged-projection cache.

Sketch pipelines share expensive staged projections: the shingle+md5
base-hash table feeds both ``minhash_signatures`` and both sides of the
``minhash_lsh_pairs`` self-join; the SimHash fingerprint table feeds
``simhash_fingerprints`` and both sides of ``simhash_hamming_pairs``.
Without materialization Spark recomputes the whole subtree per alias of a
self-join and per query -- the md5/shingle math is the dominant cost of
every sketch query (BENCH r1: the three sketch queries were 5.5 s of a
24 s suite).

``staged`` memoizes + persists a built projection per (SparkContext,
name, sf_dir).  MEMORY_AND_DISK keeps it spill-safe; entries are keyed by
the context id so a restarted session never sees another session's
DataFrames.  This is the local-mode analogue of writing a staged table
once and reading it from several jobs -- exactly what a 100 TB pipeline
does with its staged parquet layers (the cache holds the compacted
sketch columns, never raw text payloads beyond the shingle arrays).
"""

from __future__ import annotations

from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def _ctx_token(sc) -> str:
    """Stable per-SparkContext cache-key token (r13, ADVICE closure):
    ``id(sc)`` can be REUSED by CPython after a stopped context is
    garbage-collected, letting a new context in the same process read a
    dead context's memo entries (stale gate stats / models / broadcast
    decisions).  applicationId + startTime is unique per application and
    cached on the instance so the py4j round-trip happens once."""
    tok = getattr(sc, "_graft_staging_token", None)
    if tok is None:
        tok = f"{sc.applicationId}@{sc.startTime}"
        sc._graft_staging_token = tok
    return tok


# Cumulative EAGER build cost per staged layer/model/gate, keyed by a
# short layer tag (r13 verdict task: the bench's min-of-2 protocol
# assigns a layer's one-time build to the first toucher's discarded
# run, so the suite headline counts only steady-state reads; this log
# makes the excluded build cost a first-class artifact field).  Only
# eager work is logged -- a session-``staged`` persist materializes
# lazily inside its first consumer's timed run and is therefore NOT
# excluded by min-of-2 (it shows up as that query's run1/run2 gap).
_BUILD_LOG: dict[str, float] = {}


def _log_build(layer: str, sec: float) -> None:
    _BUILD_LOG[layer] = round(_BUILD_LOG.get(layer, 0.0) + sec, 3)


def staging_build_log() -> dict[str, float]:
    """Snapshot of cumulative eager staged-build seconds per layer
    (durable-layer parquet writes, trained-model actions, memoized gate
    stats actions, corpus fingerprint scans).  Never cleared by
    ``clear_staged`` -- it is an invocation-lifetime cost log, not a
    cache."""
    return dict(_BUILD_LOG)


def staged(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the persisted DataFrame registered under ``name`` for this
    session + dataset, building (and persisting) it on first use."""
    key = (_ctx_token(spark.sparkContext), name, sf_dir)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = df
    return df


_MODEL_CACHE: dict[tuple, object] = {}


def staged_model(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], object],
) -> object:
    """Driver-side analogue of ``staged`` for MODEL-SIZED Python values
    (trained codebooks, centroid lists, sketch parameters): memoized per
    (session, name, dataset).  The cluster equivalent is a persisted
    model table written once by the training job and read by every
    consumer -- training is deterministic here, so the memo changes
    latency, never results."""
    import time as _time

    key = (_ctx_token(spark.sparkContext), name, sf_dir)
    if key not in _MODEL_CACHE:
        t0 = _time.perf_counter()
        _MODEL_CACHE[key] = build()
        _log_build(f"model:{name}", _time.perf_counter() - t0)
    return _MODEL_CACHE[key]


MAYBE_BCAST_MAX_BYTES = 512 << 20  # hinted-broadcast ceiling, estimated


def maybe_broadcast(
    df: DataFrame,
    bound: int,
    max_bytes: int = MAYBE_BCAST_MAX_BYTES,
    persist_input: bool = False,
    stats_key: tuple | None = None,
) -> DataFrame:
    """Broadcast a doc-grain side table only below ``bound`` rows AND
    below ``max_bytes`` estimated serialized size (one cheap aggregate
    action, typically riding an already-persisted staged frame); above
    either bound the consuming join falls back to a shuffle join -- at
    100 TB scale a bucketed layout co-locates these joins instead of
    broadcasting.  Shared by the SSJoin filter/verify joins and the ER
    scorer's per-candidate signal attach.

    The byte bound exists because a row bound alone under-constrains
    VARIABLE-WIDTH tables: the compact shingle-hash side carries ~|doc|
    8-byte hashes per row, so a corpus of long documents near the row
    bound would otherwise force a multi-GB ``F.broadcast`` (the hint
    bypasses ``spark.sql.autoBroadcastJoinThreshold``) and risk
    executor/driver OOM.  Estimation is schema-driven per row:
    fixed-width arrays at 8 bytes per element, string/binary arrays at
    their aggregate content length (+16/element overhead),
    strings/binary at their length, everything else a flat 8 --
    measured in the same single aggregate as the row count, so the
    check adds no extra action.

    ``persist_input`` is for call sites whose input is an UN-persisted
    subtree (a windowed aggregate, a degree rollup): without it the
    subtree evaluates twice -- once for the gate stats, once in the
    consuming join.  When set, the frame is persisted (and registered
    with the session release path) BEFORE the gate action, so the
    stats scan materializes the cache the join then reads.  Sites
    riding already-staged frames leave it off.

    ``stats_key`` (r12) memoizes the measured (rows, bytes) PER SESSION
    for call sites whose input is a pure function of the dataset dir +
    code constants -- the same immutability contract the staged-layer
    memo rides.  The gate decision for such a frame cannot change
    within a session, so later calls skip the gate's aggregate action;
    the ``persist_input`` persist is KEPT on a hit (lazily -- the first
    consumer materializes it at no extra job) because multi-consumer
    sites still need single evaluation.  The persisted frame itself is
    memoized alongside the stats (r13, ADVICE closure): repeated calls
    reuse the already-tracked cached frame instead of re-persisting a
    fresh copy of the same logical plan per call -- which grew the
    release list unboundedly and re-materialized an identical cache.
    Keys are namespaced per call site and include the dataset dir; only
    the scalar stats and the persisted-frame handle are memoized, never
    raw data outside Spark's own cache."""
    import time as _time

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _gate_persist(frame: DataFrame) -> DataFrame:
        # one persisted frame per memoized site: the site's input is a
        # pure function of (dataset dir, constants), so every call's
        # frame is the same logical plan -- reuse the first call's
        # cached copy instead of stacking persists of identical plans
        if memo_key is None:
            return track_persist(frame.persist(StorageLevel.MEMORY_AND_DISK))
        pkey = ("__gate_persist",) + memo_key
        cached = _CACHE.get(pkey)
        if cached is None:
            cached = frame.persist(StorageLevel.MEMORY_AND_DISK)
            _CACHE[pkey] = cached
        return cached

    memo_key = None
    if stats_key is not None:
        memo_key = (
            _ctx_token(df.sparkSession.sparkContext),
            "__gate_stats",
        ) + tuple(stats_key)
        hit = _MODEL_CACHE.get(memo_key)
        if hit is not None:
            if persist_input:
                df = _gate_persist(df)
            n_rows, n_bytes = hit
            small = n_rows <= bound and n_bytes <= max_bytes
            return F.broadcast(df) if small else df

    if persist_input:
        df = _gate_persist(df)

    per_row = F.lit(16)
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.ArrayType):
            elem = field.dataType.elementType
            if isinstance(elem, T.StringType):
                # variable-width elements: charge aggregate content
                # length + per-element overhead -- a flat 8/element
                # would underestimate a string-array column ~3x and
                # let a hinted broadcast through the OOM guard.
                # array_join + length stays inside whole-stage codegen
                # (ArrayAggregate is CodegenFallback -- an interpreted
                # per-row fold would tax every maybe_broadcast check);
                # null elements are skipped by array_join, matching the
                # coalesce(length(x), 0) the fold form charged them
                per_row = (
                    per_row
                    + 16
                    + 16 * F.greatest(F.size(c), F.lit(0))
                    + F.coalesce(F.length(F.array_join(c, "")), F.lit(0))
                )
            elif isinstance(elem, T.BinaryType):
                # no current caller ships binary arrays; array_join
                # can't take them, so keep the (interpreted) fold on
                # this cold path rather than lose the byte guard
                per_row = (
                    per_row
                    + 16
                    + 16 * F.greatest(F.size(c), F.lit(0))
                    + F.coalesce(
                        F.aggregate(
                            c,
                            F.lit(0),
                            lambda acc, x: acc
                            + F.coalesce(F.length(x), F.lit(0)),
                        ),
                        F.lit(0),
                    )
                )
            else:
                # fixed-width elements (nested arrays/structs don't
                # flow through any current caller; they'd land here
                # at 8/element -- extend if one ever does)
                per_row = per_row + 16 + 8 * F.greatest(F.size(c), F.lit(0))
        elif isinstance(field.dataType, (T.StringType, T.BinaryType)):
            per_row = per_row + 16 + F.coalesce(F.length(c), F.lit(0))
        else:
            per_row = per_row + 8
    t0 = _time.perf_counter()
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(per_row.cast("bigint")), F.lit(0)).alias("b"),
    ).collect()[0]
    if memo_key is not None:
        # only memoized sites log: their gate action runs once per
        # invocation (excluded from steady-state min-of-2 timings);
        # un-memoized gates re-run per call and are already inside
        # every reported per-query number
        _log_build(f"gate:{stats_key[0]}", _time.perf_counter() - t0)
        _MODEL_CACHE[memo_key] = (int(stats["n"]), int(stats["b"]))
    small = stats["n"] <= bound and stats["b"] <= max_bytes
    return F.broadcast(df) if small else df


STAGING_ROOT_ENV = "SPARK_GRAFT_STAGING_DIR"

# Bump whenever the BUILD LOGIC of any durably staged layer changes in a
# way its output depends on (shingle scheme, hash family, rank key, ...).
# The version is folded into every staged path's fingerprint digest, so a
# staging root that persists across code revisions can never serve
# parquet built by older logic.  Per-layer constants (band counts, edit
# bounds, ...) ride the `salt` argument of staged_table instead, so
# tuning one layer re-keys only that layer.
STAGING_FORMAT_VERSION = 2

# Retention: newest N fingerprint directories kept per (dataset, layer);
# older ones are GC'd at publish time.  N=2 keeps the previous corpus
# snapshot warm across an A/B re-ingest while bounding disk on an
# evolving corpus (the standing-store streaming scenario).
STAGING_KEEP_LATEST = 2


_EPHEMERAL_ROOT: list[str] = []


def _ephemeral_root() -> str:
    """Per-INVOCATION staging root: a fresh 0700 mkdtemp, removed at
    process exit.  The default when no root is pinned -- so every
    bench/oracle/conformance invocation rebuilds every staged layer from
    the parquet inputs (no cross-run precomputation), while keeping the
    write-once/read-many layer semantics WITHIN the invocation.  Memoized
    per process so all layers of one run share one root."""
    import atexit
    import os
    import shutil
    import tempfile

    if not _EPHEMERAL_ROOT:
        d = tempfile.mkdtemp(
            prefix=f"spark_graft_staging_eph_u{os.getuid()}_"
        )
        atexit.register(lambda: shutil.rmtree(d, ignore_errors=True))
        _EPHEMERAL_ROOT.append(d)
    return _EPHEMERAL_ROOT[0]


def _staging_root() -> str | None:
    """Resolve and vet the staging root.

    Default is INVOCATION-EPHEMERAL (``_ephemeral_root``): staged layers
    are computed from the parquet inputs on every invocation and shared
    only within it.  Cross-session durability -- the 100 TB pattern of a
    warehouse staging path read by later sessions -- is OPT-IN via
    ``SPARK_GRAFT_STAGING_DIR`` (how the restart probes and a real
    deployment drive it); a pinned root is only trusted when it is OWNED
    by this uid and not writable by others (a world-shared path would
    let another local user plant parquet that staged_table reads --
    cache poisoning -- or squat the root to disable durability).  Any
    mismatch returns None and the caller degrades to session staging
    (never to an error, never to reading an untrusted tree)."""
    import os
    import stat

    root = os.environ.get(STAGING_ROOT_ENV) or _ephemeral_root()
    try:
        if not os.path.lexists(root):
            os.makedirs(root, mode=0o700, exist_ok=True)
            os.chmod(root, 0o700)  # makedirs mode is umask-filtered
        st = os.lstat(root)
        if (
            not stat.S_ISDIR(st.st_mode)
            or st.st_uid != os.getuid()
            or st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)
        ):
            return None
    except OSError:
        return None
    return root


def _docs_stat(sf_dir: str):
    """(n_files, total_bytes, max_mtime_ns) of the documents parquet
    (single file or Spark part-file directory), or None when
    unreadable.  The filesystem proxy behind the fingerprint sidecar:
    parquet layouts are written whole, so identical stats mean the
    bytes are the ones a prior session already hashed."""
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isfile(p):
            st = os.stat(p)
            return [1, st.st_size, st.st_mtime_ns]
        n = b = m = 0
        for base, _, files in os.walk(p):
            for f in files:
                st = os.stat(os.path.join(base, f))
                n += 1
                b += st.st_size
                m = max(m, st.st_mtime_ns)
        return [n, b, m] if n else None
    except OSError:
        return None


def _corpus_fp(spark: SparkSession, sf_dir: str):
    """(row count, xor, seeded sum) of per-row full-column hashes of the
    documents table: an order-insensitive corpus identity covering EVERY
    column (doc_id, text, lang, source, n_chars -- the streaming gate's
    (doc_id, text) form would alias fixtures that differ only in
    metadata columns).  Two independent 64-bit aggregates because xor
    alone cancels on duplicate-row pairs and aliases on a single
    non-crypto collision; the decimal SUM of a differently-seeded hash
    makes accidental aliasing negligible (a corpus pair must collide in
    BOTH linear forms).  Memoized per session; None when the table is
    unreadable (caller falls back to session staging).

    The content scan itself is also memoized DURABLY: a sidecar in the
    (ownership-vetted) staging root keys the fingerprint by the parquet
    layout's (file count, total bytes, max mtime_ns), so a restarted
    session over an unchanged corpus skips the full-corpus hash scan --
    at x100 that scan alone was multiple seconds of every session's
    first staged read.  Any stat change (parquet layouts are written
    whole) falls back to the real scan and rewrites the sidecar
    atomically."""
    import hashlib
    import json as _json
    import os
    import time as _time

    from pyspark.sql import functions as F

    key = (_ctx_token(spark.sparkContext), "__corpus_fp", sf_dir)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    root = _staging_root()
    stat = _docs_stat(sf_dir)
    sidecar = None
    if root is not None and stat is not None:
        slug = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
        sidecar = f"{root}/{slug}/__corpus_fp_v{STAGING_FORMAT_VERSION}.json"
        try:
            with open(sidecar) as f:
                rec = _json.load(f)
            if rec.get("stat") == stat:
                fp = tuple(rec["fp"])
                _MODEL_CACHE[key] = fp
                return fp
        except (OSError, ValueError, KeyError, TypeError):
            pass
    try:
        from wsu_cpts_415_spark.io.tables import load_table

        t0 = _time.perf_counter()
        row = (
            load_table(spark, sf_dir, "documents")
            .agg(
                F.count("*"),
                F.expr(
                    "bit_xor(xxhash64(doc_id, text, lang, source,"
                    " n_chars))"
                ),
                F.expr(
                    "sum(cast(xxhash64('fp2', doc_id, text, lang,"
                    " source, n_chars) as decimal(38,0)))"
                ),
            )
            .collect()[0]
        )
        fp = (int(row[0]), int(row[1] or 0), int(row[2] or 0))
        _log_build("corpus_fp", _time.perf_counter() - t0)
        _MODEL_CACHE[key] = fp
        if sidecar is not None:
            try:
                os.makedirs(os.path.dirname(sidecar), exist_ok=True)
                tmp = f"{sidecar}.tmp-{os.getpid()}"
                with open(tmp, "w") as f:
                    _json.dump({"stat": stat, "fp": list(fp)}, f)
                os.replace(tmp, sidecar)
            except OSError:
                pass
    except Exception:
        _MODEL_CACHE[key] = None
    return _MODEL_CACHE[key]


def _gc_staged(layer_dir: str, protect: str) -> None:
    """Keep-latest-N retention for one (dataset, layer) directory: every
    ``fp=*`` sibling beyond the STAGING_KEEP_LATEST most-recently-used
    (and beyond ``protect``, the fingerprint just published or read) is
    removed ATOMICALLY -- renamed to a ``.trash-`` name first, so a
    concurrent reader either sees the complete directory or none of it,
    then deleted.  Leftover ``.trash-`` and stale ``.tmp-`` dirs from
    crashed sessions are swept on the same pass.  Best-effort
    throughout: GC failure must never fail a query."""
    import os
    import shutil
    import time

    try:
        entries = os.listdir(layer_dir)
    except OSError:
        return
    fps = []
    for e in entries:
        full = os.path.join(layer_dir, e)
        if ".trash-" in e:
            shutil.rmtree(full, ignore_errors=True)
            continue
        if ".tmp-" in e:
            try:  # orphaned publish attempt: sweep after an hour
                if time.time() - os.path.getmtime(full) > 3600:
                    shutil.rmtree(full, ignore_errors=True)
            except OSError:
                pass
            continue
        if e.startswith("fp="):
            try:
                fps.append((os.path.getmtime(full), full))
            except OSError:
                pass
    fps.sort(reverse=True)
    for _, full in fps[STAGING_KEEP_LATEST:]:
        if os.path.basename(full) == os.path.basename(protect):
            continue
        trash = f"{full}.trash-{os.getpid()}"
        try:
            os.rename(full, trash)
        except OSError:
            continue  # concurrent GC won the rename; theirs to delete
        shutil.rmtree(trash, ignore_errors=True)


def staging_audit(root: str | None = None) -> list[dict]:
    """Inventory of the durable staging root: one record per (dataset
    slug, layer) with fingerprint-directory count, total bytes, and file
    count -- the observability surface for the retention policy (a
    keep-latest-N bug shows up here as fp_dirs > STAGING_KEEP_LATEST or
    monotone byte growth).  Exposed as the ``staging-audit`` CLI
    subcommand."""
    import os

    if root is None:
        root = _staging_root()
    out: list[dict] = []
    if root is None or not os.path.isdir(root):
        return out
    for slug in sorted(os.listdir(root)):
        slug_dir = os.path.join(root, slug)
        if not os.path.isdir(slug_dir):
            continue
        for layer in sorted(os.listdir(slug_dir)):
            layer_dir = os.path.join(slug_dir, layer)
            if not os.path.isdir(layer_dir):
                continue
            n_fp = n_files = n_bytes = 0
            for fp in os.listdir(layer_dir):
                fp_dir = os.path.join(layer_dir, fp)
                if not (fp.startswith("fp=") and os.path.isdir(fp_dir)):
                    continue
                n_fp += 1
                for base, _, files in os.walk(fp_dir):
                    for f in files:
                        n_files += 1
                        try:
                            n_bytes += os.path.getsize(
                                os.path.join(base, f)
                            )
                        except OSError:
                            pass
            out.append(
                {
                    "dataset": slug,
                    "layer": layer,
                    "fp_dirs": n_fp,
                    "files": n_files,
                    "bytes": n_bytes,
                }
            )
    return out


def staged_table(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
    salt: str = "",
    expect_cols: list[str] | None = None,
) -> DataFrame:
    """Durable twin of ``staged``: the built projection is written ONCE
    as parquet keyed by (dataset dir, corpus fingerprint, build salt)
    and every later session -- including a restarted one -- READS it
    instead of re-running the build.  This is the cluster pattern of a
    persisted staged layer (write-once, read-by-every-job) brought to
    the heavy per-session rebuilds the x100 ER probe priced at 206.9 s
    cold vs 7.3 s warm: the shingle/lev/SNM projections are pure
    functions of the documents table, so the fingerprint makes the disk
    copy safe to trust across sessions and a changed corpus simply keys
    a new path.

    ``salt`` carries the BUILD CONSTANTS the layer's content depends on
    (band counts, edit bounds, rank-key shape): the staging root
    outlives code revisions, so without the salt a constant tuned
    between sessions would silently serve parquet built by the old
    logic.  STAGING_FORMAT_VERSION is folded in globally for the same
    reason.  ``expect_cols``, when given, vets a read table's schema
    before trusting it; a mismatch discards the directory and rebuilds.

    Concurrency: the build lands in a session-unique temp dir and is
    renamed into place (atomic on one filesystem); losing a rename race
    means another session published the identical content -- read
    theirs.  Each publish also runs keep-latest-N retention over the
    layer's other fingerprints (see ``_gc_staged``).  Any failure
    (unwritable/untrusted root, fingerprint scan error) degrades to
    plain session staging, never to an error.  The returned frame is
    ALSO session-persisted so in-session consumers keep the
    memoized-DataFrame semantics of ``staged``; both sessions' frames
    are parquet round-trips of the same write, so a restarted session
    sees byte-identical values."""
    import hashlib
    import os
    import shutil
    import time as _time

    mem_key = (_ctx_token(spark.sparkContext), f"durable:{name}", sf_dir)
    df = _CACHE.get(mem_key)
    if df is not None:
        return df
    fp = _corpus_fp(spark, sf_dir)
    root = _staging_root()
    if fp is None or root is None:
        return staged(spark, name, sf_dir, build)

    slug = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    digest = hashlib.md5(
        f"v{STAGING_FORMAT_VERSION}|{salt}|{fp[1]}|{fp[2]}".encode()
    ).hexdigest()[:16]
    layer_dir = f"{root}/{slug}/{name}"
    path = f"{layer_dir}/fp={fp[0]}_{digest}"
    out = None
    if os.path.exists(f"{path}/_SUCCESS"):
        try:
            out = spark.read.parquet(path)
            if expect_cols is not None and not set(expect_cols) <= set(
                out.columns
            ):
                out = None  # stale shape: discard and rebuild below
                os.rename(path, f"{path}.trash-{os.getpid()}")
            else:
                os.utime(path)  # bump LRU recency for retention
        except Exception:
            out = None
    if out is None:
        tmp = f"{path}.tmp-{os.getpid()}"
        try:
            t0 = _time.perf_counter()
            build().write.mode("overwrite").parquet(tmp)
            _log_build(f"layer:{name}", _time.perf_counter() - t0)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            try:
                os.rename(tmp, path)
            except OSError:
                # lost the publish race: identical content already there
                shutil.rmtree(tmp, ignore_errors=True)
            out = spark.read.parquet(path)
            _gc_staged(layer_dir, protect=path)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            return staged(spark, name, sf_dir, build)
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    _CACHE[mem_key] = out
    return out


_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Register an externally-persisted DataFrame (e.g. the trending
    scored layer) with the session release path so clear_staged() can
    unpersist it -- keeps total cached storage bounded over long runs
    (the 259-query conformance sweep asserts this)."""
    _TRACKED.append(df)
    return df


def clear_staged() -> None:
    """Unpersist and drop every cache entry (tests; memory pressure)."""
    for df in list(_CACHE.values()) + _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()
    _MODEL_CACHE.clear()
    _TRACKED.clear()
