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

_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def staged(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the persisted DataFrame registered under ``name`` for this
    session + dataset, building (and persisting) it on first use."""
    key = (id(spark.sparkContext), name, sf_dir)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = df
    return df


_MODEL_CACHE: dict[tuple[int, str, str], object] = {}


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
    key = (id(spark.sparkContext), name, sf_dir)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = build()
    return _MODEL_CACHE[key]


MAYBE_BCAST_MAX_BYTES = 512 << 20  # hinted-broadcast ceiling, estimated


def maybe_broadcast(
    df: DataFrame, bound: int, max_bytes: int = MAYBE_BCAST_MAX_BYTES
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
    check adds no extra action."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

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
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(per_row.cast("bigint")), F.lit(0)).alias("b"),
    ).collect()[0]
    small = stats["n"] <= bound and stats["b"] <= max_bytes
    return F.broadcast(df) if small else df


STAGING_ROOT_ENV = "SPARK_GRAFT_STAGING_DIR"
_DEFAULT_STAGING_ROOT = "/tmp/spark_graft_staging"


def _corpus_fp(spark: SparkSession, sf_dir: str):
    """(row count, xor of per-row full-column hashes) of the documents
    table: an order-insensitive corpus identity covering EVERY column
    (doc_id, text, lang, source, n_chars -- the streaming gate's
    (doc_id, text) form would alias fixtures that differ only in
    metadata columns).  One linear scan, memoized per session; None when
    the table is unreadable (caller falls back to session staging)."""
    from pyspark.sql import functions as F

    key = (id(spark.sparkContext), "__corpus_fp", sf_dir)
    if key not in _MODEL_CACHE:
        try:
            from wsu_cpts_415_spark.io.tables import load_table

            row = (
                load_table(spark, sf_dir, "documents")
                .agg(
                    F.count("*"),
                    F.expr(
                        "bit_xor(xxhash64(doc_id, text, lang, source,"
                        " n_chars))"
                    ),
                )
                .collect()[0]
            )
            _MODEL_CACHE[key] = (int(row[0]), int(row[1] or 0))
        except Exception:
            _MODEL_CACHE[key] = None
    return _MODEL_CACHE[key]


def staged_table(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Durable twin of ``staged``: the built projection is written ONCE
    as parquet keyed by (dataset dir, corpus fingerprint) and every
    later session -- including a restarted one -- READS it instead of
    re-running the build.  This is the cluster pattern of a persisted
    staged layer (write-once, read-by-every-job) brought to the heavy
    per-session rebuilds the x100 ER probe priced at 206.9 s cold vs
    7.3 s warm: the shingle/lev/SNM projections are pure functions of
    the documents table, so the fingerprint makes the disk copy safe to
    trust across sessions and a changed corpus simply keys a new path.

    Concurrency: the build lands in a session-unique temp dir and is
    renamed into place (atomic on one filesystem); losing a rename race
    means another session published the identical content -- read
    theirs.  Any failure (unwritable root, fingerprint scan error)
    degrades to plain session staging, never to an error.  The returned
    frame is ALSO session-persisted so in-session consumers keep the
    memoized-DataFrame semantics of ``staged``; both sessions' frames
    are parquet round-trips of the same write, so a restarted session
    sees byte-identical values."""
    import os
    import shutil

    mem_key = (id(spark.sparkContext), f"durable:{name}", sf_dir)
    df = _CACHE.get(mem_key)
    if df is not None:
        return df
    fp = _corpus_fp(spark, sf_dir)
    if fp is None:
        return staged(spark, name, sf_dir, build)
    import hashlib

    root = os.environ.get(STAGING_ROOT_ENV, _DEFAULT_STAGING_ROOT)
    slug = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = (
        f"{root}/{slug}/{name}/fp={fp[0]}_{fp[1] & ((1 << 64) - 1):016x}"
    )
    out = None
    if os.path.exists(f"{path}/_SUCCESS"):
        try:
            out = spark.read.parquet(path)
        except Exception:
            out = None
    if out is None:
        tmp = f"{path}.tmp-{os.getpid()}"
        try:
            build().write.mode("overwrite").parquet(tmp)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            try:
                os.rename(tmp, path)
            except OSError:
                # lost the publish race: identical content already there
                shutil.rmtree(tmp, ignore_errors=True)
            out = spark.read.parquet(path)
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
