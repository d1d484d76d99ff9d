"""Table-maintenance operators for parquet stores: upsert merge (SCD-1)
and small-file compaction.

A continuously-ingesting pipeline (the reference re-runs its Mongo loader
per crawl date, reference mongo_loader.py:124-238) needs two operations a
plain ``write.parquet`` doesn't give you:

  * MERGE: apply a batch of updates keyed on the table's unique key --
    new keys inserted, existing keys replaced (the Mongo loader's
    duplicate-key-11000 path inverted: LAST writer wins, explicitly).
  * COMPACT: micro-batch appends accumulate small files; at scale the
    per-file open/footer cost dominates scans long before data size does.

Both are implemented write-to-temp-then-swap so a crashed job never
leaves a half-written store, and both preserve the store's partition
layout (partition columns stay partition columns).

At 100 TB the same code applies per partition: MERGE touches only the
partitions holding changed keys (dynamic partition overwrite), COMPACT
runs partition-by-partition under the size target.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024  # compaction target (one HDFS-ish block)


def _swap_into(tmp_dir: str, out_dir: str) -> None:
    """Atomic-enough local swap: write finished tmp -> replace out."""
    old = out_dir.rstrip("/") + f".old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp_dir, out_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def merge_upsert(
    spark: SparkSession,
    store_dir: str,
    updates: DataFrame,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """SCD-1 MERGE: rows in ``updates`` replace store rows with the same
    key; unmatched update rows are inserted.  Returns counts.

    Plan: target LEFT ANTI updates on the key (survivors) UNION ALL
    updates.  The anti join shuffles on the key -- at scale, with the
    store partitioned by a key prefix, only affected partitions need
    rewriting (dynamic partition overwrite); this local form rewrites
    the store because the fixture stores are single-directory.

    Caveat (lazy reads): ``updates`` may read FROM the store -- the
    merge writes to a temp dir before the swap, so the source files are
    intact for the whole job.  But a DataFrame captured BEFORE a
    previous merge's swap dangles (its file listing points at deleted
    snapshots); derive updates fresh per call."""
    target = spark.read.parquet(store_dir)
    # updates must carry the full store schema (same columns, any order)
    updates = updates.select(*target.columns)
    n_before = target.count()
    # MERGE contract: one update row per key -- a duplicate-keyed batch
    # would land BOTH rows (left_anti removes the store row, union keeps
    # every update), silently breaking the store's unique-key invariant.
    # One action covers both the row count and the key-uniqueness check
    # (this runs per micro-batch under apply_rollup_batch, so an extra
    # full pass over updates is real per-batch cost); the struct wrapper
    # keeps NULL-keyed tuples countable, matching distinct().count().
    crow = updates.agg(
        F.count("*").alias("_n"),
        F.count_distinct(F.struct(*keys)).alias("_k"),
    ).first()
    n_updates, n_keys = crow["_n"], crow["_k"]
    if n_keys != n_updates:
        raise ValueError(
            f"merge_upsert: updates batch has {n_updates} rows but only "
            f"{n_keys} distinct keys {keys} -- dedup the batch first"
        )
    survivors = target.join(updates.select(*keys), on=keys, how="left_anti")
    merged = survivors.unionByName(updates)

    tmp = store_dir.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    _swap_into(tmp, store_dir)

    n_after = spark.read.parquet(store_dir).count()
    return {
        "before": n_before,
        "updates": n_updates,
        "after": n_after,
        "replaced": n_before + n_updates - n_after,
    }


def merge_delete(
    spark: SparkSession,
    store_dir: str,
    delete_keys: DataFrame,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Keyed DELETE (the TPC-H RF2 shape): store rows whose key appears
    in ``delete_keys`` are removed; everything else survives untouched.
    Same write-temp-then-swap discipline as merge_upsert, and the same
    scale posture -- the anti join shuffles on the key, and a store
    partitioned by a key prefix would rewrite only affected partitions
    via dynamic partition overwrite."""
    target = spark.read.parquet(store_dir)
    n_before = target.count()
    dk = delete_keys.select(*keys).distinct()
    survivors = target.join(dk, on=keys, how="left_anti")

    tmp = store_dir.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    writer = survivors.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    _swap_into(tmp, store_dir)

    n_after = spark.read.parquet(store_dir).count()
    return {
        "before": n_before,
        "after": n_after,
        "deleted": n_before - n_after,
    }


def scd2_init(
    spark: SparkSession,
    store_dir: str,
    snapshot: DataFrame,
    version: int,
) -> None:
    """Bootstrap an SCD-2 store from a first snapshot: every row current
    from ``version`` (valid_to NULL, is_current true)."""
    first = snapshot.select(
        "*",
        F.lit(version).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    tmp = store_dir.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    first.write.mode("overwrite").parquet(tmp)
    _swap_into(tmp, store_dir)


def merge_scd2(
    spark: SparkSession,
    store_dir: str,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    version: int,
) -> dict[str, int]:
    """SCD-2 MERGE (history-preserving upsert): rows whose tracked
    columns changed get their current row CLOSED (valid_to = version,
    is_current = false) and a new current row opened at ``version``; new
    keys are inserted as current; unchanged keys are untouched -- so
    re-applying the same batch is a no-op (idempotent), and the full
    change history of every key stays queryable (the "type 2" dimension
    of Kimball's taxonomy, vs ``merge_upsert``'s overwrite-in-place
    type 1).

    Plan: one full-outer join of the CURRENT slice against the batch on
    the key; history rows pass through untouched.  Change detection is
    null-safe equality over the tracked columns.  At scale the current
    slice is the only side shuffled (partition the store by is_current
    so the history files are never read), and the batch side broadcasts
    when small."""
    if not tracked:
        raise ValueError("merge_scd2: tracked columns must be non-empty")
    target = spark.read.parquet(store_dir)
    cols = [c for c in target.columns if c not in ("valid_from", "valid_to", "is_current")]
    current = target.filter(F.col("is_current"))
    history = target.filter(~F.col("is_current"))

    # explicit presence markers: the join is null-SAFE on the keys, so a
    # NULL key value is in-contract and "keys[0] IS NOT NULL" would
    # misclassify such batch rows as absent (dropping their insert or
    # ignoring their change)
    u = updates.select(*cols).withColumn("_u_present", F.lit(True)).alias("u")
    t = current.alias("t")
    joined = t.join(u, on=[F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys], how="full_outer")

    t_present = F.col("t.is_current").isNotNull()
    u_present = F.col("u._u_present").isNotNull()
    changed = None
    for c in tracked:
        neq = ~F.col(f"t.{c}").eqNullSafe(F.col(f"u.{c}"))
        changed = neq if changed is None else (changed | neq)

    # untouched current rows: key absent from batch, or present but equal
    keep_current = joined.filter(
        t_present & (~u_present | ~changed)
    ).select(*[F.col(f"t.{c}") for c in cols], "t.valid_from", "t.valid_to", "t.is_current")
    # closed-out versions of changed rows
    closed = joined.filter(t_present & u_present & changed).select(
        *[F.col(f"t.{c}") for c in cols],
        F.col("t.valid_from"),
        F.lit(version).cast("long").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # new current rows: changed keys (from the batch side) + brand-new keys
    opened = joined.filter(u_present & (~t_present | changed)).select(
        *[F.col(f"u.{c}") for c in cols],
        F.lit(version).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    n_closed = closed.count()
    n_opened = opened.count()
    merged = history.unionByName(keep_current).unionByName(closed).unionByName(opened)

    tmp = store_dir.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_into(tmp, store_dir)
    return {
        "closed": n_closed,
        "opened": n_opened,
        "inserted_new_keys": n_opened - n_closed,
        "after": spark.read.parquet(store_dir).count(),
    }


def refresh_daily_rollup(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    batch: DataFrame,
) -> dict[str, int]:
    """Incremental continuous-aggregate maintenance (the hypertable
    rollup pattern): given a newly-landed ``batch`` of events, recompute
    the per-(day, event_type) rollup ONLY for the days the batch
    touches, and upsert those rows into the rollup store.  Every other
    day's rollup rows are untouched -- the refresh cost tracks the
    batch's day span, not the stream's history, which is what makes a
    continuously-maintained aggregate affordable over years of 100 TB
    history.

    Correctness contract (tested): after any sequence of appends +
    refreshes, the rollup store equals the full recompute over the whole
    events store.  Days are recomputed from the FULL events store (not
    the batch alone) so late rows landing on an existing day replace
    that day's rollup rather than double-counting it."""
    days = [r["d"] for r in batch.select(F.to_date("ts").alias("d")).distinct().collect()]
    if not days:
        return {"days_refreshed": 0}
    events = spark.read.parquet(events_dir)
    fresh = (
        events.filter(F.to_date("ts").isin(days))
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    if not os.path.exists(rollup_dir):
        tmp = rollup_dir.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
        fresh.write.mode("overwrite").parquet(tmp)
        _swap_into(tmp, rollup_dir)
        return {"days_refreshed": len(days)}
    merge_upsert(
        spark, rollup_dir, fresh, keys=["day", "event_type"]
    )
    return {"days_refreshed": len(days)}


def table_file_stats(store_dir: str) -> dict[str, int]:
    """(n_files, total_bytes) of the parquet data files under a store."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(store_dir):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return {"n_files": n, "total_bytes": total}


def compact(
    spark: SparkSession,
    store_dir: str,
    partition_by: list[str] | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> dict[str, int]:
    """Rewrite a store into ceil(total_bytes / target) files (>= 1 per
    partition when partitioned).  Pure layout change: content-identical,
    asserted by the caller's tests via row counts + value hashes.

    Scale note: repartition(n) is a full shuffle of the store -- the
    point is you pay it ONCE to stop paying per-query small-file open
    costs; on a cluster run it per-partition so each compaction job is
    bounded."""
    stats = table_file_stats(store_dir)
    n_target = max(1, -(-stats["total_bytes"] // target_file_bytes))
    df = spark.read.parquet(store_dir)

    tmp = store_dir.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    if partition_by:
        # hash-repartition ON the partition columns: round-robin would
        # scatter every partition value across all n_target tasks and
        # emit up to n_target files PER value -- the small-file problem
        # this tool exists to fix
        shaped = df.repartition(n_target, *[F.col(c) for c in partition_by])
        writer = shaped.write.mode("overwrite").partitionBy(*partition_by)
    else:
        writer = df.repartition(n_target).write.mode("overwrite")
    writer.parquet(tmp)
    _swap_into(tmp, store_dir)

    after = table_file_stats(store_dir)
    return {
        "files_before": stats["n_files"],
        "files_after": after["n_files"],
        "bytes": after["total_bytes"],
    }


def store_summary(spark: SparkSession, store_dir: str) -> DataFrame:
    """Control-totals view of a store: row count + per-column null counts
    (the A8 completeness scan as a maintenance primitive)."""
    df = spark.read.parquet(store_dir)
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        for c in df.columns
    ]
    return df.agg(*aggs)
