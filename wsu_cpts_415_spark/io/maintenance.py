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
    n_updates = updates.count()
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
    writer = df.repartition(n_target).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
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
