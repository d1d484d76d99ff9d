"""Partition-balance diagnostics: measure how evenly a DataFrame's rows
spread across its partitions.

The skew story has three layers in this engine: `heavy_hitters_skew`
audits KEY skew before a shuffle, `ops/skew.py` salting is the remedy,
and AQE's skew-join split handles the runtime tail.  This module
measures the RESULT: the actual per-partition row distribution of any
DataFrame, so "salting flattens the hot partition" is a measured ratio
(tests/test_partitions.py), not an assumption.

Scale: the histogram is a groupBy over spark_partition_id() -- one
map-side-combined shuffle of |partitions| rows, safe to run on any
intermediate at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_histogram(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows) for every non-empty partition of ``df``."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
        .orderBy("partition_id")
    )


def balance_stats(df: DataFrame) -> dict:
    """Summary of partition balance: partition count, row total, and the
    max/mean ratio (1.0 = perfectly even; >> 1 = a straggler partition
    that will dominate the stage's wall clock)."""
    rows = partition_histogram(df).collect()
    counts = [r["n_rows"] for r in rows]
    if not counts:
        return {"n_partitions": 0, "n_rows": 0, "max_over_mean": 0.0}
    mean = sum(counts) / len(counts)
    return {
        "n_partitions": len(counts),
        "n_rows": sum(counts),
        "max_over_mean": round(max(counts) / mean, 3),
    }
