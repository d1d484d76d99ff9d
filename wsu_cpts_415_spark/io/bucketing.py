"""Bucketed table layout: the engine's stand-in for the reference's Mongo
secondary indexes on join keys (SURVEY.md §2.1 S7) and the 100 TB answer
to repeated fact-fact joins.

Writing both sides of a recurring join bucketed (and sorted) by the join
key makes every subsequent join co-located: Spark reads matching buckets
pairwise and performs the join with NO Exchange on either side -- at
cluster scale this converts the dominant shuffle of a fact-fact join into
pure map-side work, amortized once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) table.  Bucket count is a
    layout contract: both sides of a co-located join must agree.  ``path``
    makes it an external table (the warehouse dir is static config)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two equally-bucketed tables on their bucket key -- planned
    shuffle-free (assert via tests/test_scale_ops.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
