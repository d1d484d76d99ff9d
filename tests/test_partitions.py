"""Measured partition balance (ops/partitions.py): salting must flatten
the hot partition a skewed key creates, by actual row counts."""

from __future__ import annotations

import pyspark.sql.functions as F

from wsu_cpts_415_spark.ops.partitions import balance_stats, partition_histogram


def _skewed_df(spark, n=20_000, hot_share=0.9):
    """A key column where one value holds ``hot_share`` of all rows."""
    n_hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit(7))
        .otherwise((F.col("id") % 50) + 100)
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )


def test_histogram_accounts_for_every_row(spark):
    df = _skewed_df(spark).repartition(16, "k")
    hist = partition_histogram(df)
    assert hist.agg(F.sum("n_rows")).collect()[0][0] == 20_000


def test_salting_flattens_the_hot_partition(spark):
    """Hash-partitioning on the raw skewed key leaves one partition with
    ~90% of the rows; partitioning on (key, salt) spreads it.  The
    max/mean ratio must drop by at least 3x."""
    df = _skewed_df(spark)
    raw = df.repartition(16, "k")
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64("payload"), F.lit(8))
    ).repartition(16, "k", "salt")
    s_raw = balance_stats(raw)
    s_salted = balance_stats(salted)
    assert s_raw["n_rows"] == s_salted["n_rows"] == 20_000
    assert s_raw["max_over_mean"] > 3 * s_salted["max_over_mean"], (
        s_raw,
        s_salted,
    )
