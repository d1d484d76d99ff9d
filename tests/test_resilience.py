"""Corrupt-input resilience: a damaged file in a store directory must be
loud by default and skippable by explicit choice -- never silent."""

from __future__ import annotations

import pytest


def _store_with_corruption(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "t"))
    # a truncated/garbage part file lands in the directory
    (tmp_path / "t" / "part-99999-garbage.snappy.parquet").write_bytes(
        b"PAR1 this is not a parquet file"
    )
    return str(tmp_path / "t")


def test_corrupt_file_is_loud_by_default(spark, tmp_path):
    path = _store_with_corruption(spark, tmp_path)
    with pytest.raises(Exception):
        spark.read.schema("id long, name string").parquet(path).collect()


def test_corrupt_file_skippable_by_explicit_option(spark, tmp_path):
    path = _store_with_corruption(spark, tmp_path)
    rows = (
        spark.read.schema("id long, name string")
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
        .collect()
    )
    assert sorted((r["id"], r["name"]) for r in rows) == [(1, "a"), (2, "b")]
