"""maybe_broadcast's byte gate (ops/staging.py): the row bound alone
under-constrains variable-width tables, and the byte estimate must not
UNDERcount them -- in particular a string-array column must be charged
by aggregate content length, not a flat 8 bytes per element (which
would let a ~3x-underestimated hinted broadcast through the OOM guard
the gate exists to provide)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsu_cpts_415_spark.ops.staging import maybe_broadcast


def _hinted(df_in, df_out) -> bool:
    # maybe_broadcast returns F.broadcast(df) (a new frame) when it
    # decides to hint, and the INPUT object when it falls back
    return df_out is not df_in


def test_small_fixed_width_frame_is_hinted(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.array(F.col("id"), F.col("id") + 1).alias("h64"),
    )
    assert _hinted(df, maybe_broadcast(df, bound=100))


def test_long_array_rows_trip_the_byte_gate(spark):
    # 10 rows x 1000-element long arrays ~ 80 KB content: over a 10 KB
    # byte cap the hint must NOT fire even though rows << bound
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.expr("sequence(0L, 999L)").alias("h64"),
    )
    assert not _hinted(df, maybe_broadcast(df, bound=100, max_bytes=10_000))


def test_string_array_content_is_charged_by_length(spark):
    # 10 rows x 10-element arrays of 100-char strings ~ 10 KB content
    # content per row; a flat 8/element estimate would be ~1 KB total
    # and pass a 5 KB cap -- the content-length estimate must trip it
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.expr("transform(sequence(1, 10), i -> repeat('x', 100))").alias(
            "shingles"
        ),
    )
    assert not _hinted(df, maybe_broadcast(df, bound=100, max_bytes=5_000))
    # and the same shape comfortably under a generous cap still hints
    assert _hinted(df, maybe_broadcast(df, bound=100, max_bytes=10_000_000))
