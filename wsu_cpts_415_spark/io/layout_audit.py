"""Parquet physical-layout audit: per-column row-group statistics from
the file footers -- sizes, encodings, compression, null counts, and
min/max coverage.

What a scan costs at 100 TB is decided by exactly these facts: row-group
size determines split granularity, dictionary encoding determines
in-memory width, column min/max stats determine whether predicate
pushdown can skip the group at all.  This audit reads ONLY footers
(driver-side metadata, a few KB per file -- never data pages) and
reports the layout as a DataFrame, the observability companion to the
write-side tools (compaction targets, z-order clustering,
``zorder_layout_audit``).

Footer parsing uses pyarrow on the driver: footer counts scale with
files, not bytes, and the compaction utility exists precisely to keep
file counts sane.  On a many-million-file lake the same audit
distributes trivially (mapPartitions over the file list); at fixture
scale the driver loop is the honest cost model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parquet_layout_audit(spark: SparkSession, path: str) -> DataFrame:
    """One row per (file, row-group, column): physical layout facts."""
    import pyarrow.parquet as pq

    files = []
    if os.path.isdir(path):
        for root, _dirs, names in os.walk(path):
            files.extend(
                os.path.join(root, n) for n in sorted(names) if n.endswith(".parquet")
            )
    else:
        files = [path]

    rows = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        rel = os.path.relpath(f, path) if os.path.isdir(path) else os.path.basename(f)
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                stats = c.statistics
                rows.append(
                    (
                        rel,
                        rg,
                        c.path_in_schema,
                        g.num_rows,
                        int(c.total_compressed_size),
                        int(c.total_uncompressed_size),
                        str(c.compression),
                        ",".join(sorted(set(map(str, c.encodings)))),
                        bool(stats is not None and stats.has_min_max),
                        int(stats.null_count)
                        if stats is not None and stats.null_count is not None
                        else -1,
                    )
                )
    return spark.createDataFrame(
        rows,
        "file string, row_group int, column string, n_rows long,"
        " compressed_bytes long, uncompressed_bytes long,"
        " compression string, encodings string,"
        " has_min_max boolean, null_count long",
    )


def layout_summary(audit: DataFrame) -> DataFrame:
    """Roll the per-group audit up to one row per column: total bytes,
    compression ratio, and min/max-stat coverage (the fraction of row
    groups a range predicate could skip on)."""
    from pyspark.sql import functions as F

    return (
        audit.groupBy("column")
        .agg(
            F.countDistinct("file", "row_group").alias("n_row_groups"),
            F.sum("compressed_bytes").alias("compressed_bytes"),
            F.sum("uncompressed_bytes").alias("uncompressed_bytes"),
            F.round(
                F.sum("uncompressed_bytes") / F.sum("compressed_bytes"), 4
            ).alias("compression_ratio"),
            F.round(F.avg(F.col("has_min_max").cast("double")), 4).alias(
                "minmax_coverage"
            ),
        )
        .orderBy("column")
    )
