"""Schema-evolution-tolerant table reads.

A long-lived table directory accumulates files written under several
schema versions: early files lack later columns, later files add them.
The reference sidesteps this entirely (Mongo is schemaless; every read
re-infers), which silently propagates drift.  This engine makes
evolution explicit: the DECLARED schema is the contract, and
``read_evolved`` aligns every file generation to it --

  * columns missing from old files surface as typed NULLs (or a caller
    default), via ``mergeSchema`` so the union of file schemas is read;
  * columns present in files but absent from the declared schema are
    DROPPED (forward-compat: readers ignore what they don't know);
  * declared-type casts apply per column (same per-column repair
    contract as tables.py, which handles footer-level physical drift
    for single-generation reads).

Scale notes: ``mergeSchema`` costs one footer read per file at planning
time (driver-side metadata, no data scan) -- acceptable for daily
partitioned layouts; at very high file counts the production pattern is
a catalog-held schema instead of footer merging, which this function
models by accepting the declared schema from outside.  Column pruning
still reaches the scan: the final select is a plain projection over the
merged relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_evolved(
    spark: SparkSession,
    path: str,
    declared: T.StructType,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Read a multi-generation parquet directory aligned to ``declared``.

    ``defaults`` optionally maps column name -> literal used where a
    whole file generation lacks the column (instead of NULL)."""
    defaults = defaults or {}
    df = spark.read.option("mergeSchema", "true").parquet(path)
    have = {f.name for f in df.schema.fields}
    cols: list[Column] = []
    for field in declared.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif field.name in defaults:
            cols.append(
                F.lit(defaults[field.name]).cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(
                F.lit(None).cast(field.dataType).alias(field.name)
            )
    return df.select(cols)


def evolution_report(
    spark: SparkSession, path: str, declared: T.StructType
) -> DataFrame:
    """Per-column evolution audit of a table directory vs its declared
    schema: which declared columns are missing from (some) stored files,
    and which stored columns the declared schema ignores.  One row per
    column with its status -- the pre-flight check before a backfill."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    stored = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    decl = {f.name: f.dataType.simpleString() for f in declared.fields}
    rows = []
    for name, dtype in decl.items():
        if name not in stored:
            status = "missing_in_files"
        elif stored[name] != dtype:
            status = "type_drift"
        else:
            status = "ok"
        rows.append((name, dtype, stored.get(name), status))
    for name, dtype in stored.items():
        if name not in decl:
            rows.append((name, None, dtype, "undeclared_extra"))
    return spark.createDataFrame(
        rows, "column string, declared_type string, stored_type string, status string"
    )
