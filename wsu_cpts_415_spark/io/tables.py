"""Fixture-table source: explicit-schema parquet reads.

Replaces the reference's schema-inferred Mongo source (S8,
reference analyze_links.py:111-116) with parquet + declared StructType.
Applying the schema at read time (rather than casting after) keeps column
pruning and filter pushdown at the scan: ``.explain`` shows ``ReadSchema``
with only the projected columns and ``PushedFilters`` for predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.schemas import EVENTS_RAW, FIXTURE_SCHEMAS

TABLE_NAMES = tuple(FIXTURE_SCHEMAS)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _events_ts_is_nanos(path: str) -> bool:
    """True when the events parquet stores ``ts`` as TIMESTAMP(NANOS).

    Reads only the footer of one part file (driver-side, metadata-only).
    Defaults to False (let Spark's native reader handle it) when the
    footer can't be inspected.
    """
    try:
        import pyarrow.parquet as pq

        part = path
        if os.path.isdir(path):
            parts = sorted(
                p for p in os.listdir(path) if p.endswith(".parquet")
            )
            if not parts:
                return False
            part = os.path.join(path, parts[0])
        pf = pq.ParquetFile(part)
        phys = pf.schema
        for i in range(len(phys)):
            col = phys.column(i)
            if col.name == "ts":
                # INT96 (legacy Spark writer) surfaces as timestamp[ns]
                # in the arrow view but IS natively Spark-readable --
                # only an annotated INT64 nanos column needs the manual
                # decode path
                if col.physical_type != "INT64":
                    return False
                break
        field = pf.schema_arrow.field("ts")
        return getattr(field.type, "unit", None) == "ns"
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its canonical schema."""
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_is_nanos(path):
        # ts is parquet TIMESTAMP(NANOS) which Spark cannot read natively
        # (PARQUET_TYPE_ILLEGAL): read the physical int64 and floor-convert
        # ns -> us with integer division (exact; double division would lose
        # precision on ~1.7e18 ns epochs).  Fixture generators have shipped
        # both NANOS and MICROS across rounds, so the unit is sniffed from
        # footer metadata (one driver-side read) instead of assumed.
        raw = spark.read.schema(EVENTS_RAW).parquet(path)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Parquet is self-describing; passing the canonical schema pins the
    # engine-facing types (e.g. int32 -> IntegerType, timestamp[ms] ->
    # TimestampType) instead of trusting whatever the writer produced.
    return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
