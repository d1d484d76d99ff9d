"""Fixture-table source: explicit-schema parquet reads with drift repair.

Replaces the reference's schema-inferred Mongo source (S8,
reference analyze_links.py:111-116) with parquet + declared StructType.
Applying the schema at read time (rather than casting after) keeps column
pruning and filter pushdown at the scan: ``.explain`` shows ``ReadSchema``
with only the projected columns and ``PushedFilters`` for predicates.

Physical-type drift: the fixture generator has shipped the same logical
column as parquet TIMESTAMP(NANOS), TIMESTAMP(MICROS) and DATE across
rounds.  Rather than assume one shape, ``load_table`` reads the parquet
footer (driver-side, metadata only, one part file) and reconciles the
file's physical types against the canonical schema:

* columns whose declared type Spark can scan directly keep the declared
  type (pushdown intact — the common case, zero overhead);
* TIMESTAMP(NANOS) (which Spark's reader rejects with
  PARQUET_TYPE_ILLEGAL) is read as the raw int64 and floor-converted
  ns -> us with integer division (exact; double division would lose
  precision on ~1.7e18 ns epochs);
* other representable drifts (DATE file vs TIMESTAMP schema, timestamp
  file vs DATE schema, narrower/wider ints, float vs double) are read at
  the file's native type and cast to the canonical type.

The repair is per-column: an undrifted column scans exactly as before.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wsu_cpts_415_spark.schemas import FIXTURE_SCHEMAS

TABLE_NAMES = tuple(FIXTURE_SCHEMAS)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _arrow_schema(path: str):
    """Arrow-level schema of a parquet file/dir, or None when unreadable.

    Metadata-only: reads one part file's footer on the driver.
    """
    try:
        import pyarrow.parquet as pq

        part = path
        if os.path.isdir(path):
            parts = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))
            if not parts:
                return None
            part = os.path.join(path, parts[0])
        pf = pq.ParquetFile(part)
        # INT96 (legacy Spark writer) surfaces as timestamp[ns] in the
        # arrow view but IS natively Spark-readable; report it as None so
        # the reconciler leaves the column alone.
        phys = {phys_col.name: phys_col.physical_type for phys_col in
                (pf.schema.column(i) for i in range(len(pf.schema)))}
        return {"arrow": pf.schema_arrow, "physical": phys}
    except Exception:
        return None


def _events_ts_is_nanos(path: str) -> bool:
    """True when the events parquet stores ``ts`` as TIMESTAMP(NANOS).

    Kept for the streaming source (streaming/jobs.py), which needs to know
    the unit before constructing its readStream schema.
    """
    meta = _arrow_schema(path)
    if meta is None:
        return False
    if meta["physical"].get("ts") != "INT64":
        return False
    try:
        field = meta["arrow"].field("ts")
    except KeyError:
        return False
    return getattr(field.type, "unit", None) == "ns"


def _spark_native_type(arrow_type) -> T.DataType | None:
    """The Spark type that scans an arrow-typed parquet column natively.

    Returns None for shapes this reconciler doesn't model (structs, maps,
    decimals, ...) — those keep the declared type untouched.
    """
    import pyarrow as pa

    if pa.types.is_timestamp(arrow_type):
        # ns handled by the caller (raw-int64 path); us/ms scan natively.
        return T.TimestampType()
    if pa.types.is_date(arrow_type):
        return T.DateType()
    if pa.types.is_int64(arrow_type):
        return T.LongType()
    if pa.types.is_int32(arrow_type) or pa.types.is_int16(arrow_type) or pa.types.is_int8(arrow_type):
        return T.IntegerType()
    if pa.types.is_float64(arrow_type):
        return T.DoubleType()
    if pa.types.is_float32(arrow_type):
        return T.FloatType()
    if pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type):
        return T.StringType()
    if pa.types.is_binary(arrow_type) or pa.types.is_large_binary(arrow_type):
        return T.BinaryType()
    if pa.types.is_boolean(arrow_type):
        return T.BooleanType()
    if pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type):
        inner = _spark_native_type(arrow_type.value_type)
        return T.ArrayType(inner) if inner is not None else None
    return None


def _reconcile(
    declared: T.StructType, meta
) -> tuple[T.StructType, dict[str, Column]]:
    """Per-column read plan: (schema to scan with, post-scan conversions).

    A column appears in the conversions map only when the file's physical
    type cannot be scanned as the declared type; everything else keeps the
    declared type at the scan (pushdown/pruning preserved).
    """
    import pyarrow as pa

    if meta is None:
        return declared, {}
    arrow, physical = meta["arrow"], meta["physical"]
    read_fields: list[T.StructField] = []
    conversions: dict[str, Column] = {}
    for field in declared.fields:
        read_type = field.dataType
        try:
            afield = arrow.field(field.name)
        except KeyError:
            afield = None
        if afield is not None:
            atype = afield.type
            if (
                pa.types.is_timestamp(atype)
                and atype.unit == "ns"
                and physical.get(field.name) == "INT64"
            ):
                # TIMESTAMP(NANOS): Spark rejects the annotation outright
                # (PARQUET_TYPE_ILLEGAL) — read raw int64, floor ns -> us.
                read_type = T.LongType()
                conv = F.expr(f"timestamp_micros(`{field.name}` div 1000)")
                if isinstance(field.dataType, T.DateType):
                    conv = conv.cast(T.DateType())
                conversions[field.name] = conv.alias(field.name)
            else:
                native = _spark_native_type(atype)
                if native is not None and native != field.dataType:
                    read_type = native
                    conversions[field.name] = (
                        F.col(field.name).cast(field.dataType).alias(field.name)
                    )
        read_fields.append(T.StructField(field.name, read_type, field.nullable))
    return T.StructType(read_fields), conversions


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its canonical schema, repairing any
    physical-type drift the current fixture generation shipped."""
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    declared = FIXTURE_SCHEMAS[name]
    read_schema, conversions = _reconcile(declared, _arrow_schema(path))
    df = spark.read.schema(read_schema).parquet(path)
    if conversions:
        df = df.withColumns(conversions)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
