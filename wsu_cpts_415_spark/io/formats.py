"""Multi-format table source/sink: parquet, ORC, CSV, JSON-lines, XML.

The reference ingests TSV and (conceptually) serves from a document
store (SURVEY.md §1.5); an engine its users can switch to needs the
standard interchange formats as first-class, *lossless* sources and
sinks.  The contract here is round-trip fidelity: ``write_store`` then
``read_store`` reproduces the DataFrame bit-for-bit for every fixture
schema (tested over lineitem's timestamps/doubles/strings in
tests/test_ingest.py).

Text formats are lossy by default (CSV has no types, JSON has no
timestamp grain); fidelity comes from pinning the options BOTH ways:

  * explicit schema on read (never inferSchema -- one pass, stable
    types, pushdown-capable);
  * microsecond timestamp format pinned on both write and read (default
    CSV/JSON writers truncate to seconds or emit engine-local zones);
  * FAILFAST read mode, so a malformed row is an error, not a silent
    null row (the reject-capture path for dirty input is
    io/ingest.py's try_cast split -- by the time data is a *store*,
    malformed means corruption and must be loud).

Scale: all four formats are splittable here (JSON-lines and CSV without
embedded newlines split by line; ORC/parquet by stripe/row-group), so a
read parallelizes across executors regardless of format.  Columnar
formats additionally get column pruning + predicate pushdown; the text
formats always pay a full scan -- the tests assert that difference is a
conscious choice (interchange, not serving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json", "xml")

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _text_options(fmt: str) -> dict[str, str]:
    opts = {"timestampFormat": _TS_FMT}
    if fmt == "csv":
        opts.update({"header": "true", "nullValue": "\\N"})
    if fmt == "xml":
        # Spark 4 native XML source: one row element per record
        opts.update({"rowTag": "row"})
    return opts


def write_store(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` as a self-contained store directory in ``fmt``."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt in ("csv", "json", "xml"):
        for k, v in _text_options(fmt).items():
            writer = writer.option(k, v)
    writer.save(path)


def read_store(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a store written by ``write_store``.  Text formats REQUIRE the
    schema (typed decode, no inference pass); columnar formats use it to
    pin engine-facing types when given."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if fmt in ("csv", "json", "xml") and schema is None:
        raise ValueError(f"{fmt} read requires an explicit schema")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("csv", "json", "xml"):
        for k, v in _text_options(fmt).items():
            reader = reader.option(k, v)
        if fmt != "xml":  # the XML reader has no FAILFAST mode option
            reader = reader.option("mode", "FAILFAST")
    return reader.load(path)
