"""Fixture-contract sanity checks.

The driver regenerates /root/testdata between rounds and has shipped the
events ``ts`` column as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS).
``load_table`` sniffs the unit from the parquet footer
(io/tables.py:_events_ts_is_nanos); these tests pin the contract: whatever
the physical unit, the engine-facing timestamps must agree with what an
independent reader (DuckDB) sees.  Round-3 regression: a hardcoded
ns->us division corrupted every ts when the fixture switched to MICROS,
silently breaking 7 driver-checked queries.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from tests.conftest import SF_ORACLE
from wsu_cpts_415_spark.io.tables import load_table


def test_events_ts_matches_duckdb(spark):
    """Spark's min/max/count of events.ts must equal DuckDB's (µs exact)."""
    row = (
        load_table(spark, SF_ORACLE, "events")
        .agg(
            F.unix_micros(F.min("ts")).alias("lo"),
            F.unix_micros(F.max("ts")).alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    lo, hi, n = duckdb.sql(
        f"SELECT epoch_us(MIN(ts)), epoch_us(MAX(ts)), COUNT(*) "
        f"FROM '{SF_ORACLE}/events.parquet'"
    ).fetchone()
    assert (row["lo"], row["hi"], row["n"]) == (lo, hi, n)


def test_events_ts_plausible_epoch(spark):
    """Timestamps land in a plausible modern range, not 1970 (unit drift)."""
    row = (
        load_table(spark, SF_ORACLE, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert row["lo"].year >= 2000, f"ts unit drift: min ts {row['lo']}"
    assert row["hi"].year <= 2100, f"ts unit drift: max ts {row['hi']}"


def test_all_tables_readable_and_counts_match(spark):
    """Every fixture table must load under its pinned schema and agree
    with DuckDB on row count -- catches physical-type drift in any
    regenerated fixture before individual queries fail confusingly."""
    from wsu_cpts_415_spark.io.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        n_spark = load_table(spark, SF_ORACLE, name).count()
        n_duck = duckdb.sql(
            f"SELECT COUNT(*) FROM '{SF_ORACLE}/{name}.parquet'"
        ).fetchone()[0]
        assert n_spark == n_duck, f"{name}: spark={n_spark} duck={n_duck}"
