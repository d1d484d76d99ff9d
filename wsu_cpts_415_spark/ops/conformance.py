"""Oracle-differential conformance checker, shipped with the engine.

Mirrors the driver contract (__spark_entry__.py): run a registered
query's Spark side and its DuckDB oracle SQL over the same parquet
tables, then compare column names + row count + order-insensitive
normalized values.  The same code backs the test suite
(tests/oracle_util.py re-exports from here) and the CLI:

    python -m wsu_cpts_415_spark conformance [--sf-dir DIR] [names...]

Normalization follows the driver: a raw pandas sort over every column
first (the step that crashes on array/struct cells -- so any
non-atomic output column fails HERE before the driver sees it), floats
rounded to 6 decimals with -0.0 collapsed, timestamps unified across
the engines' date/datetime representations.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from wsu_cpts_415_spark.io.tables import TABLE_NAMES

FLOAT_DECIMALS = 6


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        r = round(v, FLOAT_DECIMALS)
        if r == 0:
            r = 0.0  # collapse -0.0
        return f"{r:.{FLOAT_DECIMALS}f}"
    if isinstance(v, (datetime, pd.Timestamp)):
        # unify date-grained values: DuckDB DATE comes back from fetchdf as
        # a midnight Timestamp while Spark yields datetime.date
        ts = pd.Timestamp(v)
        return ts.date().isoformat() if ts == ts.normalize() else ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, np.floating):
        return _norm_cell(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def driver_canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's stricter canonicalization step: a raw pandas
    ``sort_values`` over every column, BEFORE any stringification --
    exactly what crashes on list/struct cells, surfacing non-atomic
    output columns locally."""
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def normalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    pdf = driver_canonicalize(pdf)
    cols = list(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return cols, sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).fetchdf()
    s_cols, s_rows = normalize(spark_pdf)
    d_cols, d_rows = normalize(duck_pdf)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"


def run_conformance(
    spark, sf_dir: str, names: list[str] | None = None
) -> dict[str, str]:
    """Run the oracle diff for ``names`` (default: every registered query
    with an oracle).  Returns name -> 'PASS' | 'rows-only:N' | error."""
    from wsu_cpts_415_spark.registry import all_queries

    qs = all_queries()
    targets = names or sorted(qs)
    con = duck_connect(sf_dir)
    results: dict[str, str] = {}
    for name in targets:
        q = qs[name]
        try:
            if q.oracle is None:
                results[name] = f"rows-only:{q.fn(spark, sf_dir).count()}"
            else:
                compare(q.fn(spark, sf_dir), con, q.oracle)
                results[name] = "PASS"
        except Exception as exc:  # keep auditing the rest
            results[name] = f"FAIL: {str(exc)[:160]}"
    return results
