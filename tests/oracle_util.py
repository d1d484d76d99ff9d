"""Local mirror of the driver's oracle-differential check: run a registered
query's Spark side and its DuckDB oracle SQL over the same parquet tables,
then compare row count + column names + order-insensitive values.

Normalization follows the driver contract (columns sorted by name before
hashing; queries themselves must alias/round deterministically).
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
    ``sort_values`` over every column, BEFORE any stringification.
    This is exactly what crashed three round-1 queries (``TypeError:
    unhashable type: 'list'`` from pandas' hash-based sort on list
    cells), so running it here makes any array/struct/map output column
    fail locally before the driver ever sees it."""
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
