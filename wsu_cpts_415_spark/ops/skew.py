"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized partitions, but it only helps sort-merge joins and
only after a shuffle has materialized the skew.  Explicit salting is the
planned-ahead form: replicate the small side R times and scatter the big
side's hot keys across R sub-keys, so no single task ever owns a hot key's
full row set.  Use when one side has pathological hot keys (the viral
video of the reference's link graph; a null-heavy foreign key) and the
join is the pipeline's dominant stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with ``n_salts``-way salting.

    big rows get a deterministic salt in [0, n_salts) hashed from the full
    row (spreads each hot key uniformly); small rows are replicated once
    per salt value (an explode of a literal range -- size * n_salts rows,
    so keep ``small`` genuinely small or n_salts modest).  Result equals
    the plain join exactly (tests/test_scale_ops.py asserts equivalence)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # replicating the small side would duplicate its unmatched rows
        # under right/full semantics
        raise ValueError(f"salted_join supports big-side-preserving joins, not {how!r}")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def hot_keys(df: DataFrame, key: str, threshold_rows: int) -> DataFrame:
    """Diagnostic: keys whose row count exceeds ``threshold_rows`` --
    the candidates that justify salting or AQE skew tuning."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > threshold_rows)
        .orderBy(F.col("n_rows").desc())
    )


def salt_column(n_salts: int, *cols: str) -> Column:
    """Reusable deterministic salt expression over ``cols``."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")
