"""Declarative data-quality expectations: a deequ/Great-Expectations-style
constraint suite evaluated in ONE pass over the table, reported as one
row per check with violation counts and pass/fail.

The reference validates ingest with control totals and a reject channel
(io/ingest.py, SURVEY.md §2.1 S2/S5); this is the generalization a
warehouse runs on every landed table: nullability, domain membership,
range, and uniqueness checks, all folded into a single aggregate so the
table is scanned once no matter how many expectations are registered
(conditional counts compile to codegen'd sum-of-if, uniqueness to one
distinct aggregate over the key).

The deliberately-failing row-count bound shows the report shape on a red
check -- an all-green report tests nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

QTY_MAX = 30.0  # deliberately tighter than the data (real max 50)


@register(
    "expectations_report",
    oracle=f"""
    WITH stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL)
                    AS BIGINT) AS null_orderkey,
               CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                    AS BIGINT) AS qty_out_of_domain,
               CAST(COUNT(*) FILTER (WHERE l_quantity > {QTY_MAX})
                    AS BIGINT) AS qty_above_bound,
               CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                    AS BIGINT) AS discount_out_of_range,
               CAST(COUNT(*) FILTER (
                    WHERE l_returnflag NOT IN ('A', 'N', 'R'))
                    AS BIGINT) AS returnflag_not_in_set,
               CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_partkey,
                                               l_suppkey, l_quantity,
                                               l_extendedprice))
                    AS BIGINT) AS dup_line_grain
        FROM lineitem
    )
    SELECT * FROM (
        SELECT 'orderkey_not_null' AS check_name,
               null_orderkey AS n_violations,
               null_orderkey = 0 AS passed, n_rows FROM stats
        UNION ALL
        SELECT 'quantity_in_1_50', qty_out_of_domain,
               qty_out_of_domain = 0, n_rows FROM stats
        UNION ALL
        SELECT 'quantity_under_{QTY_MAX:.0f}', qty_above_bound,
               qty_above_bound = 0, n_rows FROM stats
        UNION ALL
        SELECT 'discount_in_0_0.1', discount_out_of_range,
               discount_out_of_range = 0, n_rows FROM stats
        UNION ALL
        SELECT 'returnflag_in_ANR', returnflag_not_in_set,
               returnflag_not_in_set = 0, n_rows FROM stats
        UNION ALL
        SELECT 'line_grain_unique', dup_line_grain,
               dup_line_grain = 0, n_rows FROM stats
    )
    ORDER BY check_name
    """,
)
def expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six expectations over lineitem -- nullability, two range bounds
    (one deliberately violated at {QTY_MAX} to exercise the red path),
    domain membership, and grain uniqueness -- evaluated in one scan:
    every conditional count is a codegen'd sum-of-if in the same
    aggregate, and the report explode happens on the one-row result.

    At 100 TB this is the shape that matters: check count is free (one
    more counter per expectation), table passes stay at exactly one."""
    li = load_table(spark, sf_dir, "lineitem")

    def viol(cond):  # violation counter: rows where the expectation FAILS
        return F.sum(cond.cast("long"))

    stats = li.agg(
        F.count("*").alias("n_rows"),
        viol(F.col("l_orderkey").isNull()).alias("null_orderkey"),
        viol(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("qty_out_of_domain"),
        viol(F.col("l_quantity") > QTY_MAX).alias("qty_above_bound"),
        viol(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("discount_out_of_range"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias(
            "returnflag_not_in_set"
        ),
        (
            F.count("*")
            - F.countDistinct(
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
            )
        ).alias("dup_line_grain"),
    )
    checks = [
        ("orderkey_not_null", "null_orderkey"),
        ("quantity_in_1_50", "qty_out_of_domain"),
        (f"quantity_under_{QTY_MAX:.0f}", "qty_above_bound"),
        ("discount_in_0_0.1", "discount_out_of_range"),
        ("returnflag_in_ANR", "returnflag_not_in_set"),
        ("line_grain_unique", "dup_line_grain"),
    ]
    # one row per check via explode of a struct array -- the aggregate
    # subtree exists ONCE in the plan (a union of per-check selects would
    # re-run the scan per branch)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(col).alias("n_violations"),
                (F.col(col) == 0).alias("passed"),
                F.col("n_rows").alias("n_rows"),
            )
            for name, col in checks
        ]
    )
    return (
        stats.select(F.explode(rows).alias("c"))
        .select("c.*")
        .orderBy("check_name")
    )
