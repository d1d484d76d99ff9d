"""Set-operation queries (SURVEY.md §2.8: none in the reference; free in
Spark, exposed by the engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register


def _urgent_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


def _building_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT custkey FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT c_custkey AS custkey FROM customer
        WHERE c_mktsegment = 'BUILDING'
    )
    ORDER BY custkey
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): customers urgent-ordering OR in BUILDING."""
    a = _urgent_custkeys(spark, sf_dir)
    b = _building_custkeys(spark, sf_dir)
    return a.union(b).distinct().orderBy("custkey")


@register(
    "set_intersect",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT c_custkey AS custkey FROM customer
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: urgent-ordering customers in the BUILDING segment.
    Catalyst rewrites to a left-semi join -- same plan we'd write by hand."""
    a = _urgent_custkeys(spark, sf_dir)
    b = _building_custkeys(spark, sf_dir)
    return a.intersect(b).orderBy("custkey")


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT DISTINCT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    ORDER BY custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: BUILDING customers who never placed an urgent order
    (anti-join under the hood)."""
    a = _building_custkeys(spark, sf_dir)
    b = _urgent_custkeys(spark, sf_dir)
    return a.exceptAll(b.distinct()).distinct().orderBy("custkey")


@register(
    "union_all_counts",
    oracle="""
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
    )
    GROUP BY kind
    ORDER BY kind
    """,
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of heterogeneous sources aligned by name (unionByName) --
    the engine's multi-file-ingest shape (S1 is implicitly this)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    a = customer.select(F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nationkey"))
    b = supplier.select(F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).groupBy("kind").agg(F.count("*").alias("n")).orderBy("kind")


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag semantics -- a custkey appearing m times on the
    left and n times on the right survives min(m, n) times.  Spark plans
    it as a count-compare aggregate (no distinct collapse), one shuffle
    per side."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b).orderBy("custkey")


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference -- max(m - n, 0) copies survive, so
    multiplicity carries information (how many more urgent orders than
    finished ones a customer has) that EXCEPT's distinct form discards."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b).orderBy("custkey")
