"""Core relational queries over the fixture star schema.

Each query is the Spark-first expression of an operator family from
SURVEY.md §2 (reference file:line cited per query).  The flagship
``links_top_linked`` transposes the reference's link-analysis join
(analyze_links.py:111-145: explode -> count -> join -> sort) onto
orders/customer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

TOP_K = 20


# --------------------------------------------------------------------------
# Flagship: A1 group-count + J1 inner join + O1/O3 sort/top-k
# (reference analyze_links.py:120-145, transposed onto orders/customer)
# --------------------------------------------------------------------------
@register(
    "flagship_top_customers",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           oc.order_cnt,
           ROUND(oc.total_spent, 2) AS total_spent
    FROM (
        SELECT o_custkey,
               COUNT(*) AS order_cnt,
               SUM(o_totalprice) AS total_spent
        FROM orders
        GROUP BY o_custkey
    ) oc
    JOIN customer c ON c.c_custkey = oc.o_custkey
    ORDER BY oc.order_cnt DESC, c.c_custkey ASC
    LIMIT {TOP_K}
    """,
)
def flagship_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top customers by order count: aggregate the fact side FIRST (so the
    join input is one row per customer), broadcast-join the dimension, then
    TakeOrderedAndProject for the top-k.

    Scale notes: the aggregate shuffles orders once on o_custkey with
    map-side partial aggregation; customer is a dimension -> broadcast, no
    shuffle of the aggregated side; orderBy().limit(k) compiles to
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    global sort.  The reference instead sorts the counts table BEFORE its
    join (analyze_links.py:126-131) -- dead work we drop.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    counts = orders.groupBy("o_custkey").agg(
        F.count("*").alias("order_cnt"),
        F.sum("o_totalprice").alias("total_spent"),
    )
    return (
        counts.join(F.broadcast(customer), counts.o_custkey == customer.c_custkey, "inner")
        .select(
            "c_custkey",
            "c_name",
            "order_cnt",
            F.round("total_spent", 2).alias("total_spent"),
        )
        .orderBy(F.col("order_cnt").desc(), F.col("c_custkey").asc())
        .limit(TOP_K)
    )


@register(
    "sample_systematic",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ROUND(SUM(o_totalprice), 2) AS sampled_total
    FROM orders
    WHERE o_orderkey % 20 = 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample (key mod 20) aggregated per
    priority -- the reproducible subsetting pattern for pipeline
    debugging at scale.  Unlike TABLESAMPLE/df.sample, the predicate is
    engine-independent (same rows in Spark and DuckDB) and pushes to the
    scan; for unbiased estimates on skewed keys switch the predicate to
    a hash of the key, same shape."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") % 20 == 0)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
        )
        .orderBy("o_orderpriority")
    )
