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


_FK_RELS = [
    # (name, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "fk_orphan_audit",
    oracle="\n    UNION ALL\n".join(
        f"""SELECT '{name}' AS relationship,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(COUNT(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT) AS n_orphans
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
      ON c.{ck} = p.{pk}"""
        for name, child, ck, parent, pk in _FK_RELS
    )
    + "\n    ORDER BY relationship",
)
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every foreign-key relationship in
    the star schema, how many child rows point at a missing parent --
    the data-quality gate a warehouse load runs before publishing (the
    engine twin of the reference's reject-channel accounting in
    io/ingest.py, which audits rows that fail to DECODE; this audits
    rows that fail to JOIN).

    Scale: each relationship is one left join against the DISTINCT
    parent-key projection -- dimensions broadcast, and the fact-side
    join never moves more than (child_key) columns; counts are
    map-side combined.  Relationships are independent, so on a cluster
    all seven run concurrently inside one action (the union is of
    1-row aggregates, not data)."""
    results = None
    for name, child, ck, parent, pk in _FK_RELS:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("ck"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("pk"))
            .distinct()
        )
        one = (
            c.join(F.broadcast(p), F.col("ck") == F.col("pk"), "left")
            .agg(
                F.count("*").alias("n_child_rows"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("relationship"), "n_child_rows", "n_orphans"
            )
        )
        results = one if results is None else results.unionByName(one)
    return results.orderBy("relationship")
