"""SQL surface: the engine's tables are queryable as plain Spark SQL via
``io.tables.register_views`` -- the same text a DuckDB user would write
runs on Spark (modulo dialect).  One representative query keeps that
surface oracle-pinned: identical SQL text (minus CAST dialect) feeds both
engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wsu_cpts_415_spark.io.tables import register_views
from wsu_cpts_415_spark.registry import register

_SQL = """
    SELECT s.s_name,
           n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'N'
    GROUP BY s.s_name, n.n_name
    ORDER BY revenue DESC, s.s_name
"""


@register("sql_top_suppliers", oracle=_SQL)
def sql_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue rollup executed through ``spark.sql`` over
    registered views -- LITERALLY the same SQL string as the DuckDB
    oracle.  Catalyst still broadcasts the dims and pushes the returnflag
    filter into the parquet scan (same physical plan as the DataFrame
    formulation)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL)


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_custkey < 50
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@register("sql_lateral_topn", oracle=_LATERAL_SQL)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery -- top-2 orders per customer -- as one
    SQL text accepted verbatim by both Spark and DuckDB.  Catalyst
    rewrites the lateral per-row LIMIT into a window rank-filter
    (DecorrelateInnerQuery), so the physical plan is a join + ranked
    window, never a per-customer re-scan of orders."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_RECURSIVE_SQL = """
    WITH RECURSIVE bounds AS (
        SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
               CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
        FROM events
    ),
    days(d, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT d + 1, hi FROM days WHERE d < hi
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    )
    SELECT days.d AS day, COALESCE(daily.n, 0) AS n_events
    FROM days LEFT JOIN daily ON daily.d = days.d
    ORDER BY day
"""


@register("sql_recursive_calendar_fill", oracle=_RECURSIVE_SQL)
def sql_recursive_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE calendar fill: generate every day between the
    stream's min and max timestamps and left-join the daily counts, so
    zero-activity days appear as explicit rows -- the gap-exposing
    densification every time-series report needs before trend math.
    LITERALLY the same WITH RECURSIVE text runs on Spark (4.x recursive
    CTE support) and DuckDB.

    Scale: the recursion generates |days| rows (bounded by the calendar,
    not the data); the upper bound rides INSIDE the recursion row so no
    step ever re-touches the events table (a `FROM days, bounds` step
    re-evaluates the min/max aggregate every iteration -- measured 5.7 s
    vs 0.8 s at sf0.1); the daily aggregate is the usual
    map-side-combined rollup and the join is broadcast-sized.  Recursion
    depth = days of history, well inside default iteration limits."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_FILTERED_AGG_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
               AS finished_price,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register("sql_filtered_aggregates", oracle=_FILTERED_AGG_SQL)
def sql_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregates -- conditional counts and sums
    without CASE scaffolding -- as one SQL text accepted verbatim by
    both engines.  Catalyst compiles each FILTER into the same
    conditional partial aggregate a sum-of-if produces: one scan, one
    exchange, map-side combine intact."""
    register_views(spark, sf_dir)
    return spark.sql(_FILTERED_AGG_SQL)
