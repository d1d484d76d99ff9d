"""Scale-mechanics tests: bucketed co-located joins plan shuffle-free,
salted joins are result-equivalent to plain joins, hot-key diagnostics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.io.bucketing import colocated_join, write_bucketed
from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.ops.skew import hot_keys, salted_join


def _fmt_plan(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, SF_SMOKE, "lineitem")
    od = load_table(spark, SF_SMOKE, "orders")
    write_bucketed(li, "li_b", ["l_orderkey"], n_buckets=4, path=str(wh / "li_b"))
    write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"),
        "od_b",
        ["l_orderkey"],
        4,
        path=str(wh / "od_b"),
    )
    yield "li_b", "od_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the planner exercises the bucketed SMJ path
    # (at real scale neither fact side fits a broadcast anyway)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, ["l_orderkey"])
        plan = _fmt_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan, "scan must use the bucketed layout"
    assert "Exchange" not in plan, "co-located bucketed join must not shuffle"
    # and it still computes the right thing
    li = load_table(spark, SF_SMOKE, "lineitem")
    od = load_table(spark, SF_SMOKE, "orders")
    expected = li.join(
        od.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).count()
    assert joined.count() == expected


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    od = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(od, "l_orderkey").groupBy("l_orderkey").count()
    salted = salted_join(li, od, "l_orderkey", n_salts=4).groupBy("l_orderkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    # orders subset -> some lineitems unmatched
    od = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    plain = li.join(od, "l_orderkey", "left").count()
    salted = salted_join(li, od, "l_orderkey", n_salts=4, how="left").count()
    assert plain == salted


def test_hot_keys_diagnostic(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    hot = hot_keys(li, "l_suppkey", threshold_rows=100)
    rows = hot.collect()
    # 10 suppliers over ~6k lineitems -> every supplier is "hot" at 100
    assert len(rows) == 10
    assert all(r["n_rows"] > 100 for r in rows)


def test_aqe_skew_join_split_fires(spark):
    """The engine's AQE posture is proven, not assumed: with skew
    thresholds scoped to fixture scale, a join against one hot key must
    come out of adaptive execution with SortMergeJoin(skew=true) and an
    'AQEShuffleRead skewed' child -- the runtime half of the skew story
    (ops/skew.py's salting is the planning-time half for aggregations,
    where AQE cannot help)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1))
            .otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.count("*").alias("n"))
        n = j.collect()[0]["n"]
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert n == 455_000  # 450k hot-key matches + 5k spread matches
    assert "skew=true" in plan, "AQE did not split the skewed partition"
    assert "AQEShuffleRead skewed" in plan


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE's other runtime lever, same proven-not-assumed standard: a
    tiny aggregate shuffled across the session's 32 partitions must come
    out of adaptive execution with 'AQEShuffleRead coalesced' -- the
    mechanism that keeps per-partition overhead from dominating when a
    stage's output is far below the advisory size (at 100 TB this is
    what turns a 10k-partition config into right-sized tasks on small
    intermediate stages)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).groupBy((F.col("id") % 50).alias("k")).count()
    # collect() (not .count(), which builds a different plan) so THIS
    # DataFrame's adaptive plan is the one finalized
    assert len(df.collect()) == 50
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan


def test_ngram_jaccard_pairs_wide_doc_ids(spark, tmp_path):
    """The packed-long pair key (a*2^32+b) is only sound for ids < 2^32;
    the build must CHECK the bound and route wide ids through the
    two-column pair key (round-8 catch: the x10 replica probe shifts
    doc ids past 2^32 and the packed multiply overflows under ANSI
    mode).  Same corpus, small vs +2^32-shifted ids: identical pair
    results modulo the shift, no overflow."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from wsu_cpts_415_spark.registry import all_queries

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    shift = 2**32
    small_dir, wide_dir = tmp_path / "small", tmp_path / "wide"
    for d in (small_dir, wide_dir):
        d.mkdir()
    pq.write_table(src, str(small_dir / "documents.parquet"))
    pq.write_table(
        src.set_column(
            src.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(src["doc_id"], shift),
        ),
        str(wide_dir / "documents.parquet"),
    )
    fn = all_queries()["ngram_jaccard_pairs"].fn
    small = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in fn(spark, str(small_dir)).collect()
    }
    wide = {
        (r["doc_a"] - shift, r["doc_b"] - shift, r["jaccard"])
        for r in fn(spark, str(wide_dir)).collect()
    }
    assert small == wide and len(small) > 0
