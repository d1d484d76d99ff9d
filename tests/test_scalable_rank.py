"""The range-partitioned global-rank kernel (ops/scalable_rank.py) and
the three user-grain queries routed through it.

Contract: routing must be invisible -- the scalable formulation and the
plain single-partition window produce bit-identical rows (same bar
join_skew_salted sets for salting), and the scalable plans carry no
unpartitioned window over the user-grain table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.ops.scalable_rank import (
    global_row_number_scalable,
    ntile_from_rn,
    rank_bounds,
)
from wsu_cpts_415_spark.queries.cohorts import (
    gini_user_value,
    rfm_segmentation,
    value_concentration_curve,
)


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("n, k", [(1, 5), (4, 5), (5, 5), (11, 5), (100, 7)])
def test_ntile_formula_matches_window(spark, n, k):
    """Closed-form NTILE == window NTILE for remainder/short/exact splits,
    including ties in the sort value."""
    rows = [(i, (i * 7919) % 13) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "v"])
    w = Window.orderBy("v", "id")
    exact = df.select("id", F.ntile(k).over(w).alias("t"))
    via_rn = df.select(
        "id", ntile_from_rn(F.row_number().over(w), n, k).alias("t")
    )
    assert sorted(exact.collect()) == sorted(via_rn.collect())


@pytest.mark.parametrize("descending", [False, True])
def test_global_row_number_matches_window(spark, descending):
    """Bucketed rank + offset == the single-partition row_number for both
    sort directions, with duplicate sort values crossing bucket
    boundaries in value space."""
    rows = [(i, float((i * 31) % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)
    stats = rank_bounds(df, ["v"], npart=16)
    got = global_row_number_scalable(
        df, "v", [F.asc("id")], stats["bounds"]["v"],
        descending=descending, out_col="rn",
    )
    order = [F.desc("v") if descending else F.asc("v"), F.asc("id")]
    want = df.select("id", "v", F.row_number().over(Window.orderBy(*order)).alias("rn"))
    assert sorted(got.select("id", "v", "rn").collect()) == sorted(want.collect())


def test_global_row_number_bigint_beyond_2_53(spark):
    """Boundary literals are cast to the sort column's own Spark type, so
    bigint sort keys beyond 2**53 (where a Python float round-trip
    collapses adjacent values) keep exact boundary comparisons."""
    base = 2**60
    rows = [(i, base + ((i * 31) % 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    stats = rank_bounds(df, ["v"], npart=8)
    got = global_row_number_scalable(
        df, "v", [F.asc("id")], stats["bounds"]["v"], out_col="rn"
    )
    want = df.select(
        "id", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id"))).alias("rn")
    )
    assert sorted(got.select("id", "rn").collect()) == sorted(want.collect())


@pytest.mark.parametrize(
    "fn", [rfm_segmentation, value_concentration_curve, gini_user_value]
)
def test_routing_is_invisible(spark, fn):
    """Forcing the scalable path (bound=0) and the exact-window path
    (bound=inf) yields identical rows for every routed query."""
    scalable = fn(spark, SF_SMOKE, scalable_rows=0).collect()
    exact = fn(spark, SF_SMOKE, scalable_rows=10**9).collect()
    assert sorted(map(tuple, scalable)) == sorted(map(tuple, exact))
    assert len(scalable) > 0


def test_scalable_plans_have_no_unpartitioned_window(spark):
    """On the >bound path, every window in the rfm/gini plans partitions
    by the range bucket; the concentration curve additionally keeps its
    10-row cumulative window over the decile aggregate (bounded)."""
    for fn, allowed in [
        (rfm_segmentation, ("_pid",)),
        (gini_user_value, ("_pid",)),
        (value_concentration_curve, ("_pid", "decile")),
    ]:
        plan = fmt_plan(fn(spark, SF_SMOKE, scalable_rows=0))
        specs = [
            ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
        ]
        assert specs, f"{fn.__name__}: expected window nodes in plan"
        for ln in specs:
            assert any(a in ln for a in allowed), (
                f"{fn.__name__}: unpartitioned window spec: {ln.strip()}"
            )


def test_tiefree_rank_occupies_exact_rank_ranges(spark):
    """Salted tie-free rank: every value group occupies exactly its
    consecutive global rank range (start+1 .. start+group_size), ranks
    are a permutation of 1..n, and no window in the plan is
    unpartitioned."""
    from wsu_cpts_415_spark.ops.scalable_rank import tiefree_global_row_number

    rows = [(f"tok{i}", (i % 7) + 1) for i in range(700)]  # heavy ties
    df = spark.createDataFrame(rows, ["tok", "f"]).repartition(8)
    got = tiefree_global_row_number(
        df, "f", "tok", descending=True, out_col="r", nbuckets=16
    ).collect()
    n = len(rows)
    assert sorted(r["r"] for r in got) == list(range(1, n + 1))
    by_f = {}
    for r in got:
        by_f.setdefault(r["f"], []).append(r["r"])
    start = 0
    for f in sorted(by_f, reverse=True):
        ranks = sorted(by_f[f])
        assert ranks == list(range(start + 1, start + len(ranks) + 1)), f
        start += len(ranks)
    plan = fmt_plan(
        tiefree_global_row_number(df, "f", "tok", descending=True, out_col="r")
    )
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln:
            assert "_pid" in ln, f"unpartitioned window: {ln.strip()}"


def test_zipf_routing_is_invisible(spark):
    from wsu_cpts_415_spark.queries.text import zipf_slope

    scalable = zipf_slope(spark, SF_SMOKE, scalable_rows=0).collect()
    exact = zipf_slope(spark, SF_SMOKE, scalable_rows=10**9).collect()
    assert [tuple(r) for r in scalable] == [tuple(r) for r in exact]


def test_scalable_rank_null_values_match_window_order(spark):
    """NULL sort values must rank exactly where the plain window puts
    them on both directions (asc = NULLS FIRST, desc = NULLS LAST), and
    the tie-free kernel must keep (not drop) null-valued rows."""
    from wsu_cpts_415_spark.ops.scalable_rank import tiefree_global_row_number

    rows = [(i, float(i % 5) if i % 7 else None) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)
    stats = rank_bounds(df, ["v"], npart=8)
    for descending in (False, True):
        got = global_row_number_scalable(
            df, "v", [F.asc("id")], stats["bounds"]["v"],
            descending=descending, out_col="rn",
        )
        order = [F.desc("v") if descending else F.asc("v"), F.asc("id")]
        want = df.select(
            "id", "v", F.row_number().over(Window.orderBy(*order)).alias("rn")
        )
        assert sorted(got.select("id", "v", "rn").collect()) == sorted(
            want.collect()
        ), f"descending={descending}"
    # tie-free: all rows kept, ranks a permutation, null group placed
    # first (asc) with its exact consecutive range
    tf = tiefree_global_row_number(df, "v", "id", out_col="rn").collect()
    assert len(tf) == len(rows)
    assert sorted(r["rn"] for r in tf) == list(range(1, len(rows) + 1))
    null_ranks = sorted(r["rn"] for r in tf if r["v"] is None)
    assert null_ranks == list(range(1, len(null_ranks) + 1))


def test_range_partitioned_row_number_matches_plain_window(spark):
    """The high-cardinality kernel (strings allowed, no numeric-bounds
    precomputation) must reproduce the plain ORDER BY row_number on a
    unique string key, and keep exact rank arithmetic when rows spread
    over many ranges."""
    from wsu_cpts_415_spark.ops.scalable_rank import (
        range_partitioned_row_number,
    )

    import random

    rng = random.Random(415)
    rows = [
        (i, f"{rng.choice('abcdef')}{rng.randrange(1000):04d}-{i:06d}")
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    got = range_partitioned_row_number(df, "k", npart=16, out_col="rn")
    want = df.select(
        "id", F.row_number().over(Window.orderBy("k")).alias("rn")
    )
    assert {(r.id, r.rn) for r in got.select("id", "rn").collect()} == {
        (r.id, r.rn) for r in want.collect()
    }
    # ranks must be an exact permutation even with npart >> rows
    tiny = spark.createDataFrame(rows[:5], "id long, k string")
    out = range_partitioned_row_number(tiny, "k", npart=16, out_col="rn")
    assert sorted(r.rn for r in out.collect()) == [1, 2, 3, 4, 5]


def test_range_partitioned_row_number_beyond_sampler_reach(spark):
    """Regression for the branch-desync bug: ``parts`` feeds both the
    offset subtree and the windowed join, and before the localCheckpoint
    pin each branch re-executed ``repartitionByRange`` with an
    independently sampled RangePartitioner -- offsets from one boundary
    set were added to local row_numbers from another.  At 500 rows the
    sampler sees every row and both samples agree, hiding the bug; at
    200k rows / npart=32 it corrupted 97% of ranks.  This test pins the
    fix at exactly that scale: every rank must equal the row's position
    in the total key order."""
    from wsu_cpts_415_spark.ops.scalable_rank import (
        range_partitioned_row_number,
    )

    n = 200_000
    # unique key whose lexicographic order is deliberately NOT the
    # insertion order, so a partition-id-based shortcut can't pass
    df = (
        spark.range(n)
        .withColumn(
            "k",
            F.concat(
                F.format_string("%06x", F.xxhash64("id") % 0xFFFFFF),
                F.lit("-"),
                F.format_string("%07d", F.col("id")),
            ),
        )
        .repartition(32)
    )
    got = range_partitioned_row_number(df, "k", npart=32, out_col="rn")
    pairs = got.select("k", "rn").collect()
    assert len(pairs) == n
    by_key = sorted(pairs, key=lambda r: r.k)
    mismatches = sum(1 for i, r in enumerate(by_key, start=1) if r.rn != i)
    assert mismatches == 0, f"{mismatches} of {n} ranks wrong"
