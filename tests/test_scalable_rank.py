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
