"""Registry-wide driver-transfer gate (the collect() budget): while each
registered query's DataFrame is being BUILT, every ``collect()`` /
``toPandas()`` the query's own code issues is intercepted and its
optimized plan checked for a boundedness witness -- a LIMIT node, or an
aggregation as the outermost substantive operator (scalars, bounds
tables, centroids, model tables).  A query whose driver-side code path
pulls an unbounded frame to the driver fails here before any judge or
driver sees it, with an allowlist-with-reasons escape hatch in the
spirit of tests/test_window_audit.py.

``head()``/``first()``/``take(n)`` are bounded by construction and not
intercepted (Spark routes them through a limited collect).
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.registry import all_queries

# query -> why its non-witnessed collect is still bounded
ALLOWED: dict[str, str] = {}

# plan nodes that bound the rows reaching the driver
_LIMIT_NODES = {"GlobalLimit", "LocalLimit", "CollectLimit"}
# wrappers that neither grow nor unbound their child's output
_TRANSPARENT = {
    "Project",
    "Sort",
    "Filter",
    "SubqueryAlias",
    "RepartitionByExpression",
    "Repartition",
    "Deduplicate",
}


def _is_bounded(df: DataFrame) -> bool:
    node = df._jdf.queryExecution().optimizedPlan()
    # any LIMIT anywhere in the tree bounds the result from that point;
    # walking the root chain is enough because a limit below a join/agg
    # still leaves the root the thing to judge
    while True:
        cls = node.getClass().getSimpleName()
        if cls in _LIMIT_NODES:
            return True
        if cls == "Aggregate":
            return True  # scalar or model-table grain by convention
        if cls in _TRANSPARENT and node.children().size() == 1:
            node = node.children().head()
            continue
        return False


@contextlib.contextmanager
def _intercepted(log: list):
    orig_collect = DataFrame.collect
    orig_topandas = DataFrame.toPandas

    def collect(self, *a, **kw):
        log.append(_is_bounded(self))
        return orig_collect(self, *a, **kw)

    def toPandas(self, *a, **kw):
        log.append(_is_bounded(self))
        return orig_topandas(self, *a, **kw)

    DataFrame.collect = collect
    DataFrame.toPandas = toPandas
    try:
        yield
    finally:
        DataFrame.collect = orig_collect
        DataFrame.toPandas = orig_topandas


def test_no_unbounded_driver_collects(spark):
    offenders = {}
    for name, q in all_queries().items():
        log: list[bool] = []
        try:
            with _intercepted(log):
                q.fn(spark, SF_SMOKE)
        except Exception as exc:
            offenders[name] = f"build failed under interception: {exc}"[:120]
            continue
        unbounded = sum(1 for ok in log if not ok)
        if unbounded and name not in ALLOWED:
            offenders[name] = (
                f"{unbounded}/{len(log)} driver collect(s) without a "
                "limit/aggregate boundedness witness"
            )
    assert not offenders, offenders


def test_collect_allowlist_has_no_stale_entries(spark):
    qs = all_queries()
    stale = [n for n in ALLOWED if n not in qs]
    assert not stale, f"allowlisted but unregistered: {stale}"
