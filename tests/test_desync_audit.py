"""Registry-wide rank-desync gate (SCALE.md, round-7 lesson #4): any
plan that BRANCHES on a frame whose partition identity comes from a
sampled exchange must materialize that frame first.

The round-7 bug class: ``repartitionByRange`` boundaries come from a
RangePartitioner SAMPLE, so two consumers of the same un-materialized
range-partitioned frame each re-execute the exchange with independently
sampled boundaries -- per-partition derivations (``spark_partition_id``,
per-partition counts/offsets) computed in one branch are then combined
with rows partitioned under DIFFERENT boundaries in the other, silently
corrupting results once the sampler no longer sees every row (97% of
ranks wrong at 200k rows before the fix in
``ops/scalable_rank.py:range_partitioned_row_number``).

This audit encodes the rule as a gate, in the discipline of
tests/test_window_audit.py: walk every registered query's optimized
logical plan and fail if the SAME ``repartitionByRange`` subtree
(a logical ``RepartitionByExpression`` whose partition expressions are
``SortOrder``s -- only explicit ``repartitionByRange`` calls produce
that; ``orderBy`` lowers to a ``Sort`` node) appears more than once,
i.e. feeds two consumers without an intervening
checkpoint/persist/localCheckpoint (materialization replaces the
subtree with one shared ``LogicalRDD``/``InMemoryRelation``, so the
duplicate disappears from the tree).
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.registry import all_queries

# query -> why its duplicated repartitionByRange subtree is safe
# (boundary-insensitive by construction, with the written reason)
ALLOWED: dict[str, str] = {}


def _strip_expr_ids(s: str) -> str:
    """Drop #NNN exprId suffixes so the two pruned copies of one frame
    compare equal (column pruning re-numbers attributes per branch)."""
    import re

    return re.sub(r"#\d+L?", "", s)


def _duplicated_range_repartitions(df) -> list[str]:
    """Identities of repartitionByRange subtrees appearing >1 time in
    the optimized logical plan (each duplicate is a branch that will
    re-sample its own RangePartitioner boundaries at execution).

    The identity key is (sort expressions, partition count, leaf
    relations underneath) rather than the full canonicalized subtree:
    column pruning specializes each branch's projections, so exact
    subtree equality would MISS the desync pattern (verified on the
    synthetic violator below -- the aggregate branch prunes columns the
    join branch keeps)."""
    seen: Counter[tuple] = Counter()

    def leaves(node, acc):
        if node.children().size() == 0:
            acc.append(_strip_expr_ids(node.getClass().getSimpleName()))
        cit = node.children().iterator()
        while cit.hasNext():
            leaves(cit.next(), acc)

    def walk(node):
        if node.getClass().getSimpleName() == "RepartitionByExpression":
            exprs = node.partitionExpressions()
            it = exprs.iterator()
            sort_keys, is_range = [], exprs.size() > 0
            while it.hasNext():
                e = it.next()
                if e.getClass().getSimpleName() != "SortOrder":
                    is_range = False
                    break
                sort_keys.append(_strip_expr_ids(e.toString()))
            if is_range:
                lv: list[str] = []
                leaves(node, lv)
                seen[
                    (
                        tuple(sort_keys),
                        node.optNumPartitions().toString(),
                        tuple(sorted(lv)),
                    )
                ] += 1
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next())
        # subquery expressions can also hold plans; registry queries
        # don't use correlated subqueries over range-repartitioned
        # frames, and optimizedPlan children cover the join/union shape
        # the desync bug lives in

    walk(df._jdf.queryExecution().optimizedPlan())
    return [str(k) for k, v in seen.items() if v > 1]


def test_no_unmaterialized_branching_on_range_repartition(spark):
    offenders = {}
    for name, q in all_queries().items():
        try:
            df = q.fn(spark, SF_SMOKE)
        except Exception as exc:
            offenders[name] = f"build failed: {exc}"[:120]
            continue
        dups = _duplicated_range_repartitions(df)
        if dups and name not in ALLOWED:
            offenders[name] = (
                f"{len(dups)} repartitionByRange subtree(s) consumed by "
                "multiple branches without materialization (rank-desync "
                "hazard, SCALE.md round-7 rule)"
            )
    assert not offenders, offenders


def test_desync_allowlist_has_no_stale_entries(spark):
    qs = all_queries()
    stale = [n for n in ALLOWED if n not in qs]
    assert not stale, f"allowlisted but unregistered: {stale}"


def test_gate_catches_synthetic_violator(spark):
    """The audit must FAIL on exactly the round-7 bug shape: a
    range-partitioned frame branching into a per-partition-count subtree
    and a join consumer with no materialization between."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    parts = df.repartitionByRange(4, F.asc("v")).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    bad = parts.join(F.broadcast(counts), "_pid")
    assert _duplicated_range_repartitions(bad), (
        "gate failed to flag an unmaterialized multi-consumer "
        "repartitionByRange"
    )

    # the fixed form -- materialize before branching -- must pass
    pinned = (
        df.repartitionByRange(4, F.asc("v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts2 = pinned.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    good = pinned.join(F.broadcast(counts2), "_pid")
    assert not _duplicated_range_repartitions(good)


def test_gate_ignores_single_consumer_range_repartition(spark):
    """One consumer = one exchange execution = no desync; the gate must
    not force materialization where there is no branch."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).repartitionByRange(4, F.asc("id"))
    out = df.withColumn("_pid", F.spark_partition_id())
    assert not _duplicated_range_repartitions(out)
