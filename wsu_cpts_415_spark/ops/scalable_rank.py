"""Exact global ranks/NTILEs with no single-partition window.

Generalizes the range-partitioned percent_rank formulation proven in
``pipelines/trending.py:_global_percentile_scalable`` (the fix for the
reference's W2 scale hazard, trending_predictor.py:171) into a reusable
kernel so every user-grain "global window" query in the registry can be
row-count-routed onto it:

  * bucket rows by the sort value against boundary LITERALS frozen from
    one ``approx_percentile`` action (never ``repartitionByRange``,
    whose re-sampled boundaries could desynchronize plan passes);
    strict comparison means tied sort values always share a bucket, so
    tie groups never straddle a boundary;
  * rank locally inside each bucket (ordered by the sort value plus the
    caller's total-order tie-breaks);
  * add the count of rows in all preceding buckets, computed INSIDE the
    DAG by a triangular join over the npart-row bucket-count table
    (broadcast, bounded metadata -- no driver action, no global sort).

Boundary quality affects only balance, never correctness: any bucket
assignment that is a monotone function of the sort value yields the
same global row_number.  NTILE is then a closed-form function of the
global row_number and the (action-supplied) total row count, matching
SQL NTILE semantics bit-for-bit: the first ``n % k`` tiles get
``n // k + 1`` rows, the rest ``n // k``.

At 100 TB the per-user slivers these queries window over are billions
of rows; this kernel keeps them hash-partitioned end to end while the
exact single-partition window stays available below the routing bound
(and is proven value-identical by forcing both paths in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Above this row count the registered queries route to the
# range-partitioned formulation; below it they keep the plain window
# (same bound philosophy as pipelines/trending.SCALABLE_PERCENTILE_ROWS).
SCALABLE_RANK_ROWS = 2_000


def rank_bounds(df: DataFrame, cols: list[str], npart: int = 64) -> dict:
    """ONE action returning the routing row count plus ``npart - 1``
    approximate bucket boundaries for each named sort column.  The
    caller persists ``df`` first if it feeds multiple passes."""
    fracs = ", ".join(str(i / npart) for i in range(1, npart))
    aggs = [F.count("*").alias("_n")] + [
        F.expr(f"approx_percentile({c}, array({fracs}), 1000)").alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).first()
    # empty input: approx_percentile yields NULL, not an empty list --
    # coalesce so callers iterate zero boundaries (single bucket) and
    # an empty slice flows through as empty output instead of a
    # TypeError (round-10 empty-corpus sweep catch)
    return {
        "n": row["_n"],
        "bounds": {c: (row[c] if row[c] is not None else []) for c in cols},
        "npart": npart,
    }


def global_row_number_scalable(
    df: DataFrame,
    value_col: str,
    tiebreaks: list[Column],
    bounds: list,
    *,
    descending: bool = False,
    out_col: str = "_rn",
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY value [DESC],
    tiebreaks)`` without an unpartitioned window.

    ``bounds`` are frozen boundary values for ``value_col`` (nulls from
    approx_percentile on constant columns are dropped -- fewer buckets,
    still correct).  The tie-break columns must complete a total order.

    ``value_col`` must be numeric (the ``rank_bounds`` companion uses
    ``approx_percentile``, which only accepts numeric input); boundary
    literals are cast to the column's own Spark type so bigint sort keys
    beyond 2**53 keep exact boundary comparisons and decimal columns
    compare at their declared scale rather than through a Python float
    round-trip.
    """
    vtype = df.schema[value_col].dataType
    v = F.col(value_col)
    bounds_arr = F.array(
        *[F.lit(b).cast(vtype) for b in bounds if b is not None]
    )
    vals = [b for b in bounds if b is not None]
    if descending:
        # bucket 0 holds the top values: count boundaries above.  NULL
        # sort values go to the LAST bucket explicitly -- F.filter drops
        # null-predicate elements, which would otherwise send NULLs to
        # bucket 0 while the plain window (F.desc = NULLS LAST) ranks
        # them last; inside the bucket F.desc again sorts NULLs last.
        pid = F.when(v.isNull(), F.lit(len(vals))).otherwise(
            F.size(F.filter(bounds_arr, lambda b: b > v))
        )
        order = [F.desc(value_col), *tiebreaks]
    else:
        # ascending: NULLs get pid 0 (no boundary compares below NULL)
        # and F.asc sorts NULLS FIRST within the bucket -- both match
        # the plain window's NULLS FIRST default by construction
        pid = F.size(F.filter(bounds_arr, lambda b: b < v))
        order = [F.asc(value_col), *tiebreaks]
    parts = df.withColumn("_pid", pid)
    bcounts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    a, b = bcounts.alias("a"), bcounts.alias("b")
    offsets = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    local_w = Window.partitionBy("_pid").orderBy(*order)
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.row_number().over(local_w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def ntile_from_rn(rn: Column, n: int, k: int) -> Column:
    """SQL ``NTILE(k)`` as a closed-form expression over the global
    row_number ``rn`` given total row count ``n``: tiles 1..(n % k) get
    ``n // k + 1`` rows, the rest get ``n // k`` -- identical to the
    window function on every engine."""
    q, r = divmod(n, k)
    head = r * (q + 1)
    if q == 0:  # fewer rows than tiles: tile == row number
        return rn.cast("int")
    tile = F.when(rn <= head, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - 1 - head) / q) + 1
    )
    return tile.cast("int")


def tiefree_global_row_number(
    df: DataFrame,
    value_col: str,
    salt_col: str,
    *,
    descending: bool = False,
    nbuckets: int = 64,
    out_col: str = "_rn",
) -> DataFrame:
    """Global row_number over ``value_col`` where the TIE ORDER IS FREE:
    the caller guarantees downstream results are invariant to which tied
    row gets which of the tie group's consecutive ranks (true for any
    aggregate over (rank, value) pairs, e.g. the Zipf log-log fit).

    That freedom removes the skew limit of range bucketing: tied rows
    are split across ``nbuckets`` hash buckets of ``salt_col``, so even
    a tie group holding half the table (the Zipf f=1 tail) never lands
    in one partition.  rank = (rows in strictly-earlier value groups)
    + (rows of the same value in lower buckets) + local row_number
    within (value, bucket).  The two offset tables are value-grain and
    (value x bucket)-grain -- tiny next to the data, and the joins ride
    the window's own (value, bucket) partitioning."""
    # NULL sort values must rank like the plain window would place them
    # (asc = NULLS FIRST, desc = NULLS LAST); equi-joins on the raw value
    # would silently DROP null-keyed rows, so the group comparisons and
    # the final join run on null-safe columns with explicit null order.
    parts = df.withColumn(
        "_pid", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(nbuckets))
    )
    gc = parts.groupBy(value_col, "_pid").agg(F.count("*").alias("_cnt"))
    vc = gc.groupBy(value_col).agg(F.sum("_cnt").alias("_vcnt"))
    a, b = vc.alias("a"), vc.alias("b")
    av, bv = F.col(f"a.{value_col}"), F.col(f"b.{value_col}")
    if descending:
        # b strictly before a in DESC order; NULLs are LAST
        before = (bv > av) | (bv.isNotNull() & av.isNull())
    else:
        # b strictly before a in ASC order; NULLs are FIRST
        before = (bv < av) | (bv.isNull() & av.isNotNull())
    starts = (
        a.join(b, before, "left")
        .groupBy(F.col(f"a.{value_col}").alias(value_col))
        .agg(F.coalesce(F.sum("b._vcnt"), F.lit(0)).alias("_start"))
    )
    g1, g2 = gc.alias("g1"), gc.alias("g2")
    poff = (
        g1.join(
            g2,
            F.col(f"g2.{value_col}").eqNullSafe(F.col(f"g1.{value_col}"))
            & (F.col("g2._pid") < F.col("g1._pid")),
            "left",
        )
        .groupBy(
            F.col(f"g1.{value_col}").alias(value_col),
            F.col("g1._pid").alias("_pid"),
        )
        .agg(F.coalesce(F.sum("g2._cnt"), F.lit(0)).alias("_poff"))
    )
    pj, oj, sj = parts.alias("p"), poff.alias("o"), starts.alias("s")
    local_w = Window.partitionBy(value_col, "_pid").orderBy(salt_col)
    return (
        pj.join(
            oj,
            F.col(f"p.{value_col}").eqNullSafe(F.col(f"o.{value_col}"))
            & (F.col("p._pid") == F.col("o._pid")),
        )
        .join(sj, F.col(f"p.{value_col}").eqNullSafe(F.col(f"s.{value_col}")))
        .select("p.*", "o._poff", "s._start")
        .withColumn(
            out_col,
            F.row_number().over(local_w) + F.col("_poff") + F.col("_start"),
        )
        .drop("_pid", "_poff", "_start")
    )


def range_partitioned_row_number(
    df: DataFrame,
    key_col: str,
    *,
    npart: int = 64,
    out_col: str = "_rn",
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY key_col)`` for a
    NON-NULL key of any orderable type (strings included), without an
    unpartitioned window and without the numeric-bounds requirement of
    ``global_row_number_scalable``.

    Spark's own range partitioner samples the key to cut ``npart``
    contiguous ranges; ranks are then (rows in lower ranges, from the
    tiny per-partition count table) + local row_number within the
    range.  The OUTPUT is exact and sampling-independent: whatever
    boundaries the sampler picks, every row's global rank depends only
    on the total key order (ties share a range because range
    partitioning is value-based, and are broken by the in-range sort;
    callers needing determinism under ties should pass a unique key).

    Cost: one range shuffle + one bounded-partition window + a
    ``npart``-row offset join -- O(n log n) work, no quadratic
    distinct-value join (``tiefree_global_row_number`` is built for
    FEW distinct values and degrades to an n^2 value join on unique
    keys; this kernel is its complement for unique/high-cardinality
    keys).

    The ``_pid`` frame is materialized ONCE (``localCheckpoint``)
    before branching: ``parts`` feeds both the offset subtree and the
    final windowed join, and without materialization each branch
    re-executes ``repartitionByRange`` with an independently SAMPLED
    RangePartitioner -- offsets computed under one set of boundaries
    would be added to local row_numbers computed under another,
    silently corrupting ranks once the sampler no longer sees every
    row (verified wrong for 97% of rows at 200k rows / npart=32
    before this pin; 0 mismatches after).  On a cluster the same pin
    would be ``persist() + count()``; localCheckpoint additionally
    truncates lineage so the two consumers share the materialized
    partitions."""
    parts = (
        df.repartitionByRange(npart, F.asc(key_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    local_w = Window.partitionBy("_pid").orderBy(key_col)
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.row_number().over(local_w) + F.col("_off"))
        .drop("_pid", "_off")
    )
