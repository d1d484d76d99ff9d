"""Round-9 SSJoin generation-time bounds (queries/ssjoin.py): the
integer-exact length-bucket join key and the packed byte-counter sketch
are both EXACTNESS-critical -- a bucket that separates a valid pair or
a sketch that under-bounds an intersection silently drops true results
-- so each gets its own property check, independent of the oracle
conformance gate that pins end-to-end output."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.ssjoin import (
    SKETCH_BUCKETS,
    _len_bucket_bounds,
    _sketch_bound,
    _sketch_of,
)


def _bucket_of(n: int, bounds: list[int]) -> int:
    return sum(1 for t in bounds if t <= n) - 1


@given(
    nb=st.integers(min_value=1, max_value=10**7),
    ratio_num=st.integers(min_value=0, max_value=10**6),
    tau=st.sampled_from([(4, 5), (1, 2), (2, 3), (9, 10), (1, 1), (3, 7)]),
)
@settings(max_examples=300, deadline=None)
def test_len_bucket_valid_pair_within_one(nb, ratio_num, tau):
    """For ANY rational tau and ANY integer pair (na >= nb) inside the
    size filter tau*na <= nb... i.e. tau_den*nb >= tau_num*na, the
    larger doc's bucket is the smaller doc's bucket or the one above --
    the property the 2-bucket probe-side explode depends on for exact
    recall (a valid pair outside that window would never be enumerated).
    na is drawn as an arbitrary fraction of the allowed [nb, nb*den/num]
    range so boundary sizes are hit."""
    tau_num, tau_den = tau
    na_max = nb * tau_den // tau_num  # largest na with tau_den*nb >= tau_num*na
    na = nb + (na_max - nb) * ratio_num // 10**6
    assert nb <= na <= na_max
    bounds = _len_bucket_bounds(tau_num, tau_den)
    diff = _bucket_of(na, bounds) - _bucket_of(nb, bounds)
    assert diff in (0, 1), (na, nb, tau, diff)


def test_len_bucket_bounds_are_increasing_integers():
    for tau_num, tau_den in [(4, 5), (1, 2), (1, 1)]:
        bounds = _len_bucket_bounds(tau_num, tau_den)
        assert bounds[0] == 1
        assert all(b < c for b, c in zip(bounds, bounds[1:]))


def test_sketch_bound_is_true_upper_bound(spark):
    """For random small documents, the packed-sketch bound evaluated by
    the SAME Spark expressions the join condition uses is >= the true
    intersection size for every pair -- the exactness requirement (an
    under-bound would prune a valid pair before verification)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i} w{i+1}" for i in range(200)]
    docs = [
        (i, rng.sample(vocab, rng.randint(5, 60))) for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, shingles array<string>")
    ex = df.select(
        "doc_id",
        F.explode(F.expr("transform(shingles, s -> xxhash64(s))")).alias(
            "sh"
        ),
    )
    sk = _sketch_of(ex)
    a = sk.select(
        F.col("doc_id").alias("da"),
        *[F.col(f"sk{i}").alias(f"a_sk{i}") for i in range(2)],
    ).alias("a")
    b = sk.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"sk{i}").alias(f"b_sk{i}") for i in range(2)],
    ).alias("b")
    # evaluate the same byte-lane bound with explicit column references
    # (the production form reads alias-qualified sk columns)
    total = F.lit(0).cast("long")
    for li in range(2):
        for j in range(8):
            a_k = F.shiftrightunsigned(
                F.col(f"a_sk{li}"), 8 * j
            ).bitwiseAND(F.lit(255))
            b_k = F.shiftrightunsigned(
                F.col(f"b_sk{li}"), 8 * j
            ).bitwiseAND(F.lit(255))
            total = total + F.least(a_k, b_k)
    bound_rows = {
        (r.da, r.db): r.bound
        for r in a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", F.coalesce(total, F.lit(1 << 62)).alias("bound"))
        .collect()
    }
    sets = {i: set(s) for i, s in docs}
    for (da, db), bound in bound_rows.items():
        true_inter = len(sets[da] & sets[db])
        assert bound >= true_inter, (da, db, bound, true_inter)


def test_sketch_saturation_null_sentinel(spark):
    """A document whose shingle count forces some bucket past 255 gets
    NULL sketch longs, and the bound coalesces to unbounded -- the
    branch-free saturation contract (SCALE.md lesson #10): validity
    comes from the build-time sentinel, never a probe-time branch."""
    big = [(0, [f"tok{i} tok{i+1}" for i in range(8000)])]
    df = spark.createDataFrame(big, "doc_id long, shingles array<string>")
    ex = df.select(
        "doc_id",
        F.explode(F.expr("transform(shingles, s -> xxhash64(s))")).alias(
            "sh"
        ),
    )
    row = _sketch_of(ex).collect()[0]
    assert row.sk0 is None and row.sk1 is None
    # the joined-bound expression over two NULL sketches passes any t
    a = _sketch_of(ex).alias("a")
    b = _sketch_of(ex).alias("b")
    val = (
        a.crossJoin(b)
        .select(_sketch_bound("a", "b").alias("bound"))
        .collect()[0]
        .bound
    )
    assert val == 1 << 62


def test_sketch_bucket_count_matches_constant():
    assert SKETCH_BUCKETS == 16  # two packed longs; _sketch_bound unrolls 16 lanes
