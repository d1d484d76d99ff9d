"""Cache-manager hygiene: repeated query invocations must not grow the
persisted-RDD set (the CacheManager 'Asked to cache already cached
data' warn in BENCH_r03's tail was this), and clear_staged() must
release everything -- staged projections, memoized models, and
externally-tracked persists like the trending scored layer."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.ops.staging import clear_staged
from wsu_cpts_415_spark.registry import all_queries


def _n_cached_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_repeat_invocations_do_not_grow_cache(spark):
    qs = all_queries()
    repeat = [
        "ref_trending_rankings",  # track_persist path
        "rfm_segmentation",  # staged base + staged_model bounds
        "gini_user_value",  # shares the per_user_value staged entry
        "minhash_lsh_pairs",  # staged band/hash tables
    ]
    for name in repeat:
        qs[name].fn(spark, SF_SMOKE).count()
    baseline = _n_cached_rdds(spark)
    for name in repeat:
        qs[name].fn(spark, SF_SMOKE).count()
    assert _n_cached_rdds(spark) == baseline, "second pass added cache entries"


def test_clear_staged_releases_everything(spark):
    """Delta form: earlier tests in the session may leave localCheckpoint
    RDDs that only the async ContextCleaner releases, so assert that
    clear_staged() returns the count to (at most) its pre-test level
    rather than demanding a globally empty store."""
    qs = all_queries()
    clear_staged()
    n0 = _n_cached_rdds(spark)
    qs["ref_trending_rankings"].fn(spark, SF_SMOKE).count()
    qs["rfm_segmentation"].fn(spark, SF_SMOKE).count()
    assert _n_cached_rdds(spark) > n0
    clear_staged()
    assert _n_cached_rdds(spark) <= n0
