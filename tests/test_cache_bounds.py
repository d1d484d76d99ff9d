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
    qs = all_queries()
    qs["ref_trending_rankings"].fn(spark, SF_SMOKE).count()
    qs["rfm_segmentation"].fn(spark, SF_SMOKE).count()
    assert _n_cached_rdds(spark) > 0
    clear_staged()
    # Spark unpersist is async by default for RDD infos; the storage list
    # reflects unpersist immediately in local mode
    assert _n_cached_rdds(spark) == 0
