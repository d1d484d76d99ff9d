"""Trending-score pipeline: feature engineering -> weighted linear score ->
window rankings (reference big_data/scripts/analysis/trending_predictor.py).

Formulas and weights are reproduced exactly (weights :38-44, prepare/filter
:46-72, features :74-116, score :142-162, rankings :164-191).  The
reference also fits a VectorAssembler+StandardScaler ML pipeline
(:118-140) whose output is *never used* by the score ("Use the original
raw features before scaling", :148) -- we drop that dead fit (it was a
full aggregate pass over the data) and compute the score directly from the
raw features as the reference's own math does.

Everything here is built-in Column arithmetic: whole-stage-codegen'd,
zero UDFs, zero extra shuffles before the ranking windows.  The two
windows are the reference's (W1 per-category row_number, W2 global
percent_rank); the global window is a single-partition sort at scale --
kept for parity, with the scalable reformulation exposed separately
(queries/windows.py percent_rank_scalable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# trending_predictor.py:38-44 -- "arbitrary ml model weights for trend score"
WEIGHTS = {
    "recency_boost": 20,
    "views_velocity": 15,
    "engagement_density": 3,
    "rating_quality": 25,
    "length_score": 1,
}

TOP_N_PER_CATEGORY = 50  # trending_predictor.py:164

# Above this row count the W2 global percent_rank switches from the
# reference's single-partition window (parity form, fine for bounded
# inputs) to the range-partitioned exact formulation below.  Both paths
# produce bit-identical values, so oracle hashes are unaffected; beyond
# a few thousand rows the scalable path's two extra bounded jobs cost
# less than funneling the whole table through one window partition.
SCALABLE_PERCENTILE_ROWS = 2_000


def prepare_data(videos: DataFrame) -> DataFrame:
    """Flatten nested fields and apply the quality filter
    (trending_predictor.py:46-72): non-null id, non-negative counts/age,
    rating in [0,5]."""
    prepared = videos.select(
        "id",
        F.col("video_desc.uploader").alias("uploader_name"),
        F.col("video_desc.age_days").alias("age_days"),
        F.col("video_desc.category").alias("category"),
        F.col("video_attri.length").alias("length_seconds"),
        F.col("video_engagement.views").alias("views"),
        F.col("video_attri.rating").alias("video_rating"),
        F.col("video_engagement.num_ratings").alias("num_ratings"),
        F.col("video_engagement.num_comments").alias("num_comments"),
        "related_ids",
    )
    return prepared.filter(
        F.col("id").isNotNull()
        & (F.col("age_days") >= 0)
        & (F.col("views") >= 0)
        & F.col("video_rating").between(0, 5)
        & (F.col("num_ratings") >= 0)
        & (F.col("num_comments") >= 0)
    )


def calculate_features(df: DataFrame) -> DataFrame:
    """The six derived features (trending_predictor.py:74-116), verbatim
    math, as one batch of column expressions."""
    df = df.withColumns(
        {
            "recency_boost": F.col("age_days") / 100.0,
            "log_views": F.log1p(F.col("views")),
            "total_engagements": F.col("num_ratings") + F.col("num_comments"),
        }
    )
    df = df.withColumns(
        {
            "views_velocity": F.col("log_views") * F.col("age_days") / 1000.0,
            "engagement_density": (
                F.col("total_engagements") / (F.col("log_views") + 1)
            )
            / 1000.0,
            "rating_confidence": F.log1p(F.col("num_ratings")) / 10,
        }
    )
    return df.withColumns(
        {
            "rating_quality": F.col("video_rating") * F.col("rating_confidence"),
            "new_video_engagement_bonus": F.when(
                (F.col("age_days") > 710) & (F.col("engagement_density") > 0.01), 2
            ).otherwise(1.0),
            "length_score": F.when(F.col("length_seconds").between(120, 900), 1.0)
            .when(F.col("length_seconds") < 30, 0.3)
            .when(F.col("length_seconds") > 3600, 0.4)
            .otherwise(0.7),
        }
    )


def calculate_trending_score(df: DataFrame) -> DataFrame:
    """base = Σ wᵢ·featureᵢ; trending_score = base * bonus
    (trending_predictor.py:142-162)."""
    base = (
        F.col("recency_boost") * WEIGHTS["recency_boost"]
        + F.col("views_velocity") * WEIGHTS["views_velocity"]
        + F.col("engagement_density") * WEIGHTS["engagement_density"]
        + F.col("rating_quality") * WEIGHTS["rating_quality"]
        + F.col("length_score") * WEIGHTS["length_score"]
    )
    return df.withColumn("base_trending_score", base).withColumn(
        "trending_score",
        F.col("base_trending_score") * F.col("new_video_engagement_bonus"),
    )


def trending_scores(videos: DataFrame) -> DataFrame:
    """prepare -> features -> score, no ranking windows yet."""
    return calculate_trending_score(calculate_features(prepare_data(videos)))


def _global_percentile_scalable(
    scored: DataFrame, n: int, bounds: list[float], npart: int = 64
) -> DataFrame:
    """Exact global percent_rank over ``trending_score`` with NO
    unpartitioned window: range-partition by score (equal scores land in
    one partition, so tie groups never straddle a boundary), rank locally
    within each partition, then add the count of rows in all preceding
    partitions -- the same local-order + offset technique Spark's own
    global sort uses.  Driver traffic is one row count per partition
    (``npart`` longs), independent of data size.

    percent_rank = (rank - 1) / (n - 1) with rank over score alone, so
    tied scores share a percentile -- bit-identical to the parity window
    and to the DuckDB oracle.

    The bucket id is a pure function of the score against boundary
    LITERALS frozen from one approx_percentile action (NOT
    repartitionByRange, whose per-execution sampled boundaries could
    desynchronize plan passes); boundary quality only affects balance,
    never correctness.  Bucket offsets are computed INSIDE the final DAG
    by a triangular join over the npart-row bucket-count table
    (broadcast, bounded metadata) -- no extra driver action and no
    single-partition window anywhere."""
    bounds_arr = F.array(*[F.lit(float(b)) for b in bounds])
    # descending buckets: _pid = #boundaries above this score, so bucket 0
    # holds the top scores and equal scores always share a bucket
    parts = scored.withColumn(
        "_pid",
        F.size(F.filter(bounds_arr, lambda b: b > F.col("trending_score"))),
    )
    bcounts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    a, b = bcounts.alias("a"), bcounts.alias("b")
    offsets = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    local_w = Window.partitionBy("_pid").orderBy(F.desc("trending_score"))
    denom = max(n - 1, 1)
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "global_percentile",
            (F.rank().over(local_w) - 1 + F.col("_off")).cast("double") / denom,
        )
        .drop("_pid", "_off")
    )


def trending_rankings(
    videos: DataFrame,
    top_n: int = TOP_N_PER_CATEGORY,
    scalable_rows: int = SCALABLE_PERCENTILE_ROWS,
) -> DataFrame:
    """W1 per-category row_number (kept <= top_n) + W2 global percent_rank
    (trending_predictor.py:164-191).  The row_number ordering adds an ``id``
    tie-break the reference lacks, making ranks reproducible; percent_rank
    orders by score alone so tied scores share a percentile (SQL
    semantics, identical in the DuckDB oracle).

    The global percentile is the reference's W2 scale hazard: above
    ``scalable_rows`` rows it is computed by the exact range-partitioned
    formulation (``_global_percentile_scalable``) instead of the
    single-partition window; values are identical on both paths
    (``tests/test_pipelines.py`` asserts equality by forcing
    ``scalable_rows=0`` at fixture scale)."""
    from pyspark import StorageLevel

    # The ranking is a multi-pass consumer (row-count routing + on the
    # scalable path the quantile-bounds action + the rank job), so stage
    # the scored table once instead of re-deriving it per pass -- the
    # same scored-layer materialization a 100 TB pipeline would do.
    # Spark's cache manager dedupes by logical plan, so repeated calls
    # reuse one entry per dataset -- gate on storageLevel so the reuse
    # path doesn't re-ask (the CacheManager "already cached" warn seen
    # in BENCH_r03's tail), and release via ops.staging.clear_staged.
    from wsu_cpts_415_spark.ops.staging import track_persist

    scored = trending_scores(videos)
    if scored.storageLevel == StorageLevel.NONE:
        scored = track_persist(scored.persist(StorageLevel.MEMORY_AND_DISK))
    npart = 64
    fracs = ", ".join(str(i / npart) for i in range(1, npart))
    # ONE action materializes the stage and returns both the routing row
    # count and the (cheap, approximate-is-fine) bucket boundaries
    stats = scored.agg(
        F.count("*").alias("n"),
        F.expr(f"approx_percentile(trending_score, array({fracs}), 1000)").alias(
            "bounds"
        ),
    ).first()
    n = stats["n"]
    if n > scalable_rows:
        with_pct = _global_percentile_scalable(scored, n, stats["bounds"], npart)
    else:
        with_pct = scored.withColumn(
            "global_percentile",
            F.percent_rank().over(Window.orderBy(F.desc("trending_score"))),
        )
    category_window = Window.partitionBy("category").orderBy(
        F.desc("trending_score"), F.asc("id")
    )
    return with_pct.select(
        "id",
        "uploader_name",
        "category",
        "age_days",
        "views",
        "video_rating",
        "num_ratings",
        "num_comments",
        "recency_boost",
        "views_velocity",
        "engagement_density",
        "rating_quality",
        "length_score",
        "rating_confidence",
        "base_trending_score",
        "trending_score",
        "new_video_engagement_bonus",
        F.row_number().over(category_window).alias("category_rank"),
        "global_percentile",
    ).filter(F.col("category_rank") <= top_n)
