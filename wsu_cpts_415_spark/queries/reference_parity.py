"""Reference-parity queries: the reference's four analyses
(analyze_links, trending_predictor, correlation_analysis, graph_filter/SCC)
run over the canonical videos view derived from the ``documents`` fixture
(pipelines/videos.py), each with a DuckDB oracle over the SAME derivation.

The SCC queries get full SQL oracles because the derived graph's component
structure is known by construction (each 50-vertex block is a directed
ring => exactly one SCC per block); the generic-algorithm check against a
Tarjan oracle on arbitrary graphs lives in tests/test_pipelines.py.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.pipelines import correlation, link_analysis, scc, trending
from wsu_cpts_415_spark.pipelines.videos import (
    BLOCK,
    VIDEOS_FLAT_DUCK_CTE,
    videos_flat,
    videos_nested,
)
from wsu_cpts_415_spark.registry import register

# ---------------------------------------------------------------------------
# The derivation itself (validates every downstream parity oracle's input)
# ---------------------------------------------------------------------------


@register(
    "ref_videos_flat",
    oracle=f"""
    WITH {VIDEOS_FLAT_DUCK_CTE}
    SELECT id, uploader_name, age_days, category, length_seconds, views,
           video_rating, num_ratings, num_comments, upload_date,
           array_to_string(related_ids, ',') AS related_ids
    FROM videos_flat
    ORDER BY id
    """,
)
def ref_videos_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical videos view, flat shape (reference data_types.py:9-21):
    deterministic derivation from documents, incl. the related-ids graph.
    Checking this row-for-row pins the input of every parity pipeline.

    ``related_ids`` is serialized to a CSV string in the registered
    output (both engines) because the driver's pandas canonicalizer
    cannot sort list cells; pipelines keep consuming the array form via
    ``videos_flat`` directly."""
    flat = videos_flat(spark, sf_dir)
    return flat.withColumn(
        "related_ids",
        F.array_join(
            F.transform("related_ids", lambda x: x.cast("string")), ","
        ),
    ).orderBy("id")


# ---------------------------------------------------------------------------
# analyze_links (reference analyze_links.py:111-153)
# ---------------------------------------------------------------------------


@register(
    "ref_link_analysis",
    oracle=f"""
    WITH {VIDEOS_FLAT_DUCK_CTE},
    links AS (
        SELECT unnest(related_ids) AS id FROM videos_flat
    ),
    counts AS (
        SELECT id, COUNT(*) AS times_linked FROM links GROUP BY id
    )
    SELECT c.id, c.times_linked, v.views, v.num_ratings, v.num_comments,
           v.age_days
    FROM counts c
    JOIN videos_flat v USING (id)
    ORDER BY c.times_linked DESC, c.id
    """,
)
def ref_link_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link popularity: explode(related_ids) -> count -> inner join with
    per-video stats -> sort (the reference's flagship pipeline).  Dangling
    references drop out in the inner join exactly as in the reference."""
    return link_analysis.link_analysis(videos_nested(spark, sf_dir))


# ---------------------------------------------------------------------------
# trending_predictor (reference trending_predictor.py:38-191)
# ---------------------------------------------------------------------------

_DUCK_FEATURES = """
    scored AS (
        SELECT *,
               base_trending_score * new_video_engagement_bonus
                   AS trending_score
        FROM (
            SELECT *,
                   recency_boost * 20 + views_velocity * 15
                   + engagement_density * 3 + rating_quality * 25
                   + length_score * 1 AS base_trending_score
            FROM (
                SELECT *,
                       log_views * age_days / 1000.0 AS views_velocity,
                       (total_engagements / (log_views + 1)) / 1000.0
                           AS engagement_density,
                       video_rating * rating_confidence AS rating_quality,
                       CASE WHEN age_days > 710
                             AND (total_engagements / (log_views + 1)) / 1000.0
                                 > 0.01
                            THEN 2 ELSE 1.0 END AS new_video_engagement_bonus,
                       CASE WHEN length_seconds BETWEEN 120 AND 900 THEN 1.0
                            WHEN length_seconds < 30 THEN 0.3
                            WHEN length_seconds > 3600 THEN 0.4
                            ELSE 0.7 END AS length_score
                FROM (
                    SELECT *,
                           age_days / 100.0 AS recency_boost,
                           ln(1 + views) AS log_views,
                           num_ratings + num_comments AS total_engagements,
                           ln(1 + num_ratings) / 10 AS rating_confidence
                    FROM videos_flat
                    WHERE id IS NOT NULL AND age_days >= 0 AND views >= 0
                      AND video_rating BETWEEN 0 AND 5
                      AND num_ratings >= 0 AND num_comments >= 0
                )
            )
        )
    )
"""

_SCORE_COLS = [
    "recency_boost",
    "views_velocity",
    "engagement_density",
    "rating_quality",
    "length_score",
    "base_trending_score",
    "trending_score",
]


@register(
    "ref_trending_scores",
    oracle=f"""
    WITH {VIDEOS_FLAT_DUCK_CTE},
    {_DUCK_FEATURES}
    SELECT id, category,
           {", ".join(f"ROUND({c}, 6) AS {c}" for c in _SCORE_COLS)},
           new_video_engagement_bonus
    FROM scored
    ORDER BY id
    """,
)
def ref_trending_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter -> six engineered features -> weighted linear score
    (trending_predictor.py:46-162, weights :38-44 exactly).  The >5-rating
    violators injected by the derivation visibly drop out here."""
    scored = trending.trending_scores(videos_nested(spark, sf_dir))
    return scored.select(
        "id",
        "category",
        *[F.round(c, 6).alias(c) for c in _SCORE_COLS],
        "new_video_engagement_bonus",
    ).orderBy("id")


@register(
    "ref_trending_rankings",
    oracle=f"""
    WITH {VIDEOS_FLAT_DUCK_CTE},
    {_DUCK_FEATURES},
    ranked AS (
        SELECT id, uploader_name, category, age_days, views, video_rating,
               num_ratings, num_comments, trending_score,
               ROW_NUMBER() OVER (PARTITION BY category
                                  ORDER BY trending_score DESC, id)
                   AS category_rank,
               PERCENT_RANK() OVER (ORDER BY trending_score DESC)
                   AS global_percentile
        FROM scored
    )
    SELECT id, uploader_name, category, age_days, views, video_rating,
           num_ratings, num_comments,
           ROUND(trending_score, 6) AS trending_score,
           category_rank,
           ROUND(global_percentile, 6) AS global_percentile
    FROM ranked
    WHERE category_rank <= {trending.TOP_N_PER_CATEGORY}
    ORDER BY category, category_rank
    """,
)
def ref_trending_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 per-category row_number (<= 50) + W2 global percent_rank
    (trending_predictor.py:164-191), with a deterministic id tie-break the
    reference lacks.  The global window is single-partition by nature --
    kept for parity; percent_rank_scalable (queries/windows.py) is the
    100 TB formulation."""
    ranked = trending.trending_rankings(videos_nested(spark, sf_dir))
    return (
        ranked.select(
            "id",
            "uploader_name",
            "category",
            "age_days",
            "views",
            "video_rating",
            "num_ratings",
            "num_comments",
            F.round("trending_score", 6).alias("trending_score"),
            "category_rank",
            F.round("global_percentile", 6).alias("global_percentile"),
        )
        .orderBy("category", "category_rank")
    )


# ---------------------------------------------------------------------------
# correlation_analysis (reference correlation_analysis.py:45-110)
# ---------------------------------------------------------------------------

_CORR_PAIRS = list(combinations(correlation.NUMERIC_COLS, 2))

_DUCK_NUMERIC = """
    nums AS (
        SELECT CAST(length_seconds AS DOUBLE) AS length_seconds,
               CAST(num_comments AS DOUBLE) AS num_comments,
               CAST(num_ratings AS DOUBLE) AS num_ratings,
               CAST(EXTRACT(DAY FROM upload_date) AS DOUBLE) AS upload_day,
               CAST(EXTRACT(MONTH FROM upload_date) AS DOUBLE) AS upload_month,
               CAST(EXTRACT(YEAR FROM upload_date) AS DOUBLE) AS upload_year,
               CAST(video_rating AS DOUBLE) AS video_rating,
               CAST(views AS DOUBLE) AS views
        FROM videos_flat
    ),
    aggs AS (
        SELECT {corr_exprs}
        FROM nums
    )
"""


@register(
    "ref_correlation_matrix",
    oracle=(
        f"WITH {VIDEOS_FLAT_DUCK_CTE}, "
        + _DUCK_NUMERIC.format(
            corr_exprs=", ".join(
                f"corr({a}, {b}) AS c_{a}__{b}" for a, b in _CORR_PAIRS
            )
        )
        + " SELECT col_a, col_b, ROUND(corr, 5) AS corr,"
        + " CASE WHEN ROUND(corr, 5) > 0.1 THEN 'Positive'"
        + "      WHEN ROUND(corr, 5) < -0.1 THEN 'Negative'"
        + "      ELSE 'Near-Zero' END AS classification FROM ("
        + " UNION ALL ".join(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, c_{a}__{b} AS corr FROM aggs"
            for a, b in _CORR_PAIRS
        )
        + ") ORDER BY col_a, col_b"
    ),
)
def ref_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs Pearson correlation over the 8 numeric video fields
    (correlation_analysis.py:90-110) as 28 corr aggregates in ONE pass --
    no VectorAssembler, no ML jar, one scan (SURVEY.md §2.4 A5) -- plus
    the M4 Positive/Negative/Near-Zero sign buckets (README.md:25)."""
    return correlation.correlation_matrix(videos_nested(spark, sf_dir)).orderBy(
        "col_a", "col_b"
    )


# ---------------------------------------------------------------------------
# graph_filter / SCC (reference graph_filter.py:111-159)
# ---------------------------------------------------------------------------


def _scc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SCC labeling per (session, dataset), shared by the components
    and rollup queries (the labeling is ~95% of either query's cost and
    both need the identical table).  SCC is deterministic min-label
    peeling, so staging changes latency, never results -- the cluster
    analogue is one labeling job writing a component table that every
    downstream rollup reads."""
    from wsu_cpts_415_spark.ops.staging import staged

    def build() -> DataFrame:
        videos = videos_nested(spark, sf_dir)
        return scc.strongly_connected_components(
            videos.select("id"), scc.video_edges(videos)
        )

    return staged(spark, "scc_labels", sf_dir, build)


@register(
    "ref_scc_components",
    oracle=f"""
    SELECT 'v' || doc_id AS id,
           'v' || ((doc_id // {BLOCK}) * {BLOCK}) AS component
    FROM documents
    ORDER BY id
    """,
)
def ref_scc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native SCC labels over the related-ids graph (graph_filter.py:129;
    graphframes replaced by iterative DataFrame min-label peeling,
    pipelines/scc.py).  Oracle = the derived graph's known structure: each
    {BLOCK}-vertex block is a directed ring, hence exactly one SCC whose
    minimal id is the block base; inter-block edges are one-directional and
    dangling ids are dropped, so they never merge components.  The
    arbitrary-graph check against a Tarjan oracle is in
    tests/test_pipelines.py."""
    return scc.scc_components(
        videos_nested(spark, sf_dir), comps=_scc_labels(spark, sf_dir)
    )


@register(
    "ref_scc_rollup",
    oracle=f"""
    SELECT 'v' || ((doc_id // {BLOCK}) * {BLOCK}) AS component,
           COUNT(*) AS cluster_size,
           COUNT(DISTINCT source) AS distinct_uploaders,
           COUNT(DISTINCT lang) AS distinct_categories,
           ROUND(AVG(n_chars * ((doc_id % 97) + 1)), 4) AS avg_views
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY cluster_size DESC, component
    """,
)
def ref_scc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component rollup (graph_filter.py:143-156): size, distinct
    uploaders/categories, avg views, biggest cluster first.  countDistinct
    replaces size(collect_set(...)) -- no unbounded per-group arrays."""
    return scc.scc_cluster_rollup(
        videos_nested(spark, sf_dir), comps=_scc_labels(spark, sf_dir)
    )


@register(
    "ref_link_analysis_outer",
    oracle=f"""
    WITH {VIDEOS_FLAT_DUCK_CTE},
    links AS (
        SELECT unnest(related_ids) AS id FROM videos_flat
    ),
    counts AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS times_linked
        FROM links GROUP BY id
    )
    SELECT v.id, COALESCE(c.times_linked, 0) AS times_linked, v.views
    FROM videos_flat v
    LEFT JOIN counts c USING (id)
    ORDER BY times_linked DESC, v.id
    """,
)
def ref_link_analysis_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer variant of the link analysis (F1 explode_outer semantics):
    every video appears, zero-inbound-link videos included with
    times_linked = 0 -- the rows the reference's inner join silently
    drops (analyze_links.py:141).  Left join + coalesce, dimension side
    aggregated first."""
    videos = videos_nested(spark, sf_dir)
    counts = (
        videos.select(F.explode_outer("related_ids").alias("id"))
        .filter(F.col("id").isNotNull())
        .groupBy("id")
        .agg(F.count("*").alias("times_linked"))
    )
    return (
        videos.select("id", F.col("video_engagement.views").alias("views"))
        .join(counts, "id", "left_outer")
        .select(
            "id",
            F.coalesce("times_linked", F.lit(0)).alias("times_linked"),
            "views",
        )
        .orderBy(F.col("times_linked").desc(), F.col("id").asc())
    )
