"""Link-popularity analysis: the reference's flagship relational pipeline
(reference big_data/scripts/analysis/analyze_links.py:111-153), Spark-first.

Shape: explode(related_ids) -> count per target id -> inner join with the
per-video stats projection -> descending sort on the count.

Differences from the reference, on purpose (SURVEY.md §4.3):
  * count(*) instead of ``lit(1)`` + ``sum`` (same result, no dummy column);
  * NO sort before the join (analyze_links.py:126-131 orders the counts
    table, joins at :141, then re-sorts at :142-145 -- the first sort is
    dead work the optimizer must preserve because order-by is a barrier);
  * deterministic tie-break (times_linked DESC, id ASC) so output order and
    oracle hashing are reproducible;
  * the aggregated link-count side is the big side at scale (one row per
    referenced video); the stats side is one row per video -- both shuffle
    on ``id`` once, AQE picks the join strategy.  Dangling related-ids
    (references to ids that don't exist) are dropped by the inner join,
    exactly as in the reference ("only keeping rows that are in BOTH
    tables", analyze_links.py:140).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_analysis(videos: DataFrame) -> DataFrame:
    """times-linked vs engagement stats per video, most-linked first.

    ``videos`` is the canonical nested view (pipelines.videos.videos_nested).
    """
    link_counts = (
        videos.select(F.explode("related_ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("times_linked"))
    )
    dependent_vars = videos.select(
        "id",
        F.col("video_engagement.views").alias("views"),
        F.col("video_engagement.num_ratings").alias("num_ratings"),
        F.col("video_engagement.num_comments").alias("num_comments"),
        F.col("video_desc.age_days").alias("age_days"),
    )
    return link_counts.join(dependent_vars, "id", "inner").orderBy(
        F.col("times_linked").desc(), F.col("id").asc()
    )
