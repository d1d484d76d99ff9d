"""Text-report sink (S11): the trending top-20 report of the reference
(trending_predictor.py:193-244 feature breakdown, :296-331 top-20 table,
:332-337 write_to_txt_file), kept as presentation -- a BOUNDED top-k
collect (orderBy().limit(k) compiles to TakeOrderedAndProject, so the
driver receives k rows, never the table) followed by driver-side
formatting.  This is the one place the engine deliberately leaves the
executors: report rendering is not dataflow."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wsu_cpts_415_spark.pipelines.trending import WEIGHTS

REPORT_LIMIT = 20  # trending_predictor.py:193,200


def feature_breakdown(ranked: DataFrame, limit: int = REPORT_LIMIT) -> str:
    """Per-video feature breakdown for the top ``limit`` by score
    (trending_predictor.py:193-244 structure)."""
    top = (
        ranked.orderBy(F.desc("trending_score"), F.asc("id"))
        .limit(limit)
        .collect()
    )
    out = ["=" * 80, "STATS FOR TOP VIDEOS", "=" * 80]
    out.append(f"Feature Weights: {WEIGHTS}")
    out.append("Top Videos Feature Analysis:")
    out.append("-" * 80)
    for i, v in enumerate(top, 1):
        bonus_text = "APPLIED" if v["new_video_engagement_bonus"] > 1.0 else "not applied"
        out += [
            f"#{i}: {v['uploader_name']} - {v['category']}",
            f"Video ID: {v['id']}",
            f"Age Days: {v['age_days']} | Views: {v['views']:,} | Rating: {v['video_rating']}",
            f"Ratings: {v['num_ratings']:,} | Comments: {v['num_comments']:,}",
            "Raw Video Stats:",
            f"  - Recency Boost: {v['recency_boost']:.1f} (weight: {WEIGHTS['recency_boost']})",
            f"  - Views Velocity: {v['views_velocity']:.3f} (weight: {WEIGHTS['views_velocity']})",
            f"  - Engagement Density: {v['engagement_density']:.6f} (weight: {WEIGHTS['engagement_density']})",
            f"  - Rating Quality: {v['rating_quality']:.3f} (weight: {WEIGHTS['rating_quality']})",
            f"  - Length Score: {v['length_score']:.1f} (weight: {WEIGHTS['length_score']})",
            f"  - Rating Confidence: {v['rating_confidence']:.3f}",
            f"  - New Video Engagement Bonus: {v['new_video_engagement_bonus']} ({bonus_text})",
            "Final Scores:",
            f"  - Scaled Base Trending Score: {v['base_trending_score']:.3f}",
            f"  - Final Trending Score: {v['trending_score']:.3f}",
            f"  - Category Rank: #{v['category_rank']}",
            "-" * 80,
        ]
    return "\n".join(out)


def top20_table(ranked: DataFrame, limit: int = REPORT_LIMIT) -> str:
    """Fixed-width top-k table (trending_predictor.py:299-325)."""
    top = (
        ranked.orderBy(F.desc("trending_score"), F.asc("id"))
        .select(
            "id", "uploader_name", "category", "trending_score",
            "views", "age_days", "category_rank",
        )
        .limit(limit)
        .collect()
    )
    header = (
        f"{'ID':<15} {'Uploader':<20} {'Category':<15} "
        f"{'Trend Score':<12} {'Views':<12} {'Age Days':<10} {'Cat Rank':<8}"
    )
    lines = [f"=== TOP {limit} TRENDING VIDEOS ===", header, "-" * len(header)]
    for r in top:
        lines.append(
            f"{r['id']:<15} {r['uploader_name']:<20} {r['category']:<15} "
            f"{r['trending_score']:<12.3f} {r['views']:<12} "
            f"{r['age_days']:<10} {r['category_rank']:<8}"
        )
    return "\n".join(lines)


def trending_report(ranked: DataFrame, path: str | None = None) -> str:
    """Full report (breakdown + table); optionally written to ``path``
    (write_to_txt_file, trending_predictor.py:332-337)."""
    text = feature_breakdown(ranked) + "\n\n" + top20_table(ranked)
    if path is not None:
        with open(path, "w") as fh:
            fh.write(text)
    return text
