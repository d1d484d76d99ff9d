"""The curation funnel: every corpus-hygiene rule in the suite composed
into one keep/drop pipeline -- the end-to-end pass an LLM-data run
actually executes (quality gate -> repetition gate -> near-dup gate),
with per-document verdicts and the sequential drop-attribution report.

This is deliberately a COMPOSITION query: it reuses the quality scorer
(queries/text.py), the Gopher repetition filter (queries/llm_filters.py),
and the LSH connected-components clustering (queries/graph_ops.py)
verbatim -- same Spark builders, same oracle CTE chains -- so the funnel
is provably consistent with its parts.

Scale: quality and repetition are row-local / doc-keyed aggregates; the
near-dup gate's pair graph is corpus-sliver-sized (see graph_ops).  The
three verdict tables join on doc_id -- at 100 TB these are slim boolean
projections, and the funnel report is a single global aggregate over
them.  Nothing in the composition adds a shuffle the parts didn't
already pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table

from wsu_cpts_415_spark.queries.graph_ops import (
    _NEARDUP_DUCK_CTES,
    _neardup_labels,
)
from wsu_cpts_415_spark.queries.llm_filters import (
    REPETITION_DUCK_CTES,
    repetition_filter,
)
from wsu_cpts_415_spark.queries.text import QUALITY_DUCK_CTES, quality_score
from wsu_cpts_415_spark.registry import register

QUALITY_MIN = 0.55  # keep docs scoring at or above (drops ~4% of fixture)

_VERDICT_DUCK_CTES = f"""{_NEARDUP_DUCK_CTES},
    {QUALITY_DUCK_CTES},
    {REPETITION_DUCK_CTES},
    verd AS (
        SELECT q.doc_id,
               q.quality >= {QUALITY_MIN} AS q_ok,
               r.keep AS rep_ok,
               c.cluster_id = q.doc_id AS nd_ok,
               q.quality >= {QUALITY_MIN} AND r.keep
                   AND c.cluster_id = q.doc_id AS keep
        FROM qual q
        JOIN rep r USING (doc_id)
        JOIN clusters c USING (doc_id)
    )"""


def _verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = quality_score(spark, sf_dir).select(
        "doc_id", (F.col("quality") >= QUALITY_MIN).alias("q_ok")
    )
    rep = repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_ok")
    )
    nd = _neardup_labels(spark, sf_dir).select(
        "doc_id", (F.col("cluster_id") == F.col("doc_id")).alias("nd_ok")
    )
    return (
        qv.join(rep, "doc_id")
        .join(nd, "doc_id")
        .select(
            "doc_id",
            "q_ok",
            "rep_ok",
            "nd_ok",
            (F.col("q_ok") & F.col("rep_ok") & F.col("nd_ok")).alias("keep"),
        )
    )


@register(
    "curation_verdicts",
    oracle=f"""
    WITH RECURSIVE {_VERDICT_DUCK_CTES}
    SELECT doc_id, q_ok, rep_ok, nd_ok, keep FROM verd
    ORDER BY doc_id
    """,
)
def curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdict: quality gate (score >=
    {QUALITY_MIN}), repetition gate (Gopher thresholds), near-dup gate
    (cluster canonical), and the final keep decision."""
    return _verdicts(spark, sf_dir).orderBy("doc_id")


@register(
    "curation_funnel",
    oracle=f"""
    WITH RECURSIVE {_VERDICT_DUCK_CTES}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN NOT q_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS drop_quality,
           CAST(SUM(CASE WHEN q_ok AND NOT rep_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS drop_repetition,
           CAST(SUM(CASE WHEN q_ok AND rep_ok AND NOT nd_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS drop_neardup,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 6)
               AS kept_pct
    FROM verd
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row funnel report with SEQUENTIAL drop attribution (each doc
    counted against the first gate that rejects it, in pipeline order:
    quality -> repetition -> near-dup) -- the honest version of the
    numbers every curation writeup tables."""
    v = _verdicts(spark, sf_dir)
    return v.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(~F.col("q_ok"), 1).otherwise(0)).alias("drop_quality"),
        F.sum(
            F.when(F.col("q_ok") & ~F.col("rep_ok"), 1).otherwise(0)
        ).alias("drop_repetition"),
        F.sum(
            F.when(
                F.col("q_ok") & F.col("rep_ok") & ~F.col("nd_ok"), 1
            ).otherwise(0)
        ).alias("drop_neardup"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
        F.round(
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            * 100.0
            / F.count("*"),
            6,
        ).alias("kept_pct"),
    )


CANARY_RATE = 200  # one doc in N gets a canary
_CANARY_SALT = "canary1"


@register(
    "canary_injection_plan",
    oracle=f"""
    SELECT doc_id, source,
           'CANARY-' || upper(substr(md5(CAST(doc_id AS VARCHAR)
                                         || '_{_CANARY_SALT}_tok'), 1, 12))
               AS canary_token,
           text || ' CANARY-'
                || upper(substr(md5(CAST(doc_id AS VARCHAR)
                                    || '_{_CANARY_SALT}_tok'), 1, 12))
               AS text_with_canary
    FROM documents
    WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                               || '_{_CANARY_SALT}'), 1, 8))::BIGINT)
          % {CANARY_RATE} = 0
    ORDER BY doc_id
    """,
)
def canary_injection_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary insertion for memorization / contamination tracing: one
    document in {CANARY_RATE} (selected by seeded hash, so the plan is
    reproducible and auditable) gets a unique hash-derived canary token
    appended; post-training, generating a canary proves the exact
    training copy was memorized, and finding one in an eval set proves
    leakage direction.  Returns the injection manifest (doc, source,
    token, rewritten text) -- the transform a pipeline applies at shard
    write time.

    Scale: selection and token derivation are row-local expressions on
    the scan (no shuffle at all before the presentation sort of the
    1/{CANARY_RATE} sliver); the manifest doubles as the lookup table
    the post-training probe greps against."""
    docs = load_table(spark, sf_dir, "documents")
    sel = F.expr(
        "cast(conv(substr(md5(concat(cast(doc_id as string), '_"
        + _CANARY_SALT
        + "')), 1, 8), 16, 10) as bigint)"
    )
    token = F.concat(
        F.lit("CANARY-"),
        F.upper(
            F.expr(
                "substr(md5(concat(cast(doc_id as string), '_"
                + _CANARY_SALT
                + "_tok')), 1, 12)"
            )
        ),
    )
    return (
        docs.filter(sel % CANARY_RATE == 0)
        .select(
            "doc_id",
            "source",
            token.alias("canary_token"),
            F.concat("text", F.lit(" "), token).alias("text_with_canary"),
        )
        .orderBy("doc_id")
    )
