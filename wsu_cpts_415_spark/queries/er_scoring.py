"""Entity-resolution match scoring: the stage AFTER candidate
generation.  Blocking (queries/semdedup.py) and LSH (queries/
similarity.py) produce candidate pairs; record linkage then combines
several weak signals into one calibrated match score per pair and keeps
the confident ones (Fellegi-Sunter shape, deterministic weights).

Signals per blocked candidate pair:
  * prefix edit similarity  1 - dist / max(prefix lengths)
  * content overlap         exact shingle Jaccard (0 when the pair never
                            shares a shingle -- the left join's null)
  * length agreement        min(n_chars) / max(n_chars)

Scale posture: candidates come only from the blocking join (bounded per
block); the Jaccard attach is a left join against the session-staged
exact pair table, which at production scale is the LSH-verified pair
sliver.  Scoring is row-local arithmetic; the top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.semdedup import (
    LEV_BLOCK_CHARS,
    LEV_MAX_DIST,
    LEV_PREFIX,
    lev_candidates,
)
from wsu_cpts_415_spark.registry import register

W_EDIT, W_JAC, W_LEN = 0.5, 0.3, 0.2
ER_TOP_K = 50

_DUCK_EXACT_PAIRS = """exact_sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1]
               ))) AS shingle
        FROM documents
    ),
    ssizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        FROM exact_sh GROUP BY doc_id
    ),
    sinter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM exact_sh a
        JOIN exact_sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    jac AS (
        SELECT doc_a, doc_b,
               ROUND(CAST(n_common AS DOUBLE)
                     / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
        FROM sinter
        JOIN ssizes sa ON sa.doc_id = sinter.doc_a
        JOIN ssizes sb ON sb.doc_id = sinter.doc_b
    )"""


@register(
    "er_match_scores",
    oracle=f"""
    WITH blocked AS (
        SELECT doc_id, lang,
               CAST(n_chars // {LEV_BLOCK_CHARS} AS BIGINT) AS blk,
               string_split(text, ' ')[1] AS tok0,
               substr(text, 1, {LEV_PREFIX}) AS prefix,
               n_chars AS len_chars
        FROM documents
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.prefix, b.prefix) AS dist,
               GREATEST(length(a.prefix), length(b.prefix)) AS plen,
               a.len_chars AS len_a, b.len_chars AS len_b
        FROM blocked a
        JOIN blocked b
          ON a.lang = b.lang AND a.blk = b.blk AND a.tok0 = b.tok0
         AND a.doc_id < b.doc_id
        WHERE levenshtein(a.prefix, b.prefix) <= {LEV_MAX_DIST}
    ),
    {_DUCK_EXACT_PAIRS}
    SELECT c.doc_a, c.doc_b,
           ROUND({W_EDIT} * (1 - CAST(c.dist AS DOUBLE) / c.plen)
                 + {W_JAC} * COALESCE(j.jaccard, 0)
                 + {W_LEN} * (LEAST(c.len_a, c.len_b) * 1.0
                              / GREATEST(c.len_a, c.len_b)), 6)
               AS match_score,
           CAST(c.dist AS INT) AS dist,
           ROUND(COALESCE(j.jaccard, 0), 6) AS jaccard
    FROM cand c
    LEFT JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
    ORDER BY match_score DESC, c.doc_a, c.doc_b
    LIMIT {ER_TOP_K}
    """,
)
def er_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{ER_TOP_K} candidate pairs by composite match score:
    {W_EDIT} * prefix-edit similarity + {W_JAC} * shingle Jaccard +
    {W_LEN} * length agreement.  The multi-signal scoring stage of
    record linkage -- one weak signal misfires (word-soup prefixes look
    alike), the combination separates real near-dups from block
    coincidences."""
    from wsu_cpts_415_spark.queries.text import (
        SHARED_SHINGLE_TAU,
        exact_pairs_above,
    )

    cand = lev_candidates(spark, sf_dir).withColumn(
        "plen",
        F.greatest(
            F.least(F.lit(LEV_PREFIX), F.col("len_a")),
            F.least(F.lit(LEV_PREFIX), F.col("len_b")),
        ),
    )
    # the sgemm pair kernel at the shared-shingle floor = exactly the
    # posting-list jac table, staged once and shared with the recall audit
    jac = exact_pairs_above(spark, sf_dir, SHARED_SHINGLE_TAU).select(
        "doc_a", "doc_b", "jaccard"
    )
    # The jac table is pairs-scale (10M rows at sf0.1); the candidate set
    # is block-bounded.  Probe the big table map-side with the broadcast
    # candidate keys, then broadcast the (candidate-sized) hits back --
    # the pair table itself never shuffles.
    hits = jac.join(
        F.broadcast(cand.select("doc_a", "doc_b")), ["doc_a", "doc_b"]
    )
    scored = (
        cand.join(F.broadcast(hits), ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                W_EDIT * (1 - F.col("dist").cast("double") / F.col("plen"))
                + W_JAC * F.coalesce("jaccard", F.lit(0.0))
                + W_LEN
                * (
                    F.least("len_a", "len_b")
                    / F.greatest("len_a", "len_b").cast("double")
                ),
                6,
            ).alias("match_score"),
            F.col("dist").cast("int").alias("dist"),
            F.round(F.coalesce("jaccard", F.lit(0.0)), 6).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("match_score").desc(), "doc_a", "doc_b"
    ).limit(ER_TOP_K)
