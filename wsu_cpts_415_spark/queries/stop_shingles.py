"""Stop-shingle df cap: the documented 100 TB dial for the exact
posting-list Jaccard kernel, DEPLOYED (round 10).

``ngram_jaccard_pairs``'s docstring has said since round 4 that the
inverted-index pipeline's inherent Σ df(shingle)² work is bounded at
scale by "a stop-shingle cut" -- dropping posting lists whose document
frequency exceeds a cap, exactly as web-scale near-dup systems drop
stopword shingles (Broder's shingling paper prunes super-common
shingles for the same reason).  Round 10 turns that sentence into two
oracle-checked queries:

* ``stop_shingle_cap_audit`` -- the cost quote BEFORE the cut: a
  df-bucket histogram of the shingle vocabulary with the implied
  pair-generation bill per bucket (df*(df-1)/2 summed), the same
  measure->dial discipline as ``blocking_saturation_audit`` (SCALE.md
  lesson #7).  At sf0.1 the top buckets hold 36.47M of the kernel's
  36.5M pair work -- reading this table IS the decision to cap.
* ``ngram_jaccard_pairs_capped`` -- the capped kernel: posting lists
  with df > {CAP} never generate pairs; intersection counts therefore
  UNDERCOUNT by exactly the dropped shingles, so the score is a true
  Jaccard LOWER BOUND (full set sizes stay in the denominator).  The
  oracle applies the identical HAVING cap, so the capped semantics --
  not a fuzzy "approximation" -- are what conformance pins.

Scale posture: after the cap, per-shingle pair fan-out is <= CAP²/2 by
construction, so Σ df² is linear in the number of kept posting lists --
the quadratic hot-shingle blowup is removed BEFORE the pair stream
exists (the nested-explode memory bound of the exact kernel still
applies to what remains).  The exact kernel stays registered as the
exactness baseline; this is the production-priced variant between it
and the LSH prefilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.text import _DUCK_SHINGLES, _shingle_rows_staged
from wsu_cpts_415_spark.registry import register

STOP_SHINGLE_DF_CAP = 32  # posting lists longer than this never pair
TOPK = 20

# fixed bucket edges, like blocking_saturation_audit: bounded grouping
# key on both engines
DF_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


@register(
    "stop_shingle_cap_audit",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    dfs AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
        FROM sh GROUP BY shingle
    ),
    bucketed AS (
        SELECT CASE
                 WHEN df >= 512 THEN 512
                 WHEN df >= 256 THEN 256
                 WHEN df >= 128 THEN 128
                 WHEN df >= 64 THEN 64
                 WHEN df >= 32 THEN 32
                 WHEN df >= 16 THEN 16
                 WHEN df >= 8 THEN 8
                 WHEN df >= 4 THEN 4
                 WHEN df >= 2 THEN 2
                 ELSE 1
               END AS df_bucket,
               df
        FROM dfs
    )
    SELECT CAST(df_bucket AS INT) AS df_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(df) AS BIGINT) AS n_postings,
           CAST(SUM(df * (df - 1) // 2) AS BIGINT) AS pair_work
    FROM bucketed
    GROUP BY df_bucket
    ORDER BY df_bucket
    """,
)
def stop_shingle_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-vocabulary df histogram with the implied posting-list
    pair bill per bucket -- the audit a 100 TB corpus runs before an
    exact near-dup pass, and the number that justifies the stop-shingle
    cap (the top buckets carry virtually all of Σ df² while holding a
    tail of stop-shingles every document shares).  One aggregate over
    the staged shingle rows, grouped to fixed bucket edges."""
    dfs = (
        _shingle_rows_staged(spark, sf_dir)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
    )
    bucket = F.lit(1)
    for e in DF_BUCKETS[1:]:
        bucket = F.when(F.col("df") >= e, e).otherwise(bucket)
    return (
        dfs.select(bucket.cast("int").alias("df_bucket"), "df")
        .groupBy("df_bucket")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("df").alias("n_postings"),
            # integral div end-to-end: df*(df-1) is even so /2 agrees
            # today, but a double round-trip diverges between engines
            # (Spark truncates, DuckDB rounds) once sums pass 2^53 --
            # reachable at real corpus scale
            F.sum(F.expr("df * (df - 1) div 2"))
            .cast("bigint")
            .alias("pair_work"),
        )
        .orderBy("df_bucket")
    )


@register(
    "ngram_jaccard_pairs_capped",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        FROM sh GROUP BY doc_id
    ),
    kept AS (
        SELECT shingle FROM sh
        GROUP BY shingle
        HAVING COUNT(*) <= {STOP_SHINGLE_DF_CAP}
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common_lb
        FROM sh a
        JOIN kept k ON k.shingle = a.shingle
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common_lb AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_common_lb), 6) AS jaccard_lb
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_a
    JOIN sizes sb ON sb.doc_id = inter.doc_b
    ORDER BY jaccard_lb DESC, doc_a, doc_b
    LIMIT {TOPK}
    """,
)
def ngram_jaccard_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-shingle-capped near-dup pairs, top-{TOPK} by Jaccard LOWER
    BOUND: identical inverted-index pipeline to ``ngram_jaccard_pairs``
    except posting lists with df > {STOP_SHINGLE_DF_CAP} never generate
    pairs.  Intersections undercount by exactly the dropped shingles
    while full set sizes stay in the denominator, so the score can only
    under-rank a pair, never inflate it -- the safe direction for a
    candidate generator feeding exact verification.  Per-shingle
    fan-out is bounded by the cap, so pair work is linear in kept
    posting lists instead of quadratic in hot-shingle df."""
    shingles = _shingle_rows_staged(spark, sf_dir)
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # posting lists, CAPPED at build time -- the hot lists are dropped
    # before any pair exists (same repartition note as the exact
    # kernel: the low-cardinality agg would otherwise leave the pair
    # explosion near-serial)
    lists = (
        shingles.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") <= STOP_SHINGLE_DF_CAP)
        .repartition(64)
    )
    # nested explode (x at i, each y after i): per-row memory bounded
    # by the cap, pairs stream straight into the partial aggregate
    pairs = lists.select("ds", F.posexplode("ds").alias("i", "x")).select(
        F.col("x").alias("doc_a"),
        F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("doc_b"),
    )
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("n_common_lb")
    )
    # sizes is per-DOC (corpus-grain, fixed-width rows): hint only under
    # the row+byte gate -- the hint survives the sa/sb aliases -- and
    # shuffle-join above it
    from wsu_cpts_415_spark.ops.staging import maybe_broadcast
    from wsu_cpts_415_spark.queries.ssjoin import DOC_SIDE_BCAST_ROWS

    sizes = maybe_broadcast(
        sizes,
        DOC_SIDE_BCAST_ROWS,
        persist_input=True,
        stats_key=("ngram_capped_sizes", sf_dir),
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common_lb").cast("double")
                / (
                    F.col("sa.n_sh")
                    + F.col("sb.n_sh")
                    - F.col("n_common_lb")
                ),
                6,
            ).alias("jaccard_lb"),
        )
        .orderBy(F.col("jaccard_lb").desc(), "doc_a", "doc_b")
        .limit(TOPK)
    )
