"""Semantic and edit-distance near-duplicate detection: the two dedup
modalities the hash-based suite (MinHash/SimHash/n-gram, queries/similarity*.py,
queries/text.py) cannot express.

* **SemDeDup** (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding
  space, then drop any vector whose cosine similarity to an earlier vector
  *in the same cluster* exceeds a threshold.  Hash dedup finds lexical
  copies; SemDeDup finds *semantic* copies (paraphrases, translations,
  templated rewrites) that share no shingles.
* **Blocked edit-distance pairs**: classic record-linkage blocking --
  candidate pairs only ever come from the same (language, length-bucket)
  block, then an exact Levenshtein on a fixed prefix with an early-abandon
  threshold.  The O(n^2) kernel runs per block, never on the corpus.

Scale posture:
  * SemDeDup's cluster assignment is map-side math against broadcast
    centroid literals (zero shuffle, identical contract to
    queries/clustering.py).  The pairwise stage shuffles each vector once
    (hash partition by cluster id) and is quadratic only within a cluster;
    at 100 TB the cluster count K scales with the corpus (K ~ N/5k keeps
    cluster populations bounded), so per-task work stays constant -- this
    is exactly the paper's reason for clustering before comparing.  The
    demo K here is queries/clustering.py's K=8 over the fixture.
  * Levenshtein blocking bounds pairs by block population and bounds the
    DP cost with Spark's threshold form ``levenshtein(a, b, t)`` (banded
    DP, early abandon) -- the oracle filters the unbounded DuckDB
    ``levenshtein`` to the same cut, so the result sets agree while the
    Spark side does a fraction of the work.

Cross-engine determinism: distances/cosines are IEEE double folds in
dimension order on both engines (the queries/clustering.py contract),
rounded before any comparison or argmin; every pair is emitted with
doc_a < doc_b and a total-order sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.queries.clustering import K, _assign_expr, _emb_double
from wsu_cpts_415_spark.registry import register

SEM_TAU = 0.30  # same-cluster cosine above this = semantic duplicate.
# The fixture embeddings are near-isotropic (max pairwise cosine ~0.51),
# so the demo threshold sits where the fixture actually has mass; a
# production text-embedding deployment runs ~0.95+.

LEV_PREFIX = 64  # chars of text entering the DP
LEV_BLOCK_CHARS = 200  # length-bucket width for blocking
LEV_MAX_DIST = 45  # early-abandon threshold / emit cut

_SEM_DUCK_CTES = f"""emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(vec_id AS INT) AS c, v FROM emb WHERE vec_id < {K}
    ),
    d1 AS (
        SELECT e.vec_id, c.c,
               ROUND(list_sum(list_transform(
                   generate_series(1, len(e.v)),
                   i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))), 6) AS d
        FROM emb e CROSS JOIN c0 c
    ),
    a1 AS (
        SELECT vec_id, c FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d, c
            ) AS rn FROM d1
        ) WHERE rn = 1
    ),
    nrm AS (
        SELECT vec_id,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS n
        FROM emb
    ),
    pairs AS (
        SELECT a.vec_id AS lo, b.vec_id AS hi,
               ROUND(list_sum(list_transform(
                   generate_series(1, len(ea.v)),
                   i -> ea.v[i] * eb.v[i])) / (na.n * nb.n), 6) AS cos
        FROM a1 a
        JOIN a1 b ON a.c = b.c AND a.vec_id < b.vec_id
        JOIN emb ea ON ea.vec_id = a.vec_id
        JOIN emb eb ON eb.vec_id = b.vec_id
        JOIN nrm na ON na.vec_id = a.vec_id
        JOIN nrm nb ON nb.vec_id = b.vec_id
    ),
    witness AS (
        SELECT hi AS vec_id, MAX(cos) AS max_cos FROM pairs GROUP BY hi
    )"""


@register(
    "semdedup_prune",
    oracle=f"""
    WITH {_SEM_DUCK_CTES}
    SELECT a1.vec_id, a1.c AS cluster,
           ROUND(COALESCE(w.max_cos, -1.0), 6) AS max_cos_earlier,
           COALESCE(w.max_cos, -1.0) < {SEM_TAU} AS keep
    FROM a1 LEFT JOIN witness w ON w.vec_id = a1.vec_id
    ORDER BY a1.vec_id
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning: one deterministic cluster assignment
    (centroids = the first {K} vectors, the queries/clustering.py init),
    then within each cluster drop every vector whose cosine to ANY
    lower-id cluster-mate reaches {SEM_TAU}.  Output: every vector with
    its cluster, the max cosine to an earlier cluster-mate (-1 when it
    has none), and the keep verdict.

    "Earlier id wins" replaces the paper's random keep policy so both
    engines agree exactly; the drop *rate* is identical.  Assignment is
    broadcast math; the only shuffle is the per-cluster self-join, whose
    quadratic term is bounded by cluster population (K scales with the
    corpus at 100 TB, keeping blocks constant-size)."""
    emb = _emb_double(spark, sf_dir)
    # deterministic centroid init (first K vectors) is a trained
    # model-sized value: staged once per (session, dataset) like the PQ
    # codebooks / k-means centroids (r13 multi-action sweep -- was one
    # bounded collect job per call)
    from wsu_cpts_415_spark.ops.staging import staged_model

    cents = staged_model(
        spark,
        "semdedup_centroids",
        sf_dir,
        lambda: [
            (int(r["c"]), list(r["v"]))
            for r in emb.filter(F.col("vec_id") < K)
            .select(F.col("vec_id").cast("int").alias("c"), "v")
            .collect()
        ],
    )
    if not cents:
        # empty corpus: no centroids to assign against -- empty result
        # with the normal schema (round-10 empty-slice totality)
        return emb.select(
            "vec_id",
            F.lit(0).cast("int").alias("cluster"),
            F.lit(-1.0).alias("max_cos_earlier"),
            F.lit(True).alias("keep"),
        )
    assigned = emb.select(
        "vec_id",
        "v",
        F.expr(_assign_expr(sorted(cents))).getField("c").alias("cluster"),
        F.expr(
            "sqrt(aggregate(transform(v, x -> x * x),"
            " cast(0 as double), (acc, x) -> acc + x))"
        ).alias("nrm"),
    )
    a = assigned.select(
        F.col("vec_id").alias("lo"),
        F.col("cluster").alias("c"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        F.col("vec_id").alias("hi"),
        F.col("cluster").alias("c"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "c")
        .filter(F.col("lo") < F.col("hi"))
        .select(
            "hi",
            F.round(
                F.expr(
                    "aggregate(zip_with(va, vb, (x, y) -> x * y),"
                    " cast(0 as double), (acc, x) -> acc + x)"
                )
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
    )
    witness = pairs.groupBy(F.col("hi").alias("vec_id")).agg(
        F.max("cos").alias("max_cos")
    )
    return (
        assigned.join(witness, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.round(F.coalesce("max_cos", F.lit(-1.0)), 6).alias(
                "max_cos_earlier"
            ),
            (F.coalesce("max_cos", F.lit(-1.0)) < SEM_TAU).alias("keep"),
        )
        .orderBy("vec_id")
    )


@register(
    "levenshtein_blocked_pairs",
    oracle=f"""
    WITH blocked AS (
        SELECT doc_id, lang,
               CAST(n_chars // {LEV_BLOCK_CHARS} AS BIGINT) AS blk,
               string_split(text, ' ')[1] AS tok0,
               COALESCE(string_split(text, ' ')[2], '') AS tok1,
               substr(text, 1, {LEV_PREFIX}) AS prefix
        FROM documents
    )
    SELECT a.lang, a.blk,
           a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.prefix, b.prefix) AS INT) AS dist
    FROM blocked a
    JOIN blocked b
      ON a.lang = b.lang AND a.blk = b.blk AND a.tok0 = b.tok0
     AND a.tok1 = b.tok1
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= {LEV_MAX_DIST}
    ORDER BY a.lang, a.blk, doc_a, doc_b
    """,
)
def levenshtein_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance candidate pairs under (language, length-bucket,
    first-two-tokens) blocking: prefix-{LEV_PREFIX} Levenshtein <=
    {LEV_MAX_DIST} within a block, doc_a < doc_b.  The Spark side uses
    the three-argument ``levenshtein(a, b, threshold)`` (banded DP that
    abandons once the distance provably exceeds the threshold, returning
    -1) -- the filter keeps 0..{LEV_MAX_DIST}, which is exactly the
    oracle's unbounded ``levenshtein <= {LEV_MAX_DIST}`` result set.

    The join is a plain shuffle on the block key.  The leading tokens
    are the load-bearing blocking component: their cardinality GROWS
    with the corpus (vocabulary), so block populations -- and the
    per-block quadratic term -- stay bounded as the corpus scales,
    where a fixed-cardinality (lang, length) key alone degrades
    quadratically (measured 53 s vs 0.7 s at sf0.1).  The key was
    extended from one leading token to two in round 9 after the x100
    probe measured the one-token key SATURATING (26.5M candidate pairs,
    max block 7.4M; ``blocking_key_extension_audit`` priced +tok1 at
    37x fewer candidates) -- the exact dial SCALE.md lesson #7
    prescribes; ``er_blocking_recall_audit`` quantifies the recall each
    key keeps against exact near-dup ground truth.  Production stacks
    several such passes with different keys to recover blocking misses
    (standard multi-pass record linkage, Christen 2012)."""
    return lev_candidates(spark, sf_dir).select(
        "lang", "blk", "doc_a", "doc_b", "dist"
    ).orderBy("lang", "blk", "doc_a", "doc_b")


def lev_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance candidates with per-side lengths:
    (lang, blk, doc_a, doc_b, dist, len_a, len_b).  Durably staged
    (fingerprint-keyed parquet, round 11) -- the banded DP is the
    dominant cost, both the registered pair query and the
    entity-resolution scorer (queries/er_scoring.py) consume the
    identical table, and a restarted session reads it instead of
    re-running the DP."""
    from wsu_cpts_415_spark.ops.staging import staged_table

    return staged_table(
        spark,
        "lev_candidates",
        sf_dir,
        lambda: _lev_candidates(spark, sf_dir),
        salt=f"pfx{LEV_PREFIX}:blk{LEV_BLOCK_CHARS}:d{LEV_MAX_DIST}",
        expect_cols=[
            "lang", "blk", "doc_a", "doc_b", "dist", "len_a", "len_b",
        ],
    )


def _lev_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blocked = docs.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LEV_BLOCK_CHARS).cast("bigint").alias("blk"),
        F.split("text", " ").getItem(0).alias("tok0"),
        # F.get (NOT getItem): under ANSI mode getItem(1) THROWS
        # INVALID_ARRAY_INDEX on a one-token doc where get() yields
        # NULL (caught by tests/test_er_blocking.py); the coalesce then
        # blocks the missing token as '' on both engines, matching the
        # oracle's COALESCE(string_split(...)[2], '') -- plain equality
        # on a NULL would silently drop the doc from every candidate
        F.coalesce(F.get(F.split("text", " "), 1), F.lit("")).alias("tok1"),
        F.substring("text", 1, LEV_PREFIX).alias("prefix"),
        F.col("n_chars").alias("len_chars"),
    )
    a = blocked.select(
        "lang",
        "blk",
        "tok0",
        "tok1",
        F.col("doc_id").alias("doc_a"),
        F.col("prefix").alias("pa"),
        F.col("len_chars").alias("len_a"),
    )
    b = blocked.select(
        "lang",
        "blk",
        "tok0",
        "tok1",
        F.col("doc_id").alias("doc_b"),
        F.col("prefix").alias("pb"),
        F.col("len_chars").alias("len_b"),
    )
    dist = F.levenshtein(F.col("pa"), F.col("pb"), LEV_MAX_DIST)
    return (
        a.join(b, ["lang", "blk", "tok0", "tok1"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "lang",
            "blk",
            "doc_a",
            "doc_b",
            dist.alias("dist"),
            "len_a",
            "len_b",
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= LEV_MAX_DIST))
        .select(
            "lang",
            "blk",
            "doc_a",
            "doc_b",
            F.col("dist").cast("int").alias("dist"),
            "len_a",
            "len_b",
        )
    )
