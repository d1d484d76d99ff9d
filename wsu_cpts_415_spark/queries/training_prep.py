"""Training-data preparation operators, round 4: importance resampling,
content-defined chunking, calibration lift, and exact-quantile surfaces.

Engine extensions beyond the reference (whose data-prep surface is the
filter/aggregate stage, analyze_links.py:133-171); these are the standard
pre-training corpus steps a 100 TB pipeline runs after dedup/quality:

  * ``dsir_importance_weights``   -- DSIR-style (Xie et al., NeurIPS 2023,
    public paper) hashed-n-gram importance weights: score every document
    by how target-like its token distribution is, using bucketed unigram
    features and a log-likelihood ratio between a target slice and the
    raw corpus.
  * ``cdc_chunk_boundaries``      -- content-defined chunking: split each
    document at positions where the rolling 3-gram hash hits a boundary
    pattern (the FastCDC/rsync idea, public), so chunk edges survive
    insertions -- the substring-dedup complement to whole-doc hashing.
  * ``quality_lift_deciles``      -- calibration lift: bucket documents
    into per-language score deciles and measure how strongly the score
    separates exact-duplicate documents (lift over the language base
    rate) -- the standard check before trusting a filter score.
  * ``quantile_binning``          -- per-language ntile(10) feature
    discretization of doc length with per-bin ranges (feature prep for
    downstream models; also the binning step behind the lift query).
  * ``percentile_disc_median``    -- exact continuous AND discrete
    medians per language, the two percentile semantics engines must not
    conflate (disc is materialized explicitly via row-selection so both
    engines share one definition).

Scale design (100 TB posture):

  * DSIR is two-pass by construction: pass 1 aggregates token buckets to
    a 256-row ratio table (map-side partial aggs; the shuffle carries
    256 keys), pass 2 broadcasts that table onto the token stream -- no
    shuffle of documents, no driver collect.
  * CDC is a pure per-row array expression (tokens never explode into
    rows); the only shuffle is the |sources|-row final rollup.
  * Lift/binning windows are PARTITIONED by language -- no global
    ntile/percent_rank (the W2 hazard); each partition sorts
    independently.
  * The duplicate label joins on md5(text), so the equi-join shuffles
    16-byte digests, not document bodies.

Hashing is md5-derived for bit-identical Spark/DuckDB parity (same
rationale as queries/similarity.py:5-8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

N_BUCKETS = 256  # DSIR hashed-feature buckets
TARGET_LANG = "en"  # DSIR target slice
CDC_MASK = 16  # boundary when 3-gram hash % CDC_MASK == 0 (avg chunk ~16)

_SPARK_H32 = "cast(conv(substr(md5({x}), 1, 8), 16, 10) as bigint)"
_DUCK_H32 = "(('0x' || substr(md5({x}), 1, 8))::BIGINT)"


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               {_DUCK_H32.format(x="t.tok")} % {N_BUCKETS} AS bucket
        FROM documents, LATERAL UNNEST(string_split(text, ' ')) AS t(tok)
    ),
    dist AS (
        SELECT bucket,
               CAST(COUNT(*) FILTER (WHERE lang = '{TARGET_LANG}') AS BIGINT)
                   AS n_target,
               CAST(COUNT(*) AS BIGINT) AS n_raw
        FROM toks GROUP BY bucket
    ),
    totals AS (
        SELECT SUM(n_target) AS tot_target, SUM(n_raw) AS tot_raw FROM dist
    ),
    ratio AS (
        SELECT bucket,
               LN((n_target + 1.0) / (tot_target + {N_BUCKETS}.0))
             - LN((n_raw + 1.0) / (tot_raw + {N_BUCKETS}.0)) AS log_ratio
        FROM dist, totals
    ),
    per_doc AS (
        SELECT toks.doc_id, toks.lang,
               ROUND(SUM(ratio.log_ratio), 5) AS log_w
        FROM toks JOIN ratio USING (bucket)
        GROUP BY toks.doc_id, toks.lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(log_w), 3) AS avg_log_w,
           ROUND(MIN(log_w), 5) AS min_log_w,
           ROUND(MAX(log_w), 5) AS max_log_w
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: hashed unigram features (md5 ->
    {N_BUCKETS} buckets), Laplace-smoothed bucket distributions for the
    target slice (lang='{TARGET_LANG}') vs the raw corpus, per-document
    log importance weight = sum of per-token log ratios, rolled up per
    language (the sanity view: target-language docs should score high).

    Scale: pass 1 reduces the corpus to a {N_BUCKETS}-row ratio table
    (partial aggregation map-side; the shuffle moves {N_BUCKETS} keys);
    pass 2 BROADCASTS the ratio table onto the token stream, so no
    document-sized row ever shuffles.  The per-doc aggregate shuffles
    (doc_id, partial-sum) pairs -- the same cardinality any tokenizer
    stage already moves.  The hashed token stream is session-staged so
    the md5-per-token cost is paid once across both passes (the
    pipeline form: write the tokenized-features table once, select from
    it many times; recomputing instead is a pure space/time knob)."""
    docs = load_table(spark, sf_dir, "documents")

    def _token_buckets():
        return docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
        ).select(
            "doc_id",
            "lang",
            (F.expr(_SPARK_H32.format(x="tok")) % N_BUCKETS).alias("bucket"),
        )

    # session-stage the hashed token stream: BOTH passes (distribution
    # and scoring) and repeated calls read it, so the md5-per-token cost
    # is paid once -- the local analogue of a pipeline writing its
    # tokenized-features table once and running many selections over it.
    from wsu_cpts_415_spark.ops.staging import staged

    toks = staged(spark, "dsir_token_buckets", sf_dir, _token_buckets)
    dist = toks.groupBy("bucket").agg(
        F.count(F.when(F.col("lang") == TARGET_LANG, 1)).alias("n_target"),
        F.count("*").alias("n_raw"),
    )
    totals = dist.agg(
        F.sum("n_target").alias("tot_target"), F.sum("n_raw").alias("tot_raw")
    )
    ratio = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("n_target") + 1.0) / (F.col("tot_target") + float(N_BUCKETS)))
            - F.log((F.col("n_raw") + 1.0) / (F.col("tot_raw") + float(N_BUCKETS)))
        ).alias("log_ratio"),
    )
    per_doc = (
        toks.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum("log_ratio"), 5).alias("log_w"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("log_w"), 3).alias("avg_log_w"),
            F.round(F.min("log_w"), 5).alias("min_log_w"),
            F.round(F.max("log_w"), 5).alias("max_log_w"),
        )
        .orderBy("lang")
    )


@register(
    "cdc_chunk_boundaries",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS tk
        FROM documents
    ),
    cdc AS (
        SELECT doc_id, source,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(
                   generate_series(3, len(tk)),
                   i -> {_DUCK_H32.format(
                       x="tk[i - 2] || ' ' || tk[i - 1] || ' ' || tk[i]")}
                        % {CDC_MASK} = 0
               )) + 1 AS BIGINT) AS n_chunks
        FROM toks
    )
    SELECT source,
           CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
           ROUND(AVG(n_chunks), 4) AS avg_chunks_per_doc,
           ROUND(SUM(n_tokens) * 1.0 / SUM(n_chunks), 4) AS avg_chunk_tokens
    FROM cdc
    GROUP BY source
    ORDER BY source
    """,
)
def cdc_chunk_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking census: a chunk boundary falls after
    token i when the hash of the 3-gram ending at i satisfies
    ``h % {CDC_MASK} == 0`` (expected chunk length {CDC_MASK} tokens).
    Because the boundary decision depends only on a local window, edits
    shift chunk contents, not every downstream boundary -- the property
    that makes CDC the right unit for substring-level dedup at scale.

    Scale: boundaries are computed as a per-row array expression (tokens
    stay inside their row; nothing explodes); the only shuffle is the
    |sources|-row rollup.  The staged ``tk`` column evaluates split()
    once per row (same staging lesson as queries/similarity.py)."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", "source", F.split("text", " ").alias("tk"))
    gram = (
        "concat(element_at(tk, i - 2), ' ', element_at(tk, i - 1), ' ',"
        " element_at(tk, i))"
    )
    cdc = tk.select(
        "source",
        F.expr("cast(size(tk) as bigint)").alias("n_tokens"),
        # CASE guard: sequence(3, size) DESCENDS when size < 3 (a one-
        # or two-token doc) and element_at(tk, 3) throws under ANSI,
        # where the oracle's generate_series(3, len) is simply empty --
        # short docs have zero interior boundaries, i.e. one chunk
        # (round-10 edge-population catch, same class as _shingle_rows)
        F.expr(
            f"cast(size(filter("
            f" CASE WHEN size(tk) < 3 THEN cast(array() as array<int>)"
            f" ELSE sequence(3, size(tk)) END,"
            f" i -> {_SPARK_H32.format(x=gram)} % {CDC_MASK} = 0)) + 1 as bigint)"
        ).alias("n_chunks"),
    )
    return (
        cdc.groupBy("source")
        .agg(
            F.sum("n_chunks").alias("total_chunks"),
            F.round(F.avg("n_chunks"), 4).alias("avg_chunks_per_doc"),
            F.round(F.sum("n_tokens") / F.sum("n_chunks"), 4).alias(
                "avg_chunk_tokens"
            ),
        )
        .orderBy("source")
    )


@register(
    "quality_lift_deciles",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               n_chars * 1.0 / (1 + len(string_split(text, ' '))) AS score,
               md5(text) AS digest
        FROM documents
    ),
    dups AS (
        SELECT digest FROM scored GROUP BY digest HAVING COUNT(*) > 1
    ),
    labeled AS (
        SELECT s.doc_id, s.lang, s.score,
               CASE WHEN d.digest IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
               NTILE(10) OVER (
                   PARTITION BY s.lang ORDER BY s.score DESC, s.doc_id
               ) AS decile
        FROM scored s LEFT JOIN dups d ON s.digest = d.digest
    ),
    base AS (
        SELECT lang, AVG(is_dup) AS base_rate FROM labeled GROUP BY lang
    )
    SELECT l.lang, l.decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(l.is_dup) AS BIGINT) AS n_dups,
           ROUND(AVG(l.is_dup), 4) AS dup_rate,
           ROUND(CASE WHEN MAX(b.base_rate) > 0
                      THEN AVG(l.is_dup) / MAX(b.base_rate) ELSE 0 END, 4)
               AS lift
    FROM labeled l JOIN base b ON l.lang = b.lang
    GROUP BY l.lang, l.decile
    ORDER BY l.lang, l.decile
    """,
)
def quality_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-calibration lift: documents are ranked into per-language
    deciles by a quality heuristic (mean token length), labeled by exact
    duplication (md5(text) seen more than once), and each decile reports
    its duplicate rate as a lift over the language base rate.  A useful
    filter score concentrates duplicates in few deciles (lift >> 1).

    Scale: the decile window is PARTITIONED by language (never a global
    ntile -- the W2 hazard); the duplicate label joins on the md5 digest
    so the shuffle carries 16-byte keys, not text; the base-rate join is
    a broadcast of |languages| rows."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        (
            F.col("n_chars") * 1.0 / (1 + F.size(F.split("text", " ")))
        ).alias("score"),
        F.md5("text").alias("digest"),
    )
    dups = (
        scored.groupBy("digest").count().filter(F.col("count") > 1).select("digest")
    )
    labeled = (
        scored.join(dups.withColumn("dup_hit", F.lit(1)), "digest", "left")
        .withColumn("is_dup", F.coalesce(F.col("dup_hit"), F.lit(0)))
        .withColumn(
            "decile",
            F.ntile(10).over(
                Window.partitionBy("lang").orderBy(
                    F.col("score").desc(), F.col("doc_id")
                )
            ),
        )
    )
    base = labeled.groupBy("lang").agg(F.avg("is_dup").alias("base_rate"))
    return (
        labeled.join(F.broadcast(base), "lang")
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_dup").alias("n_dups"),
            F.round(F.avg("is_dup"), 4).alias("dup_rate"),
            F.round(
                F.when(
                    F.max("base_rate") > 0, F.avg("is_dup") / F.max("base_rate")
                ).otherwise(0.0),
                4,
            ).alias("lift"),
        )
        .orderBy("lang", "decile")
    )


@register(
    "quantile_binning",
    oracle="""
    WITH binned AS (
        SELECT lang, n_chars,
               NTILE(10) OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id
               ) AS bin
        FROM documents
    )
    SELECT lang, bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(n_chars) AS BIGINT) AS lo,
           CAST(MAX(n_chars) AS BIGINT) AS hi
    FROM binned
    GROUP BY lang, bin
    ORDER BY lang, bin
    """,
)
def quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language decile discretization of document length: each doc is
    assigned its within-language length decile, and the output is the
    bin dictionary (count + [lo, hi] range) a feature store would keep.

    Scale: ntile is partitioned by language -- each partition sorts
    independently, no global window.  (For a single giant partition the
    production path is approx-quantile boundaries + bucket join; this
    exact form is the oracle-checkable semantics.)"""
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.select(
        "lang",
        "n_chars",
        F.ntile(10)
        .over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("bin"),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
        .orderBy("lang", "bin")
    )


@register(
    "percentile_disc_median",
    oracle="""
    WITH ranked AS (
        SELECT lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ),
    disc AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS median_disc
        FROM ranked WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
    ),
    cont AS (
        SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 4) AS median_cont
        FROM documents GROUP BY lang
    )
    SELECT cont.lang, cont.median_cont, disc.median_disc
    FROM cont JOIN disc ON cont.lang = disc.lang
    ORDER BY cont.lang
    """,
)
def percentile_disc_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both median semantics side by side, per language: the continuous
    (interpolating) percentile and the discrete one.  The discrete median
    is materialized explicitly as the value at row ceil(n/2) of the
    (n_chars, doc_id) order, so Spark and DuckDB share one definition
    instead of trusting each engine's quantile_disc tie rules.

    Scale: one partitioned window pass for disc + one exact percentile
    aggregate for cont; both partition by language, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    disc = ranked.filter(
        F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint")
    ).select("lang", F.col("n_chars").cast("bigint").alias("median_disc"))
    cont = docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("median_cont")
    )
    return cont.join(disc, "lang").select(
        "lang", "median_cont", "median_disc"
    ).orderBy("lang")


@register(
    "array_hof_suite",
    oracle="""
    WITH per_vec AS (
        SELECT label,
               ROUND(SQRT(list_aggregate(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   'sum')), 5) AS l2,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
               ROUND(list_max(list_transform(
                   embedding, x -> ABS(CAST(x AS DOUBLE)))), 5) AS max_abs
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(l2), 4) AS avg_l2,
           ROUND(AVG(n_pos), 4) AS avg_n_pos,
           ROUND(MAX(max_abs), 5) AS max_max_abs
    FROM per_vec
    GROUP BY label
    ORDER BY label
    """,
)
def array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface over the embedding column:
    transform (square / abs), aggregate (fold to a sum), filter
    (positive-dimension count), array_max -- the JVM-side lambda suite
    that keeps vector math out of Python UDFs entirely.

    Scale: every expression is per-row whole-stage-codegen'd; the only
    shuffle is the |labels|-row rollup.  Double-cast before multiply
    pins float32 inputs to one promotion rule in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    per_vec = emb.select(
        "label",
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(embedding, cast(0.0 as double),"
                    " (acc, x) -> acc + cast(x as double) * cast(x as double))"
                )
            ),
            5,
        ).alias("l2"),
        F.expr("cast(size(filter(embedding, x -> x > 0)) as bigint)").alias(
            "n_pos"
        ),
        F.round(
            F.expr("array_max(transform(embedding, x -> abs(cast(x as double))))"),
            5,
        ).alias("max_abs"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("l2"), 4).alias("avg_l2"),
            F.round(F.avg("n_pos"), 4).alias("avg_n_pos"),
            F.round(F.max("max_abs"), 5).alias("max_max_abs"),
        )
        .orderBy("label")
    )


@register(
    "quantile_normalization_map",
    oracle="""
    WITH binned AS (
        SELECT source, n_chars,
               NTILE(10) OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS decile
        FROM documents
    ),
    per_src AS (
        SELECT source, decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               AVG(n_chars) AS src_mean
        FROM binned GROUP BY source, decile
    ),
    ref AS (
        SELECT decile, AVG(src_mean) AS ref_mean
        FROM per_src GROUP BY decile
    )
    SELECT p.source, p.decile, p.n,
           ROUND(p.src_mean, 4) AS src_mean,
           ROUND(r.ref_mean, 4) AS ref_mean,
           ROUND(r.ref_mean - p.src_mean, 4) AS shift
    FROM per_src p JOIN ref r ON p.decile = r.decile
    ORDER BY p.source, p.decile
    """,
)
def quantile_normalization_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization mapping table (the rank-based distribution
    alignment from microarray statistics, Bolstad et al. 2003, public):
    each source's within-source length deciles are mapped onto the
    cross-source reference distribution (the decile-wise mean of source
    means), yielding the per-(source, decile) shift that makes every
    source's length profile comparable -- the corpus-balancing sibling
    of per-feature standardization.

    Scale: the decile window is PARTITIONED by source; sources collapse
    to a |sources| x 10 mapping before the reference join, which is a
    broadcast of 10 rows.  Applying the map downstream is a broadcast
    join + arithmetic, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.select(
        "source",
        "n_chars",
        F.ntile(10)
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("decile"),
    )
    per_src = binned.groupBy("source", "decile").agg(
        F.count("*").alias("n"), F.avg("n_chars").alias("src_mean")
    )
    ref = per_src.groupBy("decile").agg(F.avg("src_mean").alias("ref_mean"))
    return (
        per_src.join(F.broadcast(ref), "decile")
        .select(
            "source",
            "decile",
            "n",
            F.round("src_mean", 4).alias("src_mean"),
            F.round("ref_mean", 4).alias("ref_mean"),
            F.round(F.col("ref_mean") - F.col("src_mean"), 4).alias("shift"),
        )
        .orderBy("source", "decile")
    )
