"""Second wave of similarity operators: SimHash near-dup PAIRS (banded,
the scale path) and IVF-style ANN (coarse quantizer -> probe -> exact
rerank).

Completes the dedup/similarity matrix mandated alongside SURVEY.md §2:
``simhash_fingerprints`` produces the sketch; ``simhash_hamming_pairs``
turns it into near-duplicate detection without an O(n^2) cross join.
``ann_lsh_bucketed`` prunes by hash bucket; ``ann_ivf_probe`` prunes by
nearest coarse centroid (the IVF pattern behind FAISS-style indexes),
with centroids computed distributively from the data itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.queries.similarity import _DUCK_H32, _QUERY_VEC_ID, TOP_K
from wsu_cpts_415_spark.registry import register

HAMMING_MAX = 3  # near-dup threshold on 32-bit simhash
N_SIM_BANDS = 4  # 8 bits per band; ham <= 3 cannot change all 4 bands
N_PROBE = 2  # IVF: number of coarse cells searched

# Brute-force pair definition as a reusable CTE chain ending in
# ``sim_pairs(doc_a, doc_b, hamming)`` (composed by the registered pair
# query and the multi-method consensus query).  CTE names are sim_-prefixed
# so the chain composes with LSH_PAIRS_DUCK_CTES in one WITH clause.
SIMHASH_PAIRS_DUCK_CTES = f"""sim_tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    sim_bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ({_DUCK_H32.format(x='t')} >> b) % 2 = 1
                        THEN 1 ELSE -1 END) AS s
        FROM sim_tok, UNNEST(generate_series(0, 31)) AS u(b)
        GROUP BY doc_id, b
    ),
    sim_sh AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM sim_bits
        GROUP BY doc_id
    ),
    sim_pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sim_sh a JOIN sim_sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    )"""


def simhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-staged near-dup pair table by SimHash banding -- shared by
    the registered pair query and the multi-method consensus, so the
    banding self-join runs once per session+dataset (see
    similarity.lsh_verified_pairs for the staging rationale)."""
    from wsu_cpts_415_spark.ops.staging import staged

    return staged(
        spark,
        "simhash_banded_pairs",
        sf_dir,
        lambda: _simhash_banded_pairs(spark, sf_dir),
    )


def _simhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered near-duplicate pair table (doc_a, doc_b, hamming) by
    SimHash Hamming distance <= {HAMMING_MAX}, found by BANDING instead
    of an all-pairs join: the 32-bit fingerprint splits into
    {N_SIM_BANDS} x 8-bit bands, and by pigeonhole any pair within
    distance {HAMMING_MAX} agrees on at least one whole band -- so
    candidates are exactly the pairs sharing (band_index, band_value),
    an equi-join.

    Scale: the shuffle key is (band, band_value); each doc emits
    {N_SIM_BANDS} rows of (key, doc_id, simhash).  Candidate
    verification is a bit_count on a 64-bit int.  Hot buckets (constant
    band values from boilerplate text) would be salted or capped in
    production; fingerprints here are near-uniform."""
    from wsu_cpts_415_spark.queries.similarity import simhash_staged

    sig = simhash_staged(spark, sf_dir)  # (doc_id, simhash), session-cached
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_SIM_BANDS - 1}),"
                f" b -> named_struct('band', b,"
                f" 'val', pmod(shiftright(simhash, b * 8), 256)))"
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.val")
    a = bands.alias("a")
    b = bands.alias("b")
    # hamming is computed and filtered BEFORE the dedup so the distinct
    # (a pair can collide in several bands) shuffles only surviving pairs
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.expr("a.simhash ^ b.simhash"))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )


@register(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH {SIMHASH_PAIRS_DUCK_CTES}
    SELECT doc_a, doc_b, hamming FROM sim_pairs
    ORDER BY hamming, doc_a, doc_b
    """,
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``simhash_banded_pairs``; the DuckDB oracle is
    the brute-force O(n^2) definition, proving the banded plan loses no
    pairs."""
    return simhash_banded_pairs(spark, sf_dir).orderBy(
        "hamming", "doc_a", "doc_b"
    )


_DUCK_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)
_SPARK_COS = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate({a}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    " * sqrt(aggregate({b}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))"
)


@register(
    "cosine_topk_pandas",
    oracle=f"""
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        WHERE vec_id = {_QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           ROUND({_DUCK_COS.format(a="CAST(e.embedding AS DOUBLE[])", b="q.qv")},
                 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> {_QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k via a VECTORIZED Pandas UDF -- the Arrow
    path for when distance math outgrows SQL expressions (learned
    metrics, quantized codes).  Must return byte-identical results to
    ``cosine_topk_bruteforce`` (same oracle).

    The batch computes one numpy matmul per Arrow batch (rows x dim @
    dim), not a Python loop per row; the query vector is a bounded
    one-row lookup baked into the UDF closure (broadcast with the task,
    NOT re-read per batch).  Still one scan, no shuffle, top-k via
    TakeOrderedAndProject."""
    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings")
    # the one-row query-vector lookup is a pure function of the dataset:
    # staged once per (session, dataset) -- was one driver action (scan +
    # first()) per call (r13 multi-action sweep)
    from wsu_cpts_415_spark.ops.staging import staged_model

    qrow = staged_model(
        spark,
        "cosine_query_vec",
        sf_dir,
        lambda: (
            emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
            .select("embedding")
            .first()
        ),
    )
    if qrow is None:
        # absent query vector: empty result, same as the brute-force
        # sibling's empty broadcast side (and the oracle's zero rows)
        return (
            emb.select("vec_id", "label", F.lit(0.0).alias("cosine"))
            .limit(0)
        )
    qv = np.asarray(qrow[0], dtype=np.float64)
    q_norm = float(np.sqrt((qv * qv).sum()))

    @pandas_udf("double")
    def cos(col: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        dots = mat @ qv
        norms = np.sqrt((mat * mat).sum(axis=1))
        return pd.Series(dots / (norms * q_norm))

    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        # a NULL embedding has no cosine: drop before the numpy stack
        # (np.stack throws on a ragged batch; JVM paths get this free)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "label", F.round(cos("embedding"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


@register(
    "ann_ivf_probe",
    oracle=f"""
    WITH dims AS (
        SELECT label,
               generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings
    ),
    cent AS (
        SELECT label, list(av ORDER BY pos) AS cv
        FROM (SELECT label, pos, AVG(v) AS av FROM dims GROUP BY label, pos)
        GROUP BY label
    ),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        WHERE vec_id = {_QUERY_VEC_ID}
    ),
    probe AS (
        SELECT c.label FROM cent c, q
        ORDER BY {_DUCK_COS.format(a="c.cv", b="q.qv")} DESC, c.label
        LIMIT {N_PROBE}
    )
    SELECT e.vec_id, e.label,
           ROUND({_DUCK_COS.format(a="CAST(e.embedding AS DOUBLE[])", b="q.qv")},
                 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> {_QUERY_VEC_ID}
      AND e.label IN (SELECT label FROM probe)
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (here: the ``label`` column as
    the cell assignment, centroid = elementwise mean of the cell) maps
    the query to its nearest N_PROBE cells; exact cosine reranking runs
    only inside those cells.

    Scale: centroid computation is posexplode -> (cell, dim) average --
    one shuffle of n_vectors * dim skinny rows, the standard distributed
    k-means step.  The centroid table is cells-sized (broadcast); the
    probed-cell filter prunes the fact scan BEFORE distance math, and at
    scale the table would be partitioned by cell so pruning is physical.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).withColumnsRenamed({"pos": "pos", "col": "v"})
    cent = (
        dims.groupBy("label", "pos")
        .agg(F.avg("v").alias("av"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, av))), x -> x.av)"
            ).alias("cv")
        )
    )
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "label",
            F.expr(_SPARK_COS.format(a="cv", b="qv")).alias("cent_cos"),
        )
        .orderBy(F.col("cent_cos").desc(), "label")
        .limit(N_PROBE)
        .select("label")
    )
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(probe), "label", "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(F.expr(_SPARK_COS.format(a="embedding", b="qv")), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


@register(
    "embedding_center_groups",
    oracle="""
    WITH dims AS (
        SELECT vec_id, label,
               generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings
    ),
    centered AS (
        SELECT vec_id, label,
               v - AVG(v) OVER (PARTITION BY label, pos) AS cv
        FROM dims
    )
    SELECT vec_id, label,
           ROUND(sqrt(SUM(cv * cv)), 6) AS centered_norm
    FROM centered
    GROUP BY vec_id, label
    ORDER BY vec_id
    """,
)
def embedding_center_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per label cell, subtract the cell
    centroid from every member vector and return each vector's centered
    L2 norm -- the whitening step before per-cluster similarity search.

    This is the one UDF form the engine hadn't exercised (mapInPandas
    covers per-partition, applyInPandasWithState covers stateful
    streaming): groupBy(label) routes each cell to one worker as a
    pandas DataFrame, the centroid subtraction is one vectorized numpy
    pass, and the output schema is declared up front.  Scale: state is
    one cell's vectors, bounded by the coarse-quantizer fanout -- the
    same per-group memory contract as collect_list (SURVEY.md §7.3),
    acceptable because cells are capacity-bounded by construction."""
    emb = load_table(spark, sf_dir, "embeddings")

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        centered = mat - mat.mean(axis=0, keepdims=True)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "centered_norm": np.round(
                    np.sqrt((centered * centered).sum(axis=1)), 6
                ),
            }
        )

    return (
        emb.select("vec_id", "label", "embedding")
        # rows missing the vector or the group key drop before the
        # pandas kernel: a NULL vector makes np.stack ragged, and a
        # NULL-label group's key column would Arrow-infer as null type
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .groupBy("label")
        .applyInPandas(center, "vec_id long, label int, centered_norm double")
        .orderBy("vec_id")
    )


NEARDUP_JACCARD = 0.5  # same cut as graph_ops.NEARDUP_THRESHOLD

from wsu_cpts_415_spark.queries.similarity import LSH_PAIRS_DUCK_CTES  # noqa: E402

_CONSENSUS_ORACLE = f"""
    WITH {LSH_PAIRS_DUCK_CTES},
    {SIMHASH_PAIRS_DUCK_CTES},
    mh AS (SELECT * FROM lsh_pairs WHERE jaccard >= {NEARDUP_JACCARD})
    SELECT COALESCE(m.doc_a, s.doc_a) AS doc_a,
           COALESCE(m.doc_b, s.doc_b) AS doc_b,
           m.jaccard IS NOT NULL AS by_minhash,
           s.hamming IS NOT NULL AS by_simhash,
           m.jaccard,
           s.hamming
    FROM mh m
    FULL OUTER JOIN sim_pairs s
      ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b
    ORDER BY doc_a, doc_b
    """



@register(
    "neardup_consensus_pairs",
    oracle=_CONSENSUS_ORACLE,
)
def neardup_consensus_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-method dedup consensus: the union of MinHash-LSH verified
    pairs (exact Jaccard >= 0.5) and SimHash banded pairs (Hamming <= 3),
    full-outer-joined so every pair carries which detector(s) fired and
    both scores where available.  Production dedup runs exactly this
    cross-check -- sketch families have disjoint blind spots (MinHash
    sees shingle-set overlap, SimHash weighted token profiles), and the
    disagreement rows are the tuning signal for thresholds.

    Scale: both inputs are already bucketed pair tables (no new
    all-pairs work); the full outer join keys on (doc_a, doc_b) -- pair
    ids only, never text."""
    from wsu_cpts_415_spark.queries.similarity import lsh_verified_pairs

    mh = lsh_verified_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= NEARDUP_JACCARD
    )
    sh_pairs = simhash_banded_pairs(spark, sf_dir)
    joined = mh.alias("m").join(
        sh_pairs.alias("s"),
        (F.col("m.doc_a") == F.col("s.doc_a"))
        & (F.col("m.doc_b") == F.col("s.doc_b")),
        "full",
    )
    return joined.select(
        F.coalesce("m.doc_a", "s.doc_a").alias("doc_a"),
        F.coalesce("m.doc_b", "s.doc_b").alias("doc_b"),
        F.col("m.jaccard").isNotNull().alias("by_minhash"),
        F.col("s.hamming").isNotNull().alias("by_simhash"),
        "m.jaccard",
        "s.hamming",
    ).orderBy("doc_a", "doc_b")


@register(
    "hard_negative_mining",
    oracle="""
    WITH queries AS (
        SELECT vec_id AS qid, embedding AS qv, label AS qlabel
        FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 2000
    ),
    scored AS (
        SELECT q.qid, q.qlabel, e.vec_id AS neg_id, e.label AS neg_label,
               ROUND(
                   list_aggregate(list_transform(
                       generate_series(1, len(e.embedding)),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(q.qv[i] AS DOUBLE)), 'sum')
                   / (SQRT(list_aggregate(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * SQRT(list_aggregate(list_transform(q.qv,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                   6) AS sim
        FROM queries q JOIN embeddings e
          ON e.label <> q.qlabel
    ),
    ranked AS (
        SELECT qid, qlabel, neg_id, neg_label, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY sim DESC, neg_id
               ) AS rn
        FROM scored
    )
    SELECT qid, qlabel, neg_id, neg_label, sim
    FROM ranked WHERE rn = 1
    ORDER BY qid
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: for each query vector (a
    deterministic FIXED-SIZE id-sample -- bounded by id range, so the
    batch does not grow with the corpus), the most cosine-similar vector
    carrying a DIFFERENT label -- the near-miss a contrastive loss learns most
    from (public recipe: e.g. DPR / SimCSE negative mining).

    Scale: the bounded query batch BROADCASTS and the corpus streams
    past it map-side (one scan, no corpus shuffle); per-query top-1 is a
    qid-partitioned rank (WindowGroupLimit prunes).  For unbounded query
    sets the production path swaps the broadcast for the LSH-bucketed
    candidate join (``ann_lsh_bucketed``), same scoring expression."""
    # r12: per-vector norms are computed ONCE per side BEFORE the join
    # (guide §1.2) -- the interpreted higher-order aggregate lambdas ran
    # three times per (query, negative) pair (dot + both norms) where
    # one suffices: sqrt(sum(x^2)) per corpus row and per query row are
    # pair-invariant.  Same expressions, same float op order, so the
    # rounded sim is bit-identical; per-pair HOF work drops ~3x.
    norm = (
        "sqrt(aggregate({c}, 0D,"
        " (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "e_norm", F.expr(norm.format(c="embedding"))
    )
    queries = emb.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
        F.expr(norm.format(c="embedding")).alias("q_norm"),
    )
    cos = (
        "aggregate(zip_with(embedding, qv,"
        " (x, y) -> cast(x as double) * cast(y as double)), 0D,"
        " (acc, v) -> acc + v)"
        " / (e_norm * q_norm)"
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "qlabel",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(F.expr(cos), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "neg_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "qlabel", "neg_id", "neg_label", "sim")
        .orderBy("qid")
    )


@register(
    "matryoshka_recall_audit",
    oracle="""
    WITH queries AS (
        SELECT vec_id AS qid, embedding AS qv
        FROM embeddings WHERE vec_id % 250 = 0 AND vec_id < 4000
    ),
    scored AS (
        SELECT q.qid, e.vec_id,
               ROUND(
                   list_aggregate(list_transform(
                       generate_series(1, len(e.embedding)),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(q.qv[i] AS DOUBLE)), 'sum')
                   / (SQRT(list_aggregate(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * SQRT(list_aggregate(list_transform(q.qv,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                   6) AS sim_full,
               ROUND(
                   list_aggregate(list_transform(
                       generate_series(1, 16),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(q.qv[i] AS DOUBLE)), 'sum')
                   / (SQRT(list_aggregate(list_transform(e.embedding[1:16],
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * SQRT(list_aggregate(list_transform(q.qv[1:16],
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
                   6) AS sim_trunc
        FROM queries q JOIN embeddings e ON e.vec_id <> q.qid
    ),
    ranked AS (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim_full DESC, vec_id) AS r_full,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim_trunc DESC, vec_id) AS r_trunc
        FROM scored
    )
    SELECT qid,
           CAST(COUNT(CASE WHEN r_full <= 10 AND r_trunc <= 10 THEN 1 END)
                AS BIGINT) AS hits,
           ROUND(COUNT(CASE WHEN r_full <= 10 AND r_trunc <= 10 THEN 1 END)
                 / 10.0, 2) AS recall_at_10
    FROM ranked
    GROUP BY qid
    ORDER BY qid
    """,
)
def matryoshka_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension ablation (Kusupati et al. 2022,
    public): how much of the full-dimension cosine top-10 survives when
    similarity uses only the first 16 of 64 dimensions -- the recall
    cost of serving truncated embeddings (cheaper storage/ANN) measured
    per query.

    Scale: the bounded query batch broadcasts; both similarity columns
    come from the SAME corpus scan (one pass, two folds per row); the
    per-query ranks are qid-partitioned windows over |Q| x N score
    rows.  Raw embeddings shuffle only within the score sliver."""
    # r12: pair-invariant norms (full + 16-dim, both sides) hoisted out
    # of the |Q| x N join into per-row columns, same trick as
    # hard_negative_mining -- the interpreted fold per pair drops from
    # 6 aggregates to the 2 dots; identical expressions and float
    # order, so the rounded sims are bit-identical.
    def norm_of(c: str, dims: int | None) -> str:
        v = c if dims is None else f"slice({c}, 1, {dims})"
        return (
            f"sqrt(aggregate({v}, 0D,"
            " (acc, x) -> acc + cast(x as double) * cast(x as double)))"
        )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("e_nf", F.expr(norm_of("embedding", None)))
        .withColumn("e_nt", F.expr(norm_of("embedding", 16)))
    )
    queries = emb.filter(
        (F.col("vec_id") % 250 == 0) & (F.col("vec_id") < 4000)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("e_nf").alias("q_nf"),
        F.col("e_nt").alias("q_nt"),
    )

    def cos(dims: int | None, norms: str) -> str:
        v = "embedding" if dims is None else f"slice(embedding, 1, {dims})"
        qq = "qv" if dims is None else f"slice(qv, 1, {dims})"
        return (
            f"round(aggregate(zip_with({v}, {qq},"
            " (x, y) -> cast(x as double) * cast(y as double)), 0D,"
            f" (acc, w) -> acc + w) / {norms}, 6)"
        )

    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(cos(None, "(e_nf * q_nf)")).alias("sim_full"),
            F.expr(cos(16, "(e_nt * q_nt)")).alias("sim_trunc"),
        )
    )
    w_full = Window.partitionBy("qid").orderBy(F.col("sim_full").desc(), "vec_id")
    w_trunc = Window.partitionBy("qid").orderBy(
        F.col("sim_trunc").desc(), "vec_id"
    )
    ranked = scored.select(
        "qid",
        "vec_id",
        F.row_number().over(w_full).alias("r_full"),
        F.row_number().over(w_trunc).alias("r_trunc"),
    )
    hit = F.when((F.col("r_full") <= 10) & (F.col("r_trunc") <= 10), 1)
    return (
        ranked.groupBy("qid")
        .agg(
            F.count(hit).alias("hits"),
            F.round(F.count(hit) / 10.0, 2).alias("recall_at_10"),
        )
        .orderBy("qid")
    )


@register(
    "lsh_tuning_curves",
    oracle="""
    WITH configs AS (
        SELECT * FROM (VALUES (2, 4), (4, 2), (8, 1)) AS c(n_bands, rows_per_band)
    ),
    grid AS (
        SELECT CAST(s AS BIGINT) AS sim_pct
        FROM UNNEST(generate_series(10, 90, 10)) AS t(s)
    )
    SELECT c.n_bands, c.rows_per_band, g.sim_pct,
           ROUND(1 - POWER(1 - POWER(g.sim_pct / 100.0, c.rows_per_band),
                           c.n_bands), 6) AS collision_prob
    FROM configs c CROSS JOIN grid g
    ORDER BY c.n_bands, g.sim_pct
    """,
)
def lsh_tuning_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH s-curve planning table: candidate-collision
    probability 1-(1-s^r)^b over a Jaccard grid for the (bands, rows)
    splits of an 8-hash signature -- the tuning artifact behind this
    engine's b=4, r=2 choice (steep rise around the 0.5 near-dup
    threshold).  Pure closed-form math evaluated identically by both
    engines; no data is read, which is exactly the point: band tuning
    is decided BEFORE the corpus-sized job runs.

    Scale: 27 rows of arithmetic."""
    configs = spark.createDataFrame(
        [(2, 4), (4, 2), (8, 1)], "n_bands int, rows_per_band int"
    )
    grid = spark.range(1, 10).select(
        (F.col("id") * 10).cast("bigint").alias("sim_pct")
    )
    return (
        configs.crossJoin(grid)
        .select(
            "n_bands",
            "rows_per_band",
            "sim_pct",
            F.round(
                1
                - F.pow(
                    1
                    - F.pow(F.col("sim_pct") / 100.0, F.col("rows_per_band")),
                    F.col("n_bands"),
                ),
                6,
            ).alias("collision_prob"),
        )
        .orderBy("n_bands", "sim_pct")
    )
