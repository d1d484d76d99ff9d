"""Embedding quantization: per-dimension int8 scalar quantization and its
reconstruction-error audit (engine extension; scale path for the ANN
suite in queries/similarity*.py).

Why: at 100 TB the dominant cost of embedding search is moving float32
vectors through shuffles and holding them in memory.  Per-dimension int8
scalar quantization cuts both by 4x with bounded error; the standard
recipe is min/max range per dimension, uniform 256-level grid, midpoint
dequantization.  This operator computes the codebook AND audits what the
compression does to every vector, because a quantizer you haven't
error-audited is not a production quantizer.

Determinism: the quantization code uses FLOOR (never ROUND) so both
engines land on identical codes -- floor of an IEEE double is exact, and
the only boundary case (x == dim max, grid index 256) is clamped by
LEAST to 255 in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

Q_LEVELS = 256  # int8 code space
QUERY_VEC = 0  # probe vector for the coded-search demo
RERANK_K = 10

# Shared dequantization chain (dims -> per-dim codebook -> codes ->
# midpoint reconstruction), used by both oracles below.
RECON_DUCK_CTES = f"""dims AS (
        SELECT vec_id, label,
               unnest(CAST(embedding AS DOUBLE[])) AS x,
               unnest(generate_series(0, len(embedding) - 1)) AS dim
        FROM embeddings
    ),
    stats AS (
        SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY dim
    ),
    coded AS (
        SELECT d.vec_id, d.label, d.dim, d.x, s.mn, s.mx - s.mn AS rng,
               CASE WHEN s.mx = s.mn THEN 0
                    ELSE LEAST(FLOOR((d.x - s.mn) / (s.mx - s.mn)
                                     * {Q_LEVELS}), {Q_LEVELS - 1})
               END AS code
        FROM dims d JOIN stats s USING (dim)
    ),
    recon AS (
        SELECT vec_id, label, dim, x,
               CASE WHEN rng = 0 THEN mn
                    ELSE mn + (code + 0.5) * rng / {Q_LEVELS}
               END AS xq
        FROM coded
    )"""


def _recon_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, dim, x, xq): original and int8-midpoint-dequantized
    value per vector dimension -- the Spark twin of RECON_DUCK_CTES."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    stats = dims.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    coded = dims.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "label",
        "dim",
        "x",
        "mn",
        (F.col("mx") - F.col("mn")).alias("rng"),
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("x") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * Q_LEVELS
                ),
                F.lit(Q_LEVELS - 1),
            )
        )
        .alias("code"),
    )
    return coded.select(
        "vec_id",
        "label",
        "dim",
        "x",
        F.when(F.col("rng") == 0, F.col("mn"))
        .otherwise(F.col("mn") + (F.col("code") + 0.5) * F.col("rng") / Q_LEVELS)
        .alias("xq"),
    )


@register(
    "embedding_quantize_int8",
    oracle=f"""
    WITH {RECON_DUCK_CTES}
    SELECT vec_id, label,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           ROUND(AVG((x - xq) * (x - xq)), 9) AS mse,
           ROUND(MAX(ABS(x - xq)), 6) AS max_abs_err
    FROM recon
    GROUP BY vec_id, label
    ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization with a full reconstruction
    audit: fit the 64-entry (min, max) codebook in one aggregate, code
    every value on the uniform {Q_LEVELS}-level grid, dequantize at bin
    midpoints, and report per-vector MSE and worst-dimension error.

    Scale: the codebook aggregate shuffles |dims| rows (partial
    aggregates combine map-side), then broadcasts back -- the corpus
    itself is scanned once and never shuffled until the per-vector
    rollup, which is keyed on vec_id and map-side combinable.  The
    emitted codebook is what the int8 ANN path would persist; the audit
    result is the acceptance gate for switching search to coded
    vectors."""
    recon = _recon_dims(spark, sf_dir)
    err = F.col("x") - F.col("xq")
    return (
        recon.groupBy("vec_id", "label")
        .agg(
            F.count("*").alias("n_dims"),
            F.round(F.avg(err * err), 9).alias("mse"),
            F.round(F.max(F.abs(err)), 6).alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )


@register(
    "ann_int8_topk",
    oracle=f"""
    WITH {RECON_DUCK_CTES},
    qd AS (
        SELECT dim, xq AS qxq FROM recon WHERE vec_id = {QUERY_VEC}
    ),
    scored AS (
        SELECT r.vec_id, r.label,
               ROUND(SUM(r.xq * q.qxq)
                     / (sqrt(SUM(r.xq * r.xq)) * sqrt(SUM(q.qxq * q.qxq))),
                     6) AS cos_q
        FROM recon r JOIN qd q USING (dim)
        WHERE r.vec_id <> {QUERY_VEC}
        GROUP BY r.vec_id, r.label
    ),
    top AS (
        SELECT vec_id, label, cos_q,
               CAST(ROW_NUMBER() OVER (ORDER BY cos_q DESC, vec_id) AS INT)
                   AS rnk
        FROM scored
        ORDER BY cos_q DESC, vec_id
        LIMIT {RERANK_K}
    ),
    qv AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        WHERE vec_id = {QUERY_VEC}
    )
    SELECT t.rnk, t.vec_id, t.label, t.cos_q,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_exact
    FROM top t
    JOIN embeddings e ON e.vec_id = t.vec_id
    CROSS JOIN qv q
    ORDER BY t.rnk
    """,
)
def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coded-space similarity search with exact rerank audit: cosine
    top-{RERANK_K} computed entirely on int8-dequantized vectors (the
    4x-smaller representation the quantizer above produces), with the
    float32-exact cosine attached to each winner so recall loss is
    visible in the result itself.

    Scale: the coded scan is the production read path -- 1/4 the bytes
    of the float corpus through scan and (in the IVF-combined form)
    shuffle; the query's 64 dequantized dims broadcast; the exact
    rerank touches only the {RERANK_K} winners, so full-precision
    vectors are fetched for a constant number of rows regardless of
    corpus size."""
    recon = _recon_dims(spark, sf_dir)
    qd = recon.filter(F.col("vec_id") == QUERY_VEC).select(
        "dim", F.col("xq").alias("qxq")
    )
    scored = (
        recon.filter(F.col("vec_id") != QUERY_VEC)
        .join(F.broadcast(qd), "dim")
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum(F.col("xq") * F.col("qxq"))
                / (
                    F.sqrt(F.sum(F.col("xq") * F.col("xq")))
                    * F.sqrt(F.sum(F.col("qxq") * F.col("qxq")))
                ),
                6,
            ).alias("cos_q")
        )
    )
    from pyspark.sql import Window

    top = (
        scored.orderBy(F.col("cos_q").desc(), "vec_id")
        .limit(RERANK_K)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("cos_q").desc(), "vec_id"))
            .cast("int"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    exact = (
        "aggregate(zip_with(ev, qv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
        " / (sqrt(aggregate(ev, 0D, (acc, x) -> acc + x * x))"
        " * sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x)))"
    )
    return (
        top.join(
            emb.select(
                F.col("vec_id"), F.col("embedding").cast("array<double>").alias("ev")
            ),
            "vec_id",
        )
        .crossJoin(F.broadcast(qv))
        .select(
            "rnk",
            "vec_id",
            "label",
            "cos_q",
            F.round(F.expr(exact), 6).alias("cos_exact"),
        )
        .orderBy("rnk")
    )


COV_DIMS = 8  # leading dimensions entering the covariance audit


@register(
    "embedding_covariance_topdims",
    oracle=f"""
    WITH emb AS (
        SELECT {", ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) AS d{i}"
            for i in range(COV_DIMS)
        )}
        FROM embeddings
    )
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT {i} AS dim_i, {j} AS dim_j,"
            f" ROUND(covar_samp(d{i}, d{j}), 6) AS cov FROM emb"
            for i in range(COV_DIMS)
            for j in range(COV_DIMS)
            if i <= j
        )}
    )
    ORDER BY dim_i, dim_j
    """,
)
def embedding_covariance_topdims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance matrix of the leading {COV_DIMS} embedding
    dimensions -- the distributed kernel under PCA/whitening/ZCA: all
    {COV_DIMS}*({COV_DIMS}+1)/2 upper-triangle entries in ONE aggregate
    pass over the table (the eigendecomposition that follows is
    model-sized driver math, exactly the k x dim exchange contract of
    ``kmeans_lloyd``).

    covar_samp is numerically the same two-pass-free update in both
    engines; entries are rounded to 6 decimals."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        *[
            F.element_at("embedding", i + 1).cast("double").alias(f"d{i}")
            for i in range(COV_DIMS)
        ]
    )
    aggs = [
        F.round(F.covar_samp(f"d{i}", f"d{j}"), 6).alias(f"c_{i}_{j}")
        for i in range(COV_DIMS)
        for j in range(COV_DIMS)
        if i <= j
    ]
    wide = dims.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("dim_i"),
                F.lit(j).alias("dim_j"),
                F.col(f"c_{i}_{j}").alias("cov"),
            )
            for i in range(COV_DIMS)
            for j in range(COV_DIMS)
            if i <= j
        ]
    )
    return (
        wide.select(F.explode(cells).alias("c"))
        .select("c.dim_i", "c.dim_j", "c.cov")
        .orderBy("dim_i", "dim_j")
    )


PCA_COMPONENTS = 3
PCA_REL_TOL = 1e-3


@register(
    "pca_projection_check",
    oracle=f"""
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT CAST({k} AS INT) AS component, TRUE AS variance_matches"
            for k in range(PCA_COMPONENTS)
        )}
    )
    ORDER BY component
    """,
)
def pca_projection_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the leading {COV_DIMS} embedding dimensions, validated
    end-to-end: the covariance matrix is the distributed one-pass
    aggregate (``embedding_covariance_topdims``), the eigendecomposition
    is model-sized driver math (8x8, the k x dim exchange contract of
    ``kmeans_lloyd``), and the CHECK is distributed again -- the sample
    variance of the data projected onto each top-{PCA_COMPONENTS}
    eigenvector must equal its eigenvalue to {PCA_REL_TOL} relative
    tolerance.  Eigen-solvers aren't portable across engines, so like
    the sketch family the oracle is self-validating: DuckDB expects
    every variance identity to hold.

    This is the PCA/whitening training loop a feature pipeline runs at
    100 TB: one pass for second moments, driver-side factorization,
    one pass to project."""
    import numpy as np

    from wsu_cpts_415_spark.ops.staging import staged_model

    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        *[
            F.element_at("embedding", i + 1).cast("double").alias(f"d{i}")
            for i in range(COV_DIMS)
        ]
    )

    # the covariance pass + eigendecomposition is the TRAINED MODEL of
    # this pipeline ({COV_DIMS}x{COV_DIMS} scalars): staged_model
    # memoizes it per (session, dataset) like the PQ codebooks -- the
    # training scan runs once per corpus, the distributed variance
    # CHECK below still runs per call (it is the query's work)
    def _train():
        cov_row = dims.agg(
            *[
                F.covar_samp(f"d{i}", f"d{j}").alias(f"c_{i}_{j}")
                for i in range(COV_DIMS)
                for j in range(COV_DIMS)
                if i <= j
            ]
        ).head()
        if cov_row[0] is None:
            # covar_samp over an empty (or 1-row) table is NULL: no
            # covariance, no factorization
            return None
        C = np.zeros((COV_DIMS, COV_DIMS))
        for i in range(COV_DIMS):
            for j in range(COV_DIMS):
                lo, hi = min(i, j), max(i, j)
                C[i, j] = cov_row[f"c_{lo}_{hi}"]
        evals, evecs = np.linalg.eigh(C)
        return evals, evecs

    model = staged_model(spark, "pca_cov_eig", sf_dir, _train)
    if model is None:
        # empty result, normal schema
        return spark.createDataFrame(
            [], "component int, variance_matches boolean"
        )
    evals, evecs = model
    order = np.argsort(evals)[::-1][:PCA_COMPONENTS]
    # r12: ONE projection pass for all components (guide §1.2 "don't
    # compute things twice") -- was one var_samp scan of embeddings per
    # component (3 extra passes); the aggregate values are identical,
    # just computed side by side in a single scan.
    projs = [
        sum(
            F.col(f"d{i}") * float(evecs[i, idx]) for i in range(COV_DIMS)
        )
        for idx in order
    ]
    got_row = dims.agg(
        *[
            F.var_samp(p.alias(f"p{rank}")).alias(f"v{rank}")
            for rank, p in enumerate(projs)
        ]
    ).first()
    checks = []
    for rank, idx in enumerate(order):
        got = got_row[rank]
        want = float(evals[idx])
        checks.append(
            (rank, bool(abs(got - want) <= PCA_REL_TOL * max(abs(want), 1e-12)))
        )
    return spark.createDataFrame(
        checks, "component int, variance_matches boolean"
    ).orderBy("component")
