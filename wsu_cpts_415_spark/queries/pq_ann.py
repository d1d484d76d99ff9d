"""Product-quantization ANN over the ``embeddings`` fixture: per-subspace
codebooks trained with deterministic Lloyd rounds, vectors encoded to one
code per subspace, and queries answered through an ADC (asymmetric
distance computation) lookup table -- the IVF-PQ building block behind
billion-vector search (Jegou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Unlike the self-validating sketches (approx_distinct, HLL), PQ here is
FULLY cross-engine checked: init, Lloyd rounds, encoding, LUT and ADC
ranking are all deterministic (same rules as queries/clustering.py --
double math over identical inputs, distances folded in dimension order,
rounded to 6 decimals before every argmin, cluster index tie-break), so
the DuckDB oracle reproduces the exact codes and the exact ADC top-k.

Scale design: training touches only subvectors (k x sub_dim model per
subspace through the driver, the standard distributed-KMeans exchange);
encoding is a pure map-side argmin against broadcast centroid literals
(zero shuffle); a query is a 64-float LUT build (driver, microseconds)
plus one scan computing code-indexed LUT sums -- the scan reads CODES
(m bytes/vector), not embeddings, which is the whole point: at 100 TB of
vectors the ADC scan reads ~1.5% of the raw bytes.  The final exact
re-rank (here: exact distances emitted alongside) touches only the
candidate slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import register

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (4 x 16 = the fixture's 64)
PQ_K = 8  # centroids per subspace
PQ_ITERS = 2  # Lloyd rounds per subspace
PQ_QUERY_ID = 0  # query vector
PQ_TOPK = 10


def _fold_sq(dim: int, a: str, b: str) -> str:
    """Spark-side squared-L2 fold in strict dimension order, rounded 6."""
    return (
        f"round(aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        f" cast(0 as double), (acc, x) -> acc + x), 6)"
    )


def _assign_expr(sv: str, cents: list[tuple[int, list[float]]]) -> str:
    """argmin over (rounded distance, code) structs, JVM-side per row."""
    structs = []
    for c, vec in sorted(cents):
        arr = "array(" + ",".join(repr(float(x)) for x in vec) + ")"
        structs.append(f"struct({_fold_sq(PQ_SUBDIM, sv, arr)} as d, {c} as c)")
    return f"array_min(array({', '.join(structs)})).c"


def _duck_pq_ctes() -> str:
    """Per-subspace kmeans + encode + LUT CTE chain mirroring the Spark
    side round-for-round (same rounding, same tie-breaks)."""
    parts = [
        """emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    )"""
    ]
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        parts.append(
            f"""sub{s} AS (
        SELECT vec_id, v[{lo}:{hi}] AS sv FROM emb
    )"""
        )
        parts.append(
            f"""c0_{s} AS (
        SELECT CAST(vec_id AS INT) AS c, sv FROM sub{s} WHERE vec_id < {PQ_K}
    )"""
        )
        for i in range(1, PQ_ITERS + 1):
            parts.append(
                f"""d{i}_{s} AS (
        SELECT e.vec_id, c.c,
               ROUND(list_sum(list_transform(
                   generate_series(1, {PQ_SUBDIM}),
                   i -> (e.sv[i] - c.sv[i]) * (e.sv[i] - c.sv[i]))), 6) AS d
        FROM sub{s} e CROSS JOIN c{i - 1}_{s} c
    )"""
            )
            parts.append(
                f"""a{i}_{s} AS (
        SELECT vec_id, c FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d, c
            ) AS rn FROM d{i}_{s}
        ) WHERE rn = 1
    )"""
            )
            if i < PQ_ITERS:
                parts.append(
                    f"""cent{i}_{s} AS (
        SELECT a.c, t.dim, ROUND(AVG(e.sv[t.dim]), 6) AS val
        FROM a{i}_{s} a JOIN sub{s} e USING (vec_id),
             UNNEST(generate_series(1, {PQ_SUBDIM})) AS t(dim)
        GROUP BY a.c, t.dim
    )"""
                )
                parts.append(
                    f"""c{i}_{s} AS (
        SELECT c, list(val ORDER BY dim) AS sv FROM cent{i}_{s} GROUP BY c
    )"""
                )
        parts.append(
            f"""lut_{s} AS (
        SELECT c.c,
               ROUND(list_sum(list_transform(
                   generate_series(1, {PQ_SUBDIM}),
                   i -> (q.sv[i] - c.sv[i]) * (q.sv[i] - c.sv[i]))), 6) AS d
        FROM c{PQ_ITERS - 1}_{s} c,
             (SELECT sv FROM sub{s} WHERE vec_id = {PQ_QUERY_ID}) q
    )"""
        )
    joins = " ".join(
        f"JOIN a{PQ_ITERS}_{s} a{s} USING (vec_id)" for s in range(1, PQ_M)
    )
    lut_joins = " ".join(
        f"JOIN lut_{s} l{s} ON a{s}.c = l{s}.c" if s else
        f"JOIN lut_0 l0 ON a0.c = l0.c"
        for s in range(PQ_M)
    )
    adc_sum = " + ".join(f"l{s}.d" for s in range(PQ_M))
    parts.append(
        f"""adc AS (
        SELECT a0.vec_id, ROUND({adc_sum}, 6) AS adc_dist
        FROM a{PQ_ITERS}_0 a0 {joins} {lut_joins}
    )"""
    )
    parts.append(
        f"""exact AS (
        SELECT e.vec_id,
               ROUND(list_sum(list_transform(
                   generate_series(1, {PQ_M * PQ_SUBDIM}),
                   i -> (e.v[i] - q.v[i]) * (e.v[i] - q.v[i]))), 6)
                   AS exact_dist
        FROM emb e, (SELECT v FROM emb WHERE vec_id = {PQ_QUERY_ID}) q
    )"""
    )
    return ",\n    ".join(parts)


@register(
    "pq_ann_adc_topk",
    oracle=f"""
    WITH {_duck_pq_ctes()}
    SELECT adc.vec_id, adc.adc_dist, exact.exact_dist
    FROM adc JOIN exact USING (vec_id)
    WHERE adc.vec_id <> {PQ_QUERY_ID}
    ORDER BY adc_dist, vec_id
    LIMIT {PQ_TOPK}
    """,
)
def pq_ann_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ANN query: train {PQ_M}x{PQ_K} sub-codebooks ({PQ_ITERS} Lloyd
    rounds each, init = first {PQ_K} subvectors), encode every vector,
    and return the ADC top-{PQ_TOPK} for the query vector with the true
    squared distance alongside (the exact re-rank input).  Codes, LUT
    and ranking are bit-reproduced by the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    sub_exprs = [
        f"slice(v, {s * PQ_SUBDIM + 1}, {PQ_SUBDIM})" for s in range(PQ_M)
    ]
    # ---- train (session-memoized via ops.staging.staged_model: the
    # codebooks are a deterministic pure function of the dataset, so the
    # memo is the local analogue of a persisted model table -- repeated
    # queries skip straight to encode+ADC)
    def _train():
        # ---- train: Lloyd rounds for ALL subspaces in one job per round
        # (model-sized driver exchange: PQ_M x PQ_K x PQ_SUBDIM doubles)
        init_rows = (
            emb.filter(F.col("vec_id") < PQ_K)
            .select(F.col("vec_id").cast("int").alias("c"), "v")
            .collect()
        )
        if not init_rows:  # empty corpus: no codebooks, no query vec
            return [], []
        codebooks: list[list[tuple[int, list[float]]]] = [
            sorted(
                (int(r["c"]), list(r["v"])[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM])
                for r in init_rows
            )
            for s in range(PQ_M)
        ]
        for it in range(1, PQ_ITERS):
            # one select computes every subspace's assignment; one
            # posexplode + aggregate re-estimates all PQ_M codebooks together
            assigned = emb.select(
                "v",
                *[
                    F.expr(_assign_expr(sub_exprs[s], codebooks[s])).alias(f"c{s}")
                    for s in range(PQ_M)
                ],
            )
            code_of_sub = "array(" + ",".join(f"c{s}" for s in range(PQ_M)) + ")"
            rows = (
                assigned.select(
                    F.posexplode("v").alias("gdim", "val"),
                    *[F.col(f"c{s}") for s in range(PQ_M)],
                )
                .select(
                    (F.col("gdim") / PQ_SUBDIM).cast("int").alias("s"),
                    F.expr(
                        f"element_at({code_of_sub},"
                        f" cast(gdim div {PQ_SUBDIM} as int) + 1)"
                    ).alias("c"),
                    (F.col("gdim") % PQ_SUBDIM).alias("dim"),
                    "val",
                )
                .groupBy("s", "c", "dim")
                .agg(F.round(F.avg("val"), 6).alias("val"))
                .collect()
            )
            by_sc: dict[tuple[int, int], list[tuple[int, float]]] = {}
            for r in rows:
                by_sc.setdefault((int(r["s"]), int(r["c"])), []).append(
                    (int(r["dim"]), float(r["val"]))
                )
            codebooks = [
                sorted(
                    (c, [v for _, v in sorted(dims)])
                    for (s2, c), dims in by_sc.items()
                    if s2 == s
                )
                for s in range(PQ_M)
            ]
        qv = next(
            list(r["v"]) for r in init_rows if int(r["c"]) == PQ_QUERY_ID
        )
        return qv, codebooks

    from wsu_cpts_415_spark.ops.staging import staged_model

    qv, codebooks = staged_model(spark, "pq_codebooks", sf_dir, _train)
    if not qv:
        return emb.select(
            "vec_id",
            F.lit(0.0).alias("adc_dist"),
            F.lit(0.0).alias("exact_dist"),
        )
    # ---- LUT: query subvector vs final centroids, same fold + rounding
    # (the query vector is among the init rows: PQ_QUERY_ID < PQ_K)
    luts: list[dict[int, float]] = []
    for s in range(PQ_M):
        qs = qv[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
        lut: dict[int, float] = {}
        for c, cent in codebooks[s]:
            acc = 0.0
            for x, y in zip(qs, cent):
                acc += (x - y) * (x - y)
            lut[c] = round(acc, 6)
        luts.append(lut)
    # ---- encode + ADC in ONE map-side select: per-subspace argmin codes,
    # LUT lookups via array literals indexed by code (codes are 0..K-1
    # only when kmeans never empties a cluster; use map form for safety)
    code_cols = [
        F.expr(_assign_expr(sub_exprs[s], codebooks[s])).alias(f"c{s}")
        for s in range(PQ_M)
    ]
    coded = emb.select("vec_id", "v", *code_cols)
    lut_lookup = []
    for s in range(PQ_M):
        pairs = ", ".join(f"{c}, {repr(d)}" for c, d in sorted(luts[s].items()))
        lut_lookup.append(f"element_at(map({pairs}), c{s})")
    adc = " + ".join(lut_lookup)
    q_arr = "array(" + ",".join(repr(float(x)) for x in qv) + ")"
    return (
        coded.filter(F.col("vec_id") != PQ_QUERY_ID)
        .select(
            "vec_id",
            F.round(F.expr(adc), 6).alias("adc_dist"),
            F.expr(_fold_sq(PQ_M * PQ_SUBDIM, "v", q_arr)).alias("exact_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(PQ_TOPK)
    )
