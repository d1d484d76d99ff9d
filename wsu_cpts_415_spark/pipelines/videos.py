"""Canonical ``videos`` view, derived deterministically from the driver's
``documents`` fixture table.

The reference's entity is a YouTube video observation in the nested Mongo
shape (reference big_data/scripts/load_data/mongo_loader.py:103-121).  The
driver fixtures have no videos table, so the parity pipelines run over a
*derived* videos view: every column is a pure deterministic expression of
``documents`` columns, expressible identically in Spark and in the DuckDB
oracle SQL (so the derivation itself is oracle-checked, see
queries/reference_parity.py).

Derivation design (N = count(documents), doc_id is contiguous 0..N-1):

* identity/attrs: arithmetic mod-mixes of ``doc_id``/``n_chars`` chosen to
  span every branch the reference's analyses switch on -- ratings cover
  [0,5] plus deliberate >5 violators (quality filter, trending_predictor
  .py:63-70), age_days spans the >710 bonus threshold, lengths span the
  {<30, 120-900, >3600} score bands (trending_predictor.py:97-114).
* graph: vertices are split into blocks of 50; each block is a directed
  ring (strong connectivity *guaranteed*) plus stride-7/stride-19 chords
  (diameter ~7, so label propagation converges in few rounds).  Even
  blocks additionally link to the next odd block (an acyclic inter-SCC
  edge, exercising the peeling rounds of the native SCC), and every
  17th vertex carries a dangling related-id (dropped by the inner join of
  the link analysis, analyze_links.py:140-141).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table

BLOCK = 50  # graph community size (one SCC per block)

# ---------------------------------------------------------------------------
# Shared scalar derivations: (spark_expr, duck_expr) pairs kept textually
# adjacent so parity is auditable.  ``n_docs`` is a scalar column available
# from the count cross-join.
# ---------------------------------------------------------------------------

_SPARK_FLAT = {
    "id": "concat('v', cast(doc_id as string))",
    "uploader_name": "source",
    "age_days": "(doc_id * 37L) % 1460",
    "category": "lang",
    "length_seconds": "(doc_id * 53L) % 4000",
    "views": "n_chars * ((doc_id % 97) + 1)",
    "video_rating": (
        "CASE WHEN doc_id % 101 = 0 THEN 5.5 "
        "ELSE cast(doc_id % 51 as double) / 10.0 END"
    ),
    "num_ratings": "(doc_id * 13L) % 1000",
    "num_comments": "(doc_id * 7L) % 500",
    "upload_date": "date_add(to_date('2007-01-01'), cast(doc_id % 730 as int))",
}

_DUCK_FLAT = {
    "id": "'v' || doc_id",
    "uploader_name": "source",
    "age_days": "(doc_id * 37) % 1460",
    "category": "lang",
    "length_seconds": "(doc_id * 53) % 4000",
    "views": "n_chars * ((doc_id % 97) + 1)",
    "video_rating": (
        "CASE WHEN doc_id % 101 = 0 THEN 5.5 "
        "ELSE CAST(doc_id % 51 AS DOUBLE) / 10.0 END"
    ),
    "num_ratings": "(doc_id * 13) % 1000",
    "num_comments": "(doc_id * 7) % 500",
    "upload_date": "DATE '2007-01-01' + CAST(doc_id % 730 AS INTEGER)",
}

# Graph: block-local helper expressions over (doc_id, n_docs).
_SPARK_GRAPH_HELPERS = {
    "base": f"(doc_id div {BLOCK}) * {BLOCK}",
    "bn": f"least({BLOCK}L, n_docs - ((doc_id div {BLOCK}) * {BLOCK}))",
    "pos": f"doc_id - (doc_id div {BLOCK}) * {BLOCK}",
}

_SPARK_RELATED = (
    "concat("
    " array(concat('v', cast(base + pmod(pos + 1, bn) as string)),"
    "       concat('v', cast(base + pmod(pos + 7, bn) as string)),"
    "       concat('v', cast(base + pmod(pos + 19, bn) as string))),"
    f" IF(pos = 3 AND (doc_id div {BLOCK}) % 2 = 0 AND base + {BLOCK} + 3 < n_docs,"
    f"    array(concat('v', cast(base + {BLOCK} + 3 as string))),"
    "    cast(array() as array<string>)),"
    " IF(doc_id % 17 = 0,"
    "    array(concat('vx', cast(doc_id as string))),"
    "    cast(array() as array<string>)))"
)

_DUCK_GRAPH_HELPERS = {
    "base": f"(doc_id // {BLOCK}) * {BLOCK}",
    "bn": f"least({BLOCK}, n_docs - ((doc_id // {BLOCK}) * {BLOCK}))",
    "pos": f"doc_id - (doc_id // {BLOCK}) * {BLOCK}",
}

_DUCK_RELATED = (
    "list_concat(list_concat("
    " ['v' || (base + (pos + 1) % bn),"
    "  'v' || (base + (pos + 7) % bn),"
    "  'v' || (base + (pos + 19) % bn)],"
    f" CASE WHEN pos = 3 AND (doc_id // {BLOCK}) % 2 = 0"
    f"        AND base + {BLOCK} + 3 < n_docs"
    f"      THEN ['v' || (base + {BLOCK} + 3)]"
    "      ELSE CAST([] AS VARCHAR[]) END),"
    " CASE WHEN doc_id % 17 = 0 THEN ['vx' || doc_id]"
    "      ELSE CAST([] AS VARCHAR[]) END)"
)

# DuckDB CTE producing the flat videos view; every parity oracle starts
# FROM this.  Kept as one reusable SQL fragment.
VIDEOS_FLAT_DUCK_CTE = f"""
videos_flat AS (
    SELECT {_DUCK_FLAT['id']} AS id,
           {_DUCK_FLAT['uploader_name']} AS uploader_name,
           {_DUCK_FLAT['age_days']} AS age_days,
           {_DUCK_FLAT['category']} AS category,
           {_DUCK_FLAT['length_seconds']} AS length_seconds,
           {_DUCK_FLAT['views']} AS views,
           {_DUCK_FLAT['video_rating']} AS video_rating,
           {_DUCK_FLAT['num_ratings']} AS num_ratings,
           {_DUCK_FLAT['num_comments']} AS num_comments,
           {_DUCK_FLAT['upload_date']} AS upload_date,
           {_DUCK_RELATED} AS related_ids
    FROM (
        SELECT d.*, n.n_docs, {_DUCK_GRAPH_HELPERS['base']} AS base,
               {_DUCK_GRAPH_HELPERS['bn']} AS bn,
               {_DUCK_GRAPH_HELPERS['pos']} AS pos
        FROM documents d
        CROSS JOIN (SELECT COUNT(*) AS n_docs FROM documents) n
    )
)
"""


def videos_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat videos view (reference data_types.py:9-21 field set).

    The document count rides along as a broadcast single-row cross join
    (scale-safe scalar: no driver collect, no closure capture)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    with_helpers = docs.crossJoin(F.broadcast(n)).select(
        "*",
        *[F.expr(e).alias(k) for k, e in _SPARK_GRAPH_HELPERS.items()],
    )
    return with_helpers.select(
        *[F.expr(e).alias(k) for k, e in _SPARK_FLAT.items()],
        F.expr(_SPARK_RELATED).alias("related_ids"),
    )


def videos_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical nested videos view (schemas.VIDEOS shape; FIXTURES.md §B;
    reference mongo_loader.py:103-121).  Parity pipelines read this and
    flatten with nested-field projections exactly as the reference does
    (e.g. trending_predictor.py:49-60); Catalyst's nested-schema pruning
    keeps the physical scan columnar either way.

    Session-staged (ops/staging.py): the md5-derived graph-helper
    expressions dominate the derivation and every parity consumer (two
    SCC queries, trending, link analysis, correlation) re-derived them
    per query -- the staged table is the local analog of the curated
    videos layer a production pipeline would persist once."""
    from wsu_cpts_415_spark.ops.staging import staged

    return staged(
        spark, "videos_nested", sf_dir, lambda: _videos_nested_build(spark, sf_dir)
    )


def _videos_nested_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = videos_flat(spark, sf_dir)
    return flat.select(
        "id",
        "upload_date",
        F.struct(
            F.col("uploader_name").alias("uploader"),
            F.col("age_days").alias("age_days"),
            F.col("category").alias("category"),
        ).alias("video_desc"),
        F.struct(
            F.col("length_seconds").alias("length"),
            F.col("video_rating").alias("rating"),
        ).alias("video_attri"),
        F.struct(
            F.col("views").alias("views"),
            F.col("num_ratings").alias("num_ratings"),
            F.col("num_comments").alias("num_comments"),
        ).alias("video_engagement"),
        "related_ids",
    )
