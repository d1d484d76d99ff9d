"""Durable-staging observability as a first-class query.

The fingerprint-keyed staged layers (ops/staging.py ``staged_table``)
are the engine's write-once/read-by-every-job tier -- the 100 TB
pattern behind the 18x ER cold-start cut.  This query makes the tier
AUDITABLE through the same oracle-checked surface as every operator:
it materializes the three doc-grain staged layers for the dataset and
reports each one's cardinality and width.  Because every layer is a
pure function of the documents table, the expected row counts are
SQL-expressible (docs, docs x N_BANDS, docs) and DuckDB pins them --
a staging bug that dropped or duplicated rows in the durable parquet
would fail conformance here, not silently skew every consumer.

Filesystem-grain inventory (fingerprint-dir counts, bytes, retention
compliance) is environment state, not corpus state, so it lives on the
CLI instead: ``python -m wsu_cpts_415_spark staging-audit``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wsu_cpts_415_spark.queries.similarity import N_BANDS
from wsu_cpts_415_spark.registry import register


@register(
    "staged_layer_audit",
    oracle=f"""
    SELECT layer, n_rows, n_cols FROM (
        SELECT 'minhash_hashed' AS layer,
               CAST(count(*) AS BIGINT) AS n_rows, 3 AS n_cols
        FROM documents
        UNION ALL
        SELECT 'minhash_bands', CAST(count(*) * {N_BANDS} AS BIGINT), 4
        FROM documents
        UNION ALL
        SELECT 'snm_ranked', CAST(count(*) AS BIGINT), 4
        FROM documents
    )
    ORDER BY layer
    """,
)
def staged_layer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality/width audit of the durably staged doc-grain layers:
    (layer, n_rows, n_cols) for minhash_hashed (one row per document),
    minhash_bands ({N_BANDS} band rows per document), and snm_ranked
    (one rank row per document).  Each count is an aggregate over the
    staged parquet (or its in-session build when staging is
    unavailable), so the oracle cross-checks the DURABLE tier's
    contents against the corpus -- read-vs-rebuild equivalence at the
    row-count grain, on every conformance run.

    Driver-side assembly is 3 scalar counts -> a 3-row local frame:
    bounded by construction (the collect-audit's model-sized class)."""
    from wsu_cpts_415_spark.queries.er_scoring import _snm_ranked_staged
    from wsu_cpts_415_spark.queries.similarity import (
        _bands_staged,
        _hashed_staged,
    )

    layers = [
        ("minhash_hashed", _hashed_staged(spark, sf_dir)),
        ("minhash_bands", _bands_staged(spark, sf_dir)),
        ("snm_ranked", _snm_ranked_staged(spark, sf_dir)),
    ]
    rows = [(name, df.count(), len(df.columns)) for name, df in layers]
    return spark.createDataFrame(
        rows, "layer string, n_rows long, n_cols int"
    ).orderBy("layer")
