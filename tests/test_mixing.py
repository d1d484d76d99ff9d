"""Semantic property tests for the corpus mixing/packing/quantization
operators -- invariants the oracle comparison can't express (it proves
Spark == DuckDB, not that both satisfy the operator's contract)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_ORACLE
from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.queries.mixing import (
    PACK_BUDGET,
    sequence_packing,
)
from wsu_cpts_415_spark.queries.quantize import (
    Q_LEVELS,
    embedding_quantize_int8,
)


def test_sequence_packing_conserves_tokens_and_docs(spark):
    """Packing must account for every document and every token exactly
    once, and blocks (except a shard's last) must start within budget of
    the previous block's start."""
    packed = sequence_packing(spark, SF_ORACLE).collect()
    docs = load_table(spark, SF_ORACLE, "documents")
    totals = docs.select(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    ).collect()[0]
    assert sum(r["n_docs"] for r in packed) == totals["n_docs"]
    assert sum(r["seq_tokens"] for r in packed) == totals["n_tokens"]
    # block ids are contiguous from 0 within each shard: a doc lands in
    # the block its first token's offset falls in, so no block index can
    # be skipped
    by_source: dict[str, list[int]] = {}
    for r in packed:
        by_source.setdefault(r["source"], []).append(r["seq_no"])
    for source, seqs in by_source.items():
        assert sorted(seqs) == list(range(len(seqs))), source


def test_sequence_packing_fill_ratio_definition(spark):
    for r in sequence_packing(spark, SF_ORACLE).collect():
        # fill_ratio is rounded to 4 decimals inside the query
        assert abs(r["fill_ratio"] - r["seq_tokens"] / PACK_BUDGET) <= 5.001e-5


def test_quantizer_error_bounded_by_grid_step(spark):
    """Midpoint dequantization error is at most half a grid step in every
    dimension: max_abs_err <= max_dim_range / (2 * levels)."""
    audit = embedding_quantize_int8(spark, SF_ORACLE)
    dims = load_table(spark, SF_ORACLE, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    ranges = dims.groupBy("dim").agg((F.max("x") - F.min("x")).alias("rng"))
    worst = ranges.agg(F.max("rng")).collect()[0][0]
    # max_abs_err is rounded to 6 decimals inside the query (up to 5e-7
    # upward), and the floor-coded boundary can sit an ulp past the
    # half-step; allow both
    bound = worst / (2 * Q_LEVELS) * (1 + 1e-9) + 6e-7
    bad = audit.filter(F.col("max_abs_err") > bound).count()
    assert bad == 0
    # and the audit covers every vector
    n_vecs = load_table(spark, SF_ORACLE, "embeddings").count()
    assert audit.count() == n_vecs
