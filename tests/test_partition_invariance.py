"""Partition-count invariance: the determinism threat the single-setting
probe cannot see.

Every registered query's values are pinned against DuckDB at ONE
shuffle-partition setting; the classic way such a query silently breaks
on a real cluster is float aggregation whose SUMMATION ORDER changes
with the partition count (32 local partitions vs 2000 cluster
partitions).  The registry's determinism rules (round AFTER aggregation,
rank tie-breaks, order-insensitive fingerprints) exist precisely to make
results partition-count-independent -- this suite executes that claim
directly: a float-heavy sample of queries runs at
spark.sql.shuffle.partitions = 3 and 17 (coprime, neither the suite's 8
nor the bench's 32) and the driver-normalized outputs must be byte
identical.

Session-staged projections are cleared between settings so the second
run rebuilds every cached layer under the new partitioning -- otherwise
the memo would hide the very re-shuffle being tested."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE
from wsu_cpts_415_spark.ops.conformance import normalize
from wsu_cpts_415_spark.ops.staging import clear_staged
from wsu_cpts_415_spark.registry import all_queries

# Float-aggregation-heavy / iterative / rank-sensitive sample: the
# shapes where partition count could plausibly leak into values.
SAMPLE = [
    "stats_moments",
    "ref_correlation_matrix",
    "ref_trending_scores",
    "linreg_normal_equations",
    "kmeans_lloyd",
    "percentiles",
    "zscore_anomalies",
    "unigram_logprob_score",
    "er_multipass_match_scores",
    "ngram_jaccard_pairs_capped",
    "tfidf_top_terms",
    "cc_star_contraction",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_values_invariant_to_shuffle_partition_count(spark, name):
    qs = all_queries()
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    outs = []
    try:
        for parts in ("3", "17"):
            spark.conf.set(key, parts)
            clear_staged()
            outs.append(normalize(qs[name].fn(spark, SF_SMOKE).toPandas()))
    finally:
        spark.conf.set(key, old)
        clear_staged()
    assert outs[0] == outs[1], (
        f"{name}: values depend on spark.sql.shuffle.partitions -- "
        "summation order (or a rank tie) leaks into the output"
    )


# Scan-side twin: spark.sql.files.maxPartitionBytes decides how many
# input splits feed the partial aggregates -- the other knob a cluster
# changes out from under a query.  Smaller sample (the settings force a
# full re-read per run).
SCAN_SAMPLE = [
    "stats_moments",
    "ref_correlation_matrix",
    "linreg_normal_equations",
    "quality_score",
]


@pytest.mark.parametrize("name", SCAN_SAMPLE)
def test_values_invariant_to_input_split_size(spark, name):
    qs = all_queries()
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    outs = []
    try:
        for nbytes in ("65536", "134217728"):  # 64 KB vs the 128 MB default
            spark.conf.set(key, nbytes)
            clear_staged()
            outs.append(normalize(qs[name].fn(spark, SF_SMOKE).toPandas()))
    finally:
        spark.conf.set(key, old)
        clear_staged()
    assert outs[0] == outs[1], (
        f"{name}: values depend on input split size -- scan-side "
        "summation order leaks into the output"
    )
