"""Stop-shingle cap semantics (queries/stop_shingles.py): conformance
pins the capped top-k against DuckDB; these tests pin the CLAIMS the
docstrings make -- the score is a true lower bound of the exact
Jaccard, and the cap genuinely removes hot posting lists from the pair
stream."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.stop_shingles import (
    STOP_SHINGLE_DF_CAP,
    ngram_jaccard_pairs_capped,
)
from wsu_cpts_415_spark.queries.text import (
    _shingle_rows_staged,
    exact_jaccard_pairs,
)


def test_capped_score_is_a_lower_bound_of_exact(spark):
    capped = ngram_jaccard_pairs_capped(spark, SF_SMOKE)
    exact = exact_jaccard_pairs(spark, SF_SMOKE).select(
        "doc_a", "doc_b", F.col("jaccard").alias("j_exact")
    )
    joined = capped.join(exact, ["doc_a", "doc_b"], "left").collect()
    assert joined, "capped top-k should emit pairs on the fixtures"
    for r in joined:
        assert r.j_exact is not None, (
            "a capped pair must share at least one kept shingle, hence "
            "appear in the exact pair table"
        )
        # rounding both to 6 on both sides: lb can exceed exact only by
        # the rounding grain, never materially
        assert r.jaccard_lb <= r.j_exact + 1e-6, (r.doc_a, r.doc_b)


def test_cap_actually_removes_hot_posting_lists(spark):
    dfs = (
        _shingle_rows_staged(spark, SF_SMOKE)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
    )
    hot = dfs.filter(F.col("df") > STOP_SHINGLE_DF_CAP).count()
    assert hot > 0, (
        "fixture must exercise the cap (raise/lower STOP_SHINGLE_DF_CAP "
        "if the synthetic corpus changes)"
    )
