"""Round-10 composed multi-pass ER (queries/er_scoring.py
``er_multipass_match_scores``): the union-of-generators candidate set
and the unbounded-distance scoring semantics.  The conformance gate pins
the full query against DuckDB; these tests pin the COMPOSITION
properties the oracle can't localize -- that the union really is a
superset of each deployed generator, that pairs only a non-lev pass can
reach survive into scoring, and that the pair normalization never emits
a duplicate or a reversed pair."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.er_scoring import (
    er_match_scores,
    ER_TOP_K,
    _multipass_candidates,
    er_multipass_match_scores,
)
from wsu_cpts_415_spark.queries.semdedup import LEV_MAX_DIST, lev_candidates
from wsu_cpts_415_spark.queries.similarity import lsh_band_candidates


def _pairset(df):
    return {(r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect()}


def test_union_superset_of_each_generator(spark):
    union = _pairset(_multipass_candidates(spark, SF_SMOKE))
    lev = _pairset(lev_candidates(spark, SF_SMOKE))
    lsh = _pairset(lsh_band_candidates(spark, SF_SMOKE))
    assert lev <= union
    assert lsh <= union
    # LSH band collisions recover pairs lev blocking cannot see, so the
    # union is strictly larger than the lev set on the smoke corpus
    assert len(union) > len(lev)


def test_candidates_normalized_and_distinct(spark):
    cand = _multipass_candidates(spark, SF_SMOKE)
    n = cand.count()
    assert cand.dropDuplicates(["doc_a", "doc_b"]).count() == n
    assert cand.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_scorer_keeps_beyond_lev_distance(spark):
    """The composed scorer must NOT re-apply the lev generator's
    distance cutoff: SNM/LSH candidates with prefix dist > LEV_MAX_DIST
    legitimately flow through and simply score low."""
    scored = er_multipass_match_scores(spark, SF_SMOKE)
    # recompute the full (pre-top-k) scored set via the internal pieces:
    # the candidate union must contain pairs beyond the lev cutoff
    from wsu_cpts_415_spark.io.tables import load_table
    from wsu_cpts_415_spark.queries.semdedup import LEV_PREFIX

    cand = _multipass_candidates(spark, SF_SMOKE)
    keys = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.substring("text", 1, LEV_PREFIX).alias("prefix")
    )
    far = (
        cand.join(
            keys.select(
                F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
            ),
            "doc_a",
        )
        .join(
            keys.select(
                F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb")
            ),
            "doc_b",
        )
        .filter(F.levenshtein("pa", "pb") > LEV_MAX_DIST)
        .count()
    )
    assert far > 0  # non-lev passes really do widen the scored set
    assert scored.count() <= ER_TOP_K


def test_topk_scores_sorted_and_bounded(spark):
    rows = er_multipass_match_scores(spark, SF_SMOKE).collect()
    scores = [r.match_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)
    # every row carries the unbounded dist and the attached jaccard
    assert all(r.dist >= 0 and 0.0 <= r.jaccard <= 1.0 for r in rows)


import pytest


@pytest.fixture()
def crossblock_docs_dir(spark, tmp_path):
    """A true near-dup pair INVISIBLE to lev blocking: docs 0 and 1
    differ only in their first token, so (lang, blk, tok0, tok1) can
    never co-block them -- the exact miss class the multi-pass union
    exists to recover (via LSH here: the pair's shingle Jaccard is
    ~0.9, far above the band design point, and the fixed seeded hash
    params make the collision deterministic).  Docs 2/3 share
    (tok0, tok1) so the single-pass query still has candidates of its
    own."""
    tail = " ".join(f"tok{i:02d}" for i in range(20))
    rows = [
        (0, f"alpha {tail}", "en", "web", 6 + len(tail)),
        (1, f"betaa {tail}", "en", "web", 6 + len(tail)),
        (2, "omega psi chi phi upsilon", "en", "web", 25),
        (3, "omega psi chi phi tau", "en", "web", 21),
        (4, "iota kappa lambda mu nu", "en", "web", 23),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "xblock"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_multipass_recovers_lev_blocking_miss(spark, crossblock_docs_dir):
    lev = _pairset(lev_candidates(spark, crossblock_docs_dir))
    assert (0, 1) not in lev  # different tok0: unreachable by lev blocking
    union = _pairset(_multipass_candidates(spark, crossblock_docs_dir))
    assert (0, 1) in union  # the non-lev passes recover it

    single = _pairset(er_match_scores(spark, crossblock_docs_dir))
    multi = _pairset(er_multipass_match_scores(spark, crossblock_docs_dir))
    assert (0, 1) not in single
    assert (0, 1) in multi
    # and the recovered pair scores like the near-dup it is: top of the
    # multipass ranking (only one token of ~6 differs)
    top = er_multipass_match_scores(spark, crossblock_docs_dir).collect()[0]
    assert (top.doc_a, top.doc_b) == (0, 1)


def test_snm_window_edges(spark, crossblock_docs_dir):
    from wsu_cpts_415_spark.queries.er_scoring import snm_window_pairs

    # w=1: zero successors per record -> empty, not a crash
    assert snm_window_pairs(spark, crossblock_docs_dir, 1).count() == 0
    # w >= corpus: every pair is within the window -> n*(n-1)/2
    assert snm_window_pairs(spark, crossblock_docs_dir, 50).count() == 10
