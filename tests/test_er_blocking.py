"""Round-9 ER blocking-key extension (queries/semdedup.py): the
two-token key's edge semantics.  The conformance gate pins the deployed
policy on the fixtures; these tests pin the corner the fixtures never
exercise -- documents too short to HAVE a second token, where a plain
equality join on tok1 would silently drop every candidate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.semdedup import _lev_candidates


@pytest.fixture()
def tiny_docs_dir(spark, tmp_path):
    rows = [
        # two single-token docs: tok1 is absent on both sides -- they
        # must still block together (coalesced '' == '')
        (0, "alpha", "en", "web", 5),
        (1, "alpha", "en", "web", 5),
        # a two-token doc sharing tok0 but not tok1 with a twin: the
        # extended key must SEPARATE these (that is the extension)
        (2, "alpha beta gamma", "en", "web", 16),
        (3, "alpha delta gamma", "en", "web", 16),
        # and a same-(tok0, tok1) pair that must remain candidates
        (4, "alpha beta epsilon", "en", "web", 18),
        (5, "alpha beta zeta", "en", "web", 15),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "erfix"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_single_token_docs_still_block_together(spark, tiny_docs_dir):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in _lev_candidates(spark, tiny_docs_dir).collect()
    }
    assert (0, 1) in pairs  # missing tok1 coalesces, never null-drops


def test_second_token_separates_blocks(spark, tiny_docs_dir):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in _lev_candidates(spark, tiny_docs_dir).collect()
    }
    assert (2, 3) not in pairs  # differs at tok1 -> different block
    assert (4, 5) in pairs  # same (lang, blk, tok0, tok1) -> candidates


def test_blocked_pair_columns_unchanged(spark, tiny_docs_dir):
    """The key extension must not leak new columns into the candidate
    contract consumed by er_match_scores (lang, blk, doc_a, doc_b,
    dist, len_a, len_b)."""
    cols = _lev_candidates(spark, tiny_docs_dir).columns
    assert cols == ["lang", "blk", "doc_a", "doc_b", "dist", "len_a", "len_b"]
