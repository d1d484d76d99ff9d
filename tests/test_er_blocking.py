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


def test_one_token_docs_survive_bigram_pipelines(spark, tmp_path):
    """Spark's sequence(1, 0) counts DOWN for a one-token document, so
    every transform(sequence(1, size-1), element_at...) bigram pipeline
    threw INVALID_ARRAY_INDEX under ANSI where the DuckDB oracle's
    generate_series(1, 0) is simply empty (round-10 catch -- the
    round-9 fix covered only the staged minhash projection).  The three
    direct sites (_shingle_rows, repetition_filter's hash explode,
    bigram_pmi_topk) now zip_with over slices; a corpus containing
    one-token and empty-text docs must flow through all of them."""
    from wsu_cpts_415_spark.queries.llm_filters import repetition_filter
    from wsu_cpts_415_spark.queries.text import _shingle_rows, bigram_pmi_topk

    rows = [
        (0, "solo", "en", "web", 4),
        (1, "", "en", "web", 0),
        (2, "alpha beta alpha beta", "en", "web", 21),
        (3, "alpha beta alpha beta gamma", "en", "web", 27),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "onetok"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    sh = {(r.doc_id, r.shingle) for r in _shingle_rows(df).collect()}
    assert all(i not in {0, 1} for i, _ in sh)  # short docs: no shingles
    assert (2, "alpha beta") in sh

    rep = repetition_filter(spark, str(d)).collect()  # must not raise
    assert {r.doc_id for r in rep} <= {0, 1, 2, 3}
    pmi = bigram_pmi_topk(spark, str(d)).collect()  # must not raise
    assert all(r.w1 for r in pmi)
