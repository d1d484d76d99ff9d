"""Contract tests for ``ops.staging.staged_table`` -- the durable,
corpus-fingerprint-keyed staging layer behind the heavy ER projections
(minhash_hashed / snm_ranked / lev_candidates).  The properties a
restarted 100 TB session relies on:

* second session READS (the build function is never re-run for an
  unchanged corpus);
* a changed corpus re-keys the path and rebuilds (stale staged data can
  never serve a new corpus);
* values survive the parquet round-trip byte-identically;
* an unwritable staging root degrades to plain session staging, never
  to an error.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.ops.staging import clear_staged, staged_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_dir(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    load_table(spark, SF, "documents").limit(40).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture()
def staging_root(tmp_path, monkeypatch):
    root = tmp_path / "staging"
    monkeypatch.setenv("SPARK_GRAFT_STAGING_DIR", str(root))
    return str(root)


def _build(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )


def test_second_session_reads_not_rebuilds(spark, docs_dir, staging_root):
    first = staged_table(
        spark, "probe", docs_dir, lambda: _build(spark, docs_dir)
    )
    want = sorted(map(tuple, first.collect()))
    # simulate a restarted session: drop every in-memory memo, then ask
    # again with a build that would EXPLODE if invoked
    clear_staged()

    def boom():
        raise AssertionError("build re-ran despite durable staged table")

    again = staged_table(spark, "probe", docs_dir, boom)
    assert sorted(map(tuple, again.collect())) == want


def test_changed_corpus_rekeys_and_rebuilds(spark, docs_dir, staging_root):
    staged_table(spark, "probe", docs_dir, lambda: _build(spark, docs_dir))
    # change the corpus IN PLACE (same sf_dir) -- metadata-only change,
    # which the full-column fingerprint must catch.  Materialize to the
    # driver first: writing over the parquet a live plan reads from
    # races the scan
    rows = load_table(spark, docs_dir, "documents").collect()
    spark.createDataFrame(
        [(r.doc_id, r.text, "xx", r.source, r.n_chars) for r in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{docs_dir}/documents.parquet"
    )
    clear_staged()
    calls = []

    def build2():
        calls.append(1)
        return _build(spark, docs_dir)

    staged_table(spark, "probe", docs_dir, build2)
    assert calls, "changed corpus must rebuild, not serve stale staging"


def test_unwritable_root_degrades_to_session_staging(
    spark, docs_dir, monkeypatch
):
    monkeypatch.setenv(
        "SPARK_GRAFT_STAGING_DIR", "/proc/definitely/not/writable"
    )
    clear_staged()
    out = staged_table(
        spark, "probe", docs_dir, lambda: _build(spark, docs_dir)
    )
    assert out.count() == 40  # served, just not durable


def test_parquet_roundtrip_is_exact_for_staged_shapes(
    spark, docs_dir, staging_root
):
    """The real staged shapes carry string arrays and bigint arrays
    (minhash_hashed) -- pin that the round-trip preserves them."""
    def build():
        return load_table(spark, docs_dir, "documents").select(
            "doc_id",
            F.split("text", " ").alias("toks"),
            F.expr("transform(split(text, ' '), t -> xxhash64(t))").alias(
                "hs"
            ),
        )

    direct = sorted(
        (r.doc_id, tuple(r.toks), tuple(r.hs)) for r in build().collect()
    )
    staged = staged_table(spark, "arrays", docs_dir, build)
    got = sorted(
        (r.doc_id, tuple(r.toks), tuple(r.hs)) for r in staged.collect()
    )
    assert got == direct
