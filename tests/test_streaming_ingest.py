"""Streaming ingest-with-dedup gate (streaming/ingest_dedup.py): the
standing stores extend batch-over-batch (a doc admitted in batch N
rejects its near-dups in batch N+1), the within-batch exact and
near-dup rules are deterministic, and a mid-commit kill + checkpoint
replay cannot double-apply a batch into the accepted store or the
standing stores.

Near-dup cases use texts with DIFFERENT digests but IDENTICAL bigram
shingle sets, so LSH candidacy is certain (identical signatures) and the
verified Jaccard is exactly 1.0 -- no probabilistic flakiness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsu_cpts_415_spark.streaming.ingest_dedup import (
    init_standing_stores,
    stream_ingest_with_dedup,
)

SCHEMA = "doc_id long, text string"


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, store, accepted, ckpt, **kw):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    stream_ingest_with_dedup(stream, store, accepted, ckpt, **kw)


@pytest.fixture()
def stores(spark, tmp_path):
    store = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(1, "alpha beta alpha beta")], SCHEMA
    )
    init_standing_stores(spark, corpus, store)
    return {
        "store": store,
        "src": str(tmp_path / "incoming"),
        "accepted": str(tmp_path / "accepted"),
        "ckpt": str(tmp_path / "ckpt"),
    }


BATCH1 = [
    (10, "alpha beta alpha beta alpha"),  # same shingles as corpus doc 1 -> reject
    (11, "gamma delta gamma delta"),  # novel -> accept
    (12, "gamma delta gamma delta"),  # exact in-batch dup of 11 -> reject
]
BATCH2 = [
    (20, "gamma delta gamma delta gamma"),  # near-dups ACCEPTED 11 -> reject
    (21, "epsilon zeta epsilon zeta"),  # novel -> accept
]


def _accepted_ids(spark, path):
    return sorted(
        r["doc_id"] for r in spark.read.parquet(path).select("doc_id").collect()
    )


def test_store_extends_across_batches(spark, stores):
    _write(spark, BATCH1, stores["src"])
    _run(spark, stores["src"], stores["store"], stores["accepted"], stores["ckpt"])
    assert _accepted_ids(spark, stores["accepted"]) == [11]
    _write(spark, BATCH2, stores["src"])
    _run(spark, stores["src"], stores["store"], stores["accepted"], stores["ckpt"])
    assert _accepted_ids(spark, stores["accepted"]) == [11, 21]
    # standing stores grew by exactly the accepted docs
    digests = spark.read.parquet(stores["store"] + "/digests")
    assert sorted(r["doc_id"] for r in digests.collect()) == [1, 11, 21]


def test_replay_after_midcommit_kill_is_exactly_once(spark, stores):
    _write(spark, BATCH1, stores["src"])
    boom = {"armed": True}

    def injector(batch_id):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected mid-commit failure")

    with pytest.raises(Exception, match="injected"):
        _run(
            spark,
            stores["src"],
            stores["store"],
            stores["accepted"],
            stores["ckpt"],
            on_batch_end=injector,
        )
    # the batch landed but never committed; replay must rewrite, not append
    _run(spark, stores["src"], stores["store"], stores["accepted"], stores["ckpt"])
    assert _accepted_ids(spark, stores["accepted"]) == [11]
    bands = spark.read.parquet(stores["store"] + "/bands")
    assert bands.filter(F.col("doc_id") == 11).count() == 4  # one row per band


def test_fully_rejected_first_batch_does_not_crash(spark, stores):
    """A first micro-batch where NOTHING is admitted must complete (the
    accepted store may not even exist yet) and a later novel batch must
    still land normally."""
    _write(
        spark,
        [(30, "alpha beta alpha beta alpha")],  # near-dup of corpus doc 1
        stores["src"],
    )
    _run(spark, stores["src"], stores["store"], stores["accepted"], stores["ckpt"])
    import os

    assert not os.path.exists(stores["accepted"]) or not [
        f
        for f in os.listdir(stores["accepted"])
        if f.startswith("_batch=")
    ]
    _write(spark, [(31, "eta theta eta theta")], stores["src"])
    _run(spark, stores["src"], stores["store"], stores["accepted"], stores["ckpt"])
    assert _accepted_ids(spark, stores["accepted"]) == [31]


def test_one_word_document_does_not_crash_the_gate(spark, stores):
    """A single-token document has an EMPTY bigram shingle set (DuckDB
    semantics); Spark's sequence(1, 0) would count down and crash on
    element_at(toks, 0) without the size guard.  Such a doc can never
    near-dup anything, so it must be admitted, not kill the batch."""
    _write(spark, [(40, "solo"), (41, "iota kappa iota kappa")], stores["src"])
    _run(spark, stores["src"], stores["store"], stores["accepted"], stores["ckpt"])
    assert _accepted_ids(spark, stores["accepted"]) == [40, 41]
