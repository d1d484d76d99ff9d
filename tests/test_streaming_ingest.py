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


def test_first_run_without_init_corpus(spark, tmp_path):
    """With NO --init-corpus (standing stores absent), the first
    micro-batch must gate against an empty corpus instead of dying with
    PATH_NOT_FOUND inside the stream, and must create the stores so the
    next batch dedups against everything batch 0 admitted."""
    store = str(tmp_path / "store")
    src = str(tmp_path / "incoming")
    accepted = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, BATCH1, src)
    _run(spark, src, store, accepted, ckpt)
    # no standing corpus: 10 is novel now; 12 is still an exact dup of 11
    assert _accepted_ids(spark, accepted) == [10, 11]
    _write(spark, BATCH2, src)
    _run(spark, src, store, accepted, ckpt)
    # 20 near-dups batch-0-accepted 11; 21 is novel
    assert _accepted_ids(spark, accepted) == [10, 11, 21]


def test_zero_admitted_replay_clears_stale_partitions(spark, stores):
    """A replayed batch whose gate outcome changed (stream restarted
    with a stricter threshold against the same checkpoint) and now
    admits ZERO docs must drop the prior attempt's partitions -- dynamic
    overwrite with no rows touches nothing, so the zero-admitted path
    clears them explicitly."""
    from wsu_cpts_415_spark.streaming.ingest_dedup import apply_ingest_batch

    batch = spark.createDataFrame(
        [(10, "alpha beta alpha beta alpha")], SCHEMA  # jaccard 1.0 vs doc 1
    )
    # threshold above 1.0 admits everything; partitions for _batch=0 land
    apply_ingest_batch(batch, 0, stores["store"], stores["accepted"], 1.5)
    assert _accepted_ids(spark, stores["accepted"]) == [10]
    # replay batch 0 at the normal threshold: doc 10 is now rejected
    apply_ingest_batch(batch, 0, stores["store"], stores["accepted"], 0.5)
    import os

    assert not [
        f for f in os.listdir(stores["accepted"]) if f.startswith("_batch=")
    ]
    for name in ("digests", "bands", "shingles"):
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(stores["store"] + "/" + name)
            .select("doc_id")
            .collect()
        ]
        # corpus doc 1 only (bands holds one row per band per doc)
        assert set(ids) == {1}, f"{name} kept stale batch rows: {ids}"


def test_one_word_document_does_not_crash_the_gate(spark, stores):
    """A single-token document has an EMPTY bigram shingle set (DuckDB
    semantics); Spark's sequence(1, 0) would count down and crash on
    element_at(toks, 0) without the size guard.  Such a doc can never
    near-dup anything, so it must be admitted, not kill the batch."""
    _write(spark, [(40, "solo"), (41, "iota kappa iota kappa")], stores["src"])
    _run(spark, stores["src"], stores["store"], stores["accepted"], stores["ckpt"])
    assert _accepted_ids(spark, stores["accepted"]) == [40, 41]


def test_reinit_same_corpus_is_a_read_and_preserves_batches(
    spark, stores
):
    """Gate restart: a second init over the SAME corpus must skip the
    rebuild (matching _corpus_id marker) -- crucially, the rebuild's
    plain overwrite would wipe every _batch>=0 partition the gate had
    appended, so the skip is a correctness property, not just a cost
    one."""
    import os

    _write(spark, BATCH1, stores["src"])
    _run(spark, stores["src"], stores["store"], stores["accepted"],
         stores["ckpt"])
    assert os.path.isdir(
        os.path.join(stores["store"], "digests", "_batch=0")
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta alpha beta")], SCHEMA
    )
    init_standing_stores(spark, corpus, stores["store"])  # restart
    # appended batch partitions survived the re-init
    for sub in ("digests", "bands", "shingles"):
        assert os.path.isdir(
            os.path.join(stores["store"], sub, "_batch=0")
        ), f"{sub} lost its appended batch on re-init"
    # and the gate still dedups against them: replaying BATCH2's
    # near-dup of accepted doc 11 must still reject it
    _write(spark, BATCH2, stores["src"])
    _run(spark, stores["src"], stores["store"], stores["accepted"],
         stores["ckpt"])
    assert _accepted_ids(spark, stores["accepted"]) == [11, 21]


def test_reinit_changed_corpus_rebuilds(spark, stores):
    """A DIFFERENT corpus (fingerprint mismatch) must rebuild the base
    stores -- the marker gates on corpus identity, not store existence."""
    corpus2 = spark.createDataFrame(
        [(2, "omicron pi omicron pi")], SCHEMA
    )
    init_standing_stores(spark, corpus2, stores["store"])
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            f"{stores['store']}/digests"
        ).select("doc_id").collect()
    )
    assert ids == [2]


def test_gate_markers_are_per_gate(spark, tmp_path):
    """Both gates pointed at the SAME store_dir must each build their
    own stores: the dedup gate's fingerprint marker must not make the
    line gate skip its line_counts build (and vice versa)."""
    import os

    from wsu_cpts_415_spark.streaming.line_gate import init_line_store

    store = str(tmp_path / "shared_store")
    corpus = spark.createDataFrame(
        [(1, "alpha beta alpha beta")], SCHEMA
    )
    init_standing_stores(spark, corpus, store)
    init_line_store(spark, corpus, store)
    assert os.path.isdir(os.path.join(store, "line_counts")), (
        "line gate skipped its build because of the dedup gate's marker"
    )
    assert os.path.isdir(os.path.join(store, "digests"))


def test_reinit_rebuilds_when_store_lost_despite_marker(spark, stores):
    """Round-11 hardening: a matching _corpus_id marker must NOT make
    init a no-op when a store subdir was deleted or lost -- the skip
    requires all three stores to be readable, else the gate would fail
    later reading the missing store."""
    import shutil

    shutil.rmtree(f"{stores['store']}/bands")
    corpus = spark.createDataFrame([(1, "alpha beta alpha beta")], SCHEMA)
    init_standing_stores(spark, corpus, stores["store"])  # must rebuild
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{stores['store']}/bands")
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert ids == [1]


def test_reinit_survives_corrupt_marker(spark, stores):
    """A corrupt marker file (half-written crash artifact) must trigger
    a rebuild, not an exception out of the restart check."""
    import pathlib

    marker = pathlib.Path(stores["store"]) / "_corpus_id_dedup"
    shutil_target = next(marker.glob("*.parquet"))
    shutil_target.write_bytes(b"not a parquet file")
    corpus = spark.createDataFrame([(1, "alpha beta alpha beta")], SCHEMA)
    init_standing_stores(spark, corpus, stores["store"])  # no raise
    # rebuild re-marked: a follow-up init with intact stores skips again
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{stores['store']}/digests")
        .select("doc_id")
        .collect()
    )
    assert ids == [1]
