"""Semantic invariants for the scrub transforms beyond the oracle hash:
the blocklist actually removes what it counts, and exact-substring
stripping honors keep-first (the minimum doc_id never loses a token)."""

from __future__ import annotations

import hashlib

from wsu_cpts_415_spark.queries.scrub import (
    BLOCK_TERMS,
    blocklist_scrub,
    exact_substring_strip,
)

SF = "/root/testdata/sf0.001"


def test_blocklist_scrub_removes_exactly_the_hits(spark):
    out = {r["doc_id"]: r for r in blocklist_scrub(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    hit_docs = 0
    for d in docs:
        toks = d["text"].split(" ")
        kept = [t for t in toks if t not in BLOCK_TERMS]
        r = out[d["doc_id"]]
        assert r["n_tokens"] == len(toks)
        assert r["n_hits"] == len(toks) - len(kept)
        assert (
            r["scrubbed_md5"]
            == hashlib.md5(" ".join(kept).encode()).hexdigest()
        )
        hit_docs += r["n_hits"] > 0
    assert hit_docs > 0  # the fixture exercises the redaction path


def test_exact_substring_strip_keep_first(spark):
    rows = {r["doc_id"]: r for r in exact_substring_strip(spark, SF).collect()}
    # the global minimum doc_id is the keeper of every duplicated span it
    # contains, so keep-first semantics forbid it losing any token
    assert rows[min(rows)]["n_removed"] == 0
    # word-soup fixture: cross-doc 5-gram collisions must exist
    assert sum(r["n_removed"] for r in rows.values()) > 0
    for r in rows.values():
        assert 0 <= r["n_removed"] <= r["n_tokens"]
