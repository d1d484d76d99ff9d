#!/usr/bin/env python3
"""Adversarial-Unicode edge-population sweep (fourth axis, after the
empty-corpus / degenerate-document / NULL-injection sweeps).

The hazard class this axis exercises is CROSS-ENGINE, not crash-only:
Spark (UTF8String, codepoint-grained length/substr, Java regex) and
DuckDB (UTF-8, its own grapheme/codepoint functions) can silently
diverge on multi-byte text even when both return "a result".  So the
sweep runs the FULL oracle differential (row count + schema +
normalized value hash vs DuckDB) on an sf0.001 corpus whose documents
table is augmented with:

* CJK text (3-byte UTF-8 codepoints; byte-vs-codepoint length splits)
* emoji with ZWJ sequences (surrogate pairs in UTF-16 engines)
* RTL text with explicit directional marks
* NFC vs NFD normalization twins (same rendered text, different
  codepoints -- a near-dup pair only if a pipeline normalizes)
* zero-width spaces / joiners inside tokens
* combining-mark pileups ("Zalgo") and Latin-1 supplement diacritics

Policy (same family as the NULL axis): text flows through BYTE- and
CODEPOINT-EXACT, unnormalized -- the engine neither normalizes nor
repairs Unicode; both engines must agree on the raw codepoints.  Lone
surrogates are excluded at the STORAGE boundary: parquet/Arrow rejects
unpaired surrogates at write time, so they cannot reach a query (the
ingest reject path is where they die in production).

Writes UNICODE_SWEEP_r{N}.json; the standing gate distilled from this
sweep lives in tests/test_empty_corpus.py beside the other three axes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_SF = "/root/testdata/sf0.001"

# (text, lang, source) rows appended to the documents table; n_chars is
# computed with Python len() = codepoint count, the same convention the
# fixture generator used for the ASCII corpus.
UNICODE_DOCS = [
    # CJK, spaces retained so word-grain tokenizers produce shingles
    ("深度 学习 模型 需要 大量 高质量 的 训练 数据 深度 学习 模型", "zh", "web"),
    ("機械 学習 の モデル は 大量 の データ を 必要 と する", "ja", "wiki"),
    # emoji + ZWJ family sequence + skin-tone modifier
    ("family 👨‍👩‍👧‍👦 emoji test 🚀 data 👍🏽 end", "en", "web"),
    # RTL with explicit marks
    ("مرحبا بالعالم hello ‏world مرحبا بالعالم again", "ar", "web"),
    # NFC / NFD twins: identical rendering, different codepoints (the
    # second literal IS byte-wise NFD in this source file: e + U+0301)
    ("café déjà vu résumé café latte", "fr", "web"),
    ("café déjà vu résumé café latte", "fr", "web"),
    # zero-width space / joiner inside and between tokens
    ("zero​width​space joined‍words test token here", "en", "cc"),
    # combining-mark pileup + math/symbol soup
    ("ź̂̃algo t̀́ext Ω≈ç√∫ µ∂ƒ ünïcödé test", "en", "cc"),
    # 4-byte astral plane (Gothic) + mixed-script token
    ("𐌰𐌱𐌲𐌳 gothic text Ⅻ ℝ𝕖𝕒𝕝 mixed script", "en", "wiki"),
    # empty-ish: only a BOM and directional marks
    ("﻿‎‏ ⁦test⁩", "en", "cc"),
]


def build_fixture(out_dir: str) -> None:
    """Single-file parquet per table (the driver/DuckDB layout, not a
    Spark part-file directory): untouched tables are copied byte-wise;
    documents is augmented via pandas with the base file's dtypes
    preserved, so both engines read the identical bytes."""
    import shutil

    import pandas as pd

    from wsu_cpts_415_spark.io.tables import TABLE_NAMES

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLE_NAMES:
        src = os.path.join(BASE_SF, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t != "documents":
            shutil.copyfile(src, dst)
            continue
        base = pd.read_parquet(src)
        mx = int(base["doc_id"].max())
        extra = pd.DataFrame(
            [
                {
                    "doc_id": mx + 1 + i,
                    "text": text,
                    "lang": lang,
                    "source": source,
                    "n_chars": len(text),
                }
                for i, (text, lang, source) in enumerate(UNICODE_DOCS)
            ]
        )[list(base.columns)]
        out = pd.concat([base, extra], ignore_index=True).astype(
            base.dtypes.to_dict()
        )
        out.to_parquet(dst, index=False)


# Queries whose ORACLE computes edit distance with DuckDB's
# `levenshtein`, which is BYTE-grained (measured: levenshtein('café',
# 'cafe') = 2 in DuckDB vs 1 in Spark; a CJK substitution costs ~3).
# The engine's codepoint grain is the correct text semantic (Spark/Java
# `levenshtein` counts character edits); the two agree exactly on
# byte==codepoint (ASCII) corpora -- which is why every routine
# conformance fixture pins these queries -- and diverge only in the
# dist-derived columns on multi-byte pairs.  On this fixture such a
# value mismatch is therefore an ORACLE limitation, recorded as
# `oracle-limited(lev-grain)` rather than FAIL; a crash or row-count
# mismatch in these queries still fails.  The divergence witness is
# pinned by tests/test_empty_corpus.py so this exclusion cannot rot
# silently.
LEV_ORACLE_LIMITED = {
    "levenshtein_blocked_pairs",
    "sorted_neighborhood_pairs",
    "er_match_scores",
    "er_multipass_match_scores",
    "er_multipass_recall",
    "er_incremental_batch_scores",
    "er_blocking_recall_audit",
}


def main() -> None:
    import tempfile

    from wsu_cpts_415_spark.ops.conformance import run_conformance
    from wsu_cpts_415_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "UNICODE_SWEEP_r12.json"
    spark = get_spark(app_name="wsu_cpts_415_spark-unicode-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    fixture = os.path.join(tempfile.mkdtemp(prefix="unicode_corpus_"), "sf")
    build_fixture(fixture)
    results = run_conformance(spark, fixture)
    for name, v in results.items():
        if (
            name in LEV_ORACLE_LIMITED
            and v.startswith("FAIL")
            and "value mismatch" in v
        ):
            results[name] = "oracle-limited(lev-grain): " + v[len("FAIL: "):]
    n_pass = sum(1 for v in results.values() if v == "PASS")
    n_rows_only = sum(1 for v in results.values() if v.startswith("rows-only"))
    n_limited = sum(
        1 for v in results.values() if v.startswith("oracle-limited")
    )
    n_fail = sum(1 for v in results.values() if v.startswith("FAIL"))
    artifact = {
        "axis": "adversarial-unicode",
        "fixture_docs": len(UNICODE_DOCS),
        "n_queries": len(results),
        "pass": n_pass,
        "rows_only": n_rows_only,
        "oracle_limited": n_limited,
        "fail": n_fail,
        "limited": {
            k: v
            for k, v in sorted(results.items())
            if v.startswith("oracle-limited")
        },
        "failures": {
            k: v for k, v in sorted(results.items()) if v.startswith("FAIL")
        },
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2, sort_keys=True)
    print(
        json.dumps(
            {
                k: artifact[k]
                for k in (
                    "n_queries", "pass", "rows_only", "oracle_limited", "fail"
                )
            }
        )
    )
    for k, v in sorted(artifact["failures"].items()):
        print(f"FAIL {k}: {v[:160]}")


if __name__ == "__main__":
    main()
