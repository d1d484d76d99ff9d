#!/usr/bin/env python3
"""Summarize dumped physical plans (dump_plans.py output) into one JSON
line per query: Exchange count, join strategies, Python-boundary nodes,
scan count, whether any scan lacks PushedFilters, cartesian products.

Usage: python plan_stats.py <plandir> [> stats.jsonl]
"""

from __future__ import annotations

import json
import os
import re
import sys


def stats_for(text: str) -> dict:
    ops = re.findall(r"^\s*[*+\-:\s]*\(?\d*\)?\s*([A-Za-z]+\w*)", text, re.M)
    count = lambda pat: len(re.findall(pat, text))
    return {
        "exchanges": count(r"\bExchange (?:hash|range|SinglePartition|rangepartitioning|RoundRobin)"),
        "exchange_total": count(r"\bExchange\b"),
        "smj": count(r"\bSortMergeJoin\b"),
        "bhj": count(r"\bBroadcastHashJoin\b"),
        "shj": count(r"\bShuffledHashJoin\b"),
        "bnlj": count(r"\bBroadcastNestedLoopJoin\b"),
        "cartesian": count(r"\bCartesianProduct\b"),
        "sort": count(r"\bSort\b"),
        "window": count(r"\bWindow\b"),
        "batch_eval_python": count(r"\bBatchEvalPython\b"),
        "arrow_eval_python": count(r"\bArrowEvalPython\b"),
        "map_in_arrow_pandas": count(r"\bMapInArrow\b|\bMapInPandas\b|\bFlatMapGroupsInPandas\b|\bPythonMapInArrow\b"),
        "scans": count(r"Scan parquet|FileScan parquet|BatchScan"),
        "scans_unfiltered": count(r"PushedFilters: \[\]"),
        "agg": count(r"\bHashAggregate\b|\bObjectHashAggregate\b|\bSortAggregate\b"),
        "generate": count(r"\bGenerate\b"),
        "n_ops": len(ops),
        "error": text.startswith("ERROR"),
    }


def main() -> None:
    d = sys.argv[1]
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".txt"):
            continue
        with open(os.path.join(d, fn)) as f:
            text = f.read()
        rec = {"query": fn[:-4]}
        rec.update(stats_for(text))
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
